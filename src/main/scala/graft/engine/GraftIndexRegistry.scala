package graft.engine

import org.apache.spark.sql.SparkSession

/** Session-scoped name registry for the persisted index families (r16
  * verdict #2): the SQL lifecycle DDL (`CREATE ANN INDEX ix ON ...`,
  * `ALTER INDEX ix COMPACT/RETRAIN/APPEND`, `DROP ANN|DEDUP INDEX ix`)
  * binds a NAME to the index's filesystem path + family, and the GRAFT
  * table functions accept either the name or a raw path. Names live with
  * the session (like temp views): the on-disk index is the durable
  * artifact, the name is a session convenience — re-attach in a new
  * session with `CREATE ... OPTIONS(path '<existing>', attach true)`.
  *
  * The reference's index DDL is grammar rules 15-112
  * (/root/reference/server/sql_internal_parser.cpp:835-1190, DDLProcessor
  * server/sql_processor_ddl.cpp); its indexes are container-column trees
  * inside the storage engine, ours are the persisted ANN/dedup index
  * trees — name-addressed the same way, path-addressed underneath.
  */
object GraftIndexRegistry {

  /** family: "ann" | "exact" | "minhash". */
  final case class IndexDef(name: String, family: String, path: String,
                            table: String, idCol: String, valCol: String)

  // WEAKLY keyed by session (r17 review: a Thrift server makes a session
  // per connection, and a strong static key would pin every one of them
  // — SessionState, analyzer, cached plans — forever). All access goes
  // through the synchronized wrapper; reads never insert.
  private val bySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, IndexDef]])

  def put(spark: SparkSession, d: IndexDef): Unit = {
    bySession.synchronized {
      var m = bySession.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, IndexDef]
        bySession.put(spark, m)
      }
      m.put(d.name.toLowerCase, d)
    }
    ()
  }

  def get(spark: SparkSession, name: String): Option[IndexDef] =
    Option(bySession.get(spark)).flatMap(m => Option(m.get(name.toLowerCase)))

  def remove(spark: SparkSession, name: String): Option[IndexDef] =
    Option(bySession.get(spark)).flatMap(m => Option(m.remove(name.toLowerCase)))

  def list(spark: SparkSession): Seq[IndexDef] = {
    import scala.jdk.CollectionConverters._
    Option(bySession.get(spark))
      .map(_.values.asScala.toSeq.sortBy(_.name)).getOrElse(Nil)
  }

  /** Resolve a TVF index argument: a registered name wins (checked
    * against `wantFamily` when given — GRAFT_ANN_TOPK over a dedup index
    * is a usage error, not a scan of the wrong tree); anything else is
    * taken as a filesystem path. */
  def resolvePath(spark: SparkSession, s: String,
                  wantFamily: Option[String]): String =
    get(spark, s) match {
      case Some(d) =>
        val compatible = wantFamily.forall {
          case "ann" => d.family == "ann"
          case k => d.family == k // exact|minhash must match the gate kind
        }
        if (!compatible) throw new IllegalArgumentException(
          s"index '${d.name}' is a ${d.family} index; this function needs " +
            s"a ${wantFamily.get} index")
        d.path
      case None => s
    }
}
