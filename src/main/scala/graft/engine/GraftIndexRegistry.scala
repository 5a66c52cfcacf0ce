package graft.engine

import org.apache.spark.sql.SparkSession

/** Name registry for the persisted index families, in TWO layers (r17
  * verdict #1 — durable names):
  *
  *  - a DURABLE catalog under the session's warehouse directory
  *    (`<spark.sql.warehouse.dir>/graft_index_catalog`), so a
  *    `CREATE ANN INDEX ix ...` on one JDBC connection serves by name on
  *    the next — a Thrift server makes a session per connection, and the
  *    name must outlive it the way the reference persists index metadata
  *    in its catalog (`#index_info` meta table,
  *    /root/reference/server/meta_type.h:89-115; durable DDL via
  *    DDLProcessor, server/sql_processor_ddl.cpp);
  *  - a SESSION-scoped map for `CREATE TEMPORARY ... INDEX` (the temp-view
  *    discipline: the name dies with the session, the on-disk tree is
  *    untouched). A temporary name SHADOWS a durable one on lookup.
  *
  * The durable catalog is one tiny versioned TSV: writers serialize under
  * the shared [[graft.pipeline.WriterLock]], stage `catalog.v<N+1>.tsv`
  * via write-temp-then-rename (atomic on the filesystems the lock already
  * demands), and prune older versions after the new one lands; readers
  * list the directory and take the highest version — a reader never
  * observes a partial file, and a read racing the prune retries. Reads
  * cache per warehouse dir keyed by the version file NAME, so steady-state
  * resolution costs one directory listing.
  */
object GraftIndexRegistry {

  /** family: "ann" | "exact" | "minhash". */
  final case class IndexDef(name: String, family: String, path: String,
                            table: String, idCol: String, valCol: String)

  // ---- session layer (TEMPORARY names) --------------------------------
  // WEAKLY keyed by session (r17 review: a Thrift server makes a session
  // per connection, and a strong static key would pin every one of them
  // — SessionState, analyzer, cached plans — forever). All access goes
  // through the synchronized wrapper; reads never insert.
  private val bySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, IndexDef]])

  /** Register a TEMPORARY (session-scoped) name. */
  def putTemporary(spark: SparkSession, d: IndexDef): Unit = {
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

  private def getTemporary(spark: SparkSession, name: String): Option[IndexDef] =
    Option(bySession.get(spark)).flatMap(m => Option(m.get(name.toLowerCase)))

  private def removeTemporary(spark: SparkSession,
                              name: String): Option[IndexDef] =
    Option(bySession.get(spark)).flatMap(m => Option(m.remove(name.toLowerCase)))

  /** Drop a session-layer (temporary) registration only — used when a
    * durable `CREATE OR REPLACE` must not stay shadowed by the session
    * name it replaces. */
  private[engine] def dropTemporaryShadow(spark: SparkSession,
                                          name: String): Option[IndexDef] =
    removeTemporary(spark, name)

  private def listTemporary(spark: SparkSession): Seq[IndexDef] = {
    import scala.jdk.CollectionConverters._
    Option(bySession.get(spark))
      .map(_.values.asScala.toSeq.sortBy(_.name)).getOrElse(Nil)
  }

  // ---- durable layer (warehouse catalog) ------------------------------

  private val VersionedRe = """catalog\.v(\d+)\.tsv""".r

  private def catalogDir(spark: SparkSession): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_index_catalog")

  // (catalog dir -> (latest version file name, parsed map)); invalidated
  // by the NAME changing, so cross-process writes are picked up on the
  // next listing without any mtime comparison
  private val durableCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Map[String, IndexDef])]

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  private def render(m: Map[String, IndexDef]): Array[Byte] =
    m.values.toSeq.sortBy(_.name).map(d =>
      Seq(d.name, d.family, d.path, d.table, d.idCol, d.valCol)
        .map(enc).mkString("\t")).mkString("\n").getBytes("UTF-8")

  private def parse(bytes: Array[Byte]): Map[String, IndexDef] =
    new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty).map { l =>
      val f = l.split("\t", -1).map(dec)
      require(f.length == 6, s"corrupt index catalog line: $l")
      f(0).toLowerCase -> IndexDef(f(0), f(1), f(2), f(3), f(4), f(5))
    }.toMap

  private def latestVersion(fs: org.apache.hadoop.fs.FileSystem,
                            dir: org.apache.hadoop.fs.Path): Option[(Long, org.apache.hadoop.fs.Path)] =
    try {
      if (!fs.exists(dir)) None
      else fs.listStatus(dir).toSeq.map(_.getPath)
        .flatMap(p => p.getName match {
          case VersionedRe(n) => Some((n.toLong, p))
          case _ => None
        }).maxByOption(_._1)
    } catch { case _: java.io.FileNotFoundException => None }

  /** The durable map for this session's warehouse. A read racing the
    * writer's prune (list saw vN, open found it deleted because vN+1
    * landed) retries the listing. */
  private def loadDurable(spark: SparkSession): Map[String, IndexDef] = {
    val dir = catalogDir(spark)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var attempt = 0
    while (true) {
      latestVersion(fs, dir) match {
        case None => return Map.empty
        case Some((_, f)) =>
          val cached = durableCache.get(dir.toString)
          if (cached != null && cached._1 == f.getName) return cached._2
          try {
            val in = fs.open(f)
            val m = try parse(in.readAllBytes()) finally in.close()
            durableCache.put(dir.toString, (f.getName, m))
            return m
          } catch {
            case _: java.io.IOException if attempt < 5 =>
              attempt += 1; Thread.sleep(100)
          }
      }
    }
    sys.error("unreachable")
  }

  /** Read-modify-write the durable catalog under the writer lock; `f`
    * returns the new map (or None to abort without writing). */
  private def mutateDurable(spark: SparkSession)(
      f: Map[String, IndexDef] => Option[Map[String, IndexDef]]): Unit = {
    val dir = catalogDir(spark)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    graft.pipeline.WriterLock.withLock(spark, dir.toString) {
      val latest = latestVersion(fs, dir)
      val cur = latest match {
        case None => Map.empty[String, IndexDef]
        case Some((_, p)) =>
          val in = fs.open(p)
          try parse(in.readAllBytes()) finally in.close()
      }
      f(cur).foreach { next =>
        val n = latest.map(_._1).getOrElse(0L) + 1
        val tmp = new org.apache.hadoop.fs.Path(dir,
          s"catalog.v$n.tsv.tmp.${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, false)
        try { out.write(render(next)); out.close() }
        catch { case e: Throwable => fs.delete(tmp, false); throw e }
        val fin = new org.apache.hadoop.fs.Path(dir, s"catalog.v$n.tsv")
        if (!fs.rename(tmp, fin)) {
          fs.delete(tmp, false)
          throw new IllegalStateException(
            s"could not commit index catalog version $n at $fin")
        }
        durableCache.put(dir.toString, (fin.getName, next))
        // prune superseded versions — best effort, readers retry through it
        latest.foreach { case (_, old) =>
          try { fs.delete(old, false); () }
          catch { case _: java.io.IOException => () }
        }
      }
    }
  }

  /** Register a DURABLE name in the warehouse catalog. With `replace`
    * false the put fails if the name is already durably registered. */
  def putDurable(spark: SparkSession, d: IndexDef,
                 replace: Boolean): Unit =
    mutateDurable(spark) { cur =>
      if (!replace && cur.contains(d.name.toLowerCase))
        throw new IllegalArgumentException(s"index ${d.name} already exists")
      Some(cur + (d.name.toLowerCase -> d))
    }

  /** Lookup: the session layer shadows the durable catalog. */
  def get(spark: SparkSession, name: String): Option[IndexDef] =
    getTemporary(spark, name)
      .orElse(loadDurable(spark).get(name.toLowerCase))

  /** True when `name` is registered in the session (temporary) layer. */
  def isTemporary(spark: SparkSession, name: String): Boolean =
    getTemporary(spark, name).isDefined

  /** Layer-scoped lookups for the DDL's collision checks: like Spark's
    * temp views, a TEMPORARY name may shadow a durable one (and vice
    * versa) without clashing — only a same-LAYER redefinition collides. */
  def getInLayer(spark: SparkSession, name: String,
                 temporary: Boolean): Option[IndexDef] =
    if (temporary) getTemporary(spark, name)
    else loadDurable(spark).get(name.toLowerCase)

  /** Unregister `name` from the layer it resolves in (temporary first —
    * the shadowing order) and return the removed entry. */
  def remove(spark: SparkSession, name: String): Option[IndexDef] =
    removeTemporary(spark, name).orElse {
      val durable = loadDurable(spark).get(name.toLowerCase)
      if (durable.isDefined)
        mutateDurable(spark)(cur =>
          if (cur.contains(name.toLowerCase)) Some(cur - name.toLowerCase)
          else None)
      durable
    }

  /** Every visible registration: durable entries (temporary=false) with
    * the session's temporary names (temporary=true) shadowing by name. */
  def list(spark: SparkSession): Seq[(IndexDef, Boolean)] = {
    val temp = listTemporary(spark)
    val shadowed = temp.map(_.name.toLowerCase).toSet
    (temp.map((_, true)) ++
      loadDurable(spark).values.toSeq
        .filterNot(d => shadowed(d.name.toLowerCase)).map((_, false)))
      .sortBy(_._1.name)
  }

  /** Resolve a TVF index argument: a registered name wins (checked
    * against `wantFamily` when given — GRAFT_ANN_TOPK over a dedup index
    * is a usage error, not a scan of the wrong tree); anything with a
    * path separator is taken as a filesystem path; a bare unregistered
    * name fails by NAME (r17 ADVICE: the silent degrade to a relative
    * path turned a typo into a parquet path-not-found mystery — or a
    * scan of an unrelated directory under the driver CWD).
    *
    * Both branches READ-gate the resolved path (r17 ADVICE): the table
    * functions probe the index tree's CONTENT (neighbors, digest
    * membership, meta), so resolution demands SELECT on the protected
    * path exactly like the DDL attach does — the registry is not a
    * read-gate bypass. */
  def resolvePath(spark: SparkSession, s: String,
                  wantFamily: Option[String]): String = {
    val path = get(spark, s) match {
      case Some(d) =>
        val compatible = wantFamily.forall {
          case "ann" => d.family == "ann"
          case k => d.family == k // exact|minhash must match the gate kind
        }
        if (!compatible) throw new IllegalArgumentException(
          s"index '${d.name}' is a ${d.family} index; this function needs " +
            s"a ${wantFamily.get} index")
        d.path
      case None =>
        if (!s.exists(c => c == '/' || c == '\\'))
          throw new IllegalArgumentException(
            s"index '$s' is not registered (CREATE ... INDEX registers a " +
              "name; a filesystem path must contain a path separator)")
        s
    }
    GraftAuth.demandPath(spark, path, write = false)
    path
  }
}
