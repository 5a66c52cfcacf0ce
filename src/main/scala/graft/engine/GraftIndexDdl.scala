package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL lifecycle DDL for the persisted index families (r16 verdict #2):
  * build / append / compact / retrain / drop for the IVF (ANN) and the
  * exact/minhash dedup indexes, from any text front door including
  * JDBC/Thrift. Lowered onto the SAME kernels the Scala API uses
  * ([[graft.pipeline.IvfIndex]], [[graft.pipeline.ExactIndex]],
  * [[graft.pipeline.MinhashIndex]]) — all writes run under the shared
  * [[graft.pipeline.WriterLock]] those kernels already take.
  *
  * Grammar (names register in the session-scoped [[GraftIndexRegistry]];
  * the GRAFT table functions accept either the name or the path):
  *
  * {{{
  * CREATE ANN INDEX [IF NOT EXISTS] ix ON <table>(<idCol>, <vecCol>)
  *   [OPTIONS(lists <n>, codec '<raw|sq8>', attrs '<c1,c2>',
  *            path '<dir>', attach <true|false>)]
  * CREATE DEDUP INDEX [IF NOT EXISTS] ix ON <table>(<idCol>, <textCol>)
  *   [OPTIONS(kind '<exact|minhash>', shingle <n>, minhashk <k>,
  *            bands <b>, path '<dir>', attach <true|false>)]
  * ALTER INDEX ix APPEND FROM <table or (SELECT ...)>
  * ALTER INDEX ix COMPACT            -- dedup families
  * ALTER INDEX ix RETRAIN            -- ANN
  * DROP ANN INDEX [IF EXISTS] ix     -- deletes the on-disk tree
  * DROP DEDUP INDEX [IF EXISTS] ix
  * }}}
  *
  * `attach true` binds the name to an EXISTING index tree at `path`
  * without building — how a new session adopts the durable artifact.
  * Source tables are read-auth-gated through the same frame resolution
  * the table functions use.
  *
  * Reference anchor: index DDL is grammar rules 15-112 of the NewSQL
  * parser (/root/reference/server/sql_internal_parser.cpp:835-1190),
  * executed by DDLProcessor (server/sql_processor_ddl.cpp); its indexes
  * are container-column trees inside the storage engine, ours are the
  * persisted ANN/dedup trees — the lifecycle verbs map one-to-one.
  */
object GraftIndexDdl {

  private val createRe =
    """(?is)^CREATE\s+(ANN|DEDUP)\s+INDEX\s+(?:(IF\s+NOT\s+EXISTS)\s+)?"?(\w+)"?\s+ON\s+"?([\w.]+)"?\s*\(\s*"?(\w+)"?\s*,\s*"?(\w+)"?\s*\)\s*(?:OPTIONS\s*\((.*)\))?\s*$""".r
  private val alterRe =
    """(?is)^ALTER\s+INDEX\s+"?(\w+)"?\s+(?:(COMPACT|RETRAIN)|APPEND\s+FROM\s+(.+?))\s*$""".r
  private val dropRe =
    """(?is)^DROP\s+(ANN|DEDUP)\s+INDEX\s+(?:(IF\s+EXISTS)\s+)?"?(\w+)"?\s*$""".r
  private val showRe =
    """(?is)^\s*SHOW\s+GRAFT\s+INDEXES\s*;?\s*$""".r
  private val headRe =
    """(?is)^\s*(?:(?:CREATE|DROP)\s+(?:ANN|DEDUP)\s+INDEX|ALTER\s+INDEX|SHOW\s+GRAFT\s+INDEXES)\b""".r

  /** True when the statement is index-lifecycle DDL this object owns. */
  def handles(text: String): Boolean = headRe.findFirstIn(text).isDefined

  private def reject(why: String): Nothing =
    throw new IllegalArgumentException(
      s"unsupported index DDL form: $why. Supported: CREATE ANN|DEDUP " +
        "INDEX [IF NOT EXISTS] ix ON table(idCol, valCol) [OPTIONS(...)], " +
        "ALTER INDEX ix APPEND FROM <table|(SELECT ...)> | COMPACT | " +
        "RETRAIN, DROP ANN|DEDUP INDEX [IF EXISTS] ix")

  /** OPTIONS body: comma-separated `key value` or `key = value`; string
    * values single-quoted, numerics/booleans bare. Keys case-insensitive. */
  private[engine] def parseOptions(s: String): Map[String, String] = {
    val itemRe = """(?s)^(\w+)\s*=?\s*(.+)$""".r
    GraftSql.splitArgs(s).map {
      case itemRe(k, vRaw) =>
        val v = vRaw.trim
        val unq =
          if (v.length >= 2 && v.head == '\'' && v.last == '\'')
            v.substring(1, v.length - 1).replace("''", "'")
          else v
        k.toLowerCase -> unq
      case other => reject(s"cannot parse OPTION '$other'")
    }.toMap
  }

  private def intOpt(o: Map[String, String], k: String): Option[Int] =
    o.get(k).map { v =>
      try v.toInt
      catch { case _: NumberFormatException =>
        reject(s"option $k must be an integer, got '$v'") }
    }

  private def defaultPath(spark: SparkSession, name: String): String = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    new org.apache.hadoop.fs.Path(wh, s"graft_indexes/$name").toString
  }

  private def status(spark: SparkSession, op: String, name: String,
                     path: String): DataFrame = {
    import spark.implicits._
    Seq((op, name, path)).toDF("operation", "index", "path")
  }

  def run(spark: SparkSession, text: String): DataFrame = text match {
    case showRe() =>
      // the session's registered index names — the catalog face of
      // GraftIndexRegistry (per-tree details live in GRAFT_INDEX_STATS)
      import spark.implicits._
      GraftIndexRegistry.list(spark)
        .map(d => (d.name, d.family, d.path, d.table, d.idCol, d.valCol))
        .toDF("index", "family", "path", "table", "id_col", "val_col")

    case createRe(kindWord, ifNot, name, table, idCol, valCol, optText) =>
      val opts = Option(optText).map(parseOptions).getOrElse(Map.empty)
      val family = kindWord.toUpperCase match {
        case "ANN" => "ann"
        case "DEDUP" => opts.getOrElse("kind", "exact").toLowerCase match {
          case k @ ("exact" | "minhash") => k
          case other => reject(s"unknown dedup index kind '$other'")
        }
      }
      // options validate PER FAMILY (r17 review: one shared set silently
      // dropped e.g. `bands` on an exact index — the user believes the
      // tuning took effect and gets defaults)
      val known = family match {
        case "ann" => Set("lists", "codec", "attrs", "path", "attach")
        case "exact" => Set("kind", "path", "attach")
        case "minhash" =>
          Set("kind", "shingle", "minhashk", "bands", "path", "attach")
      }
      opts.keys.find(!known(_)).foreach(k =>
        reject(s"unknown option '$k' for a $family index " +
          s"(accepted: ${known.toSeq.sorted.mkString(", ")})"))
      GraftIndexRegistry.get(spark, name) match {
        case Some(d) =>
          if (ifNot != null) return status(spark, "CREATE INDEX", name, d.path)
          throw new IllegalArgumentException(s"index $name already exists")
        case None =>
      }
      val path = opts.getOrElse("path", defaultPath(spark, name))
      val attach = opts.get("attach").exists(_.equalsIgnoreCase("true"))
      // protected-path gate (r17 review): building WRITES the directory,
      // attaching registers an alias over it (SELECT, like a CREATE VIEW
      // path registration)
      GraftAuth.demandPath(spark, path, write = !attach)
      if (attach) {
        // adopt an existing tree: verify something committed lives there
        val root = graft.pipeline.IvfIndex.dataRoot(spark, path)
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val marker = family match {
          case "ann" => "centroids"
          case "exact" => "digests"
          case "minhash" => "buckets"
        }
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$root/$marker")))
          throw new IllegalArgumentException(
            s"no $family index found at $path to attach")
      } else {
        val src = GraftTableFunctions.inputFrame(spark, table)
        family match {
          case "ann" =>
            graft.pipeline.IvfIndex.build(src, idCol, valCol, path,
              nLists = intOpt(opts, "lists").getOrElse(-1),
              codec = opts.getOrElse("codec", "raw"),
              attrCols = opts.get("attrs").toSeq
                .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
          case "exact" =>
            graft.pipeline.ExactIndex.build(src, valCol, idCol, path)
          case "minhash" =>
            graft.pipeline.MinhashIndex.build(src, valCol, idCol, path,
              shingleN = intOpt(opts, "shingle").getOrElse(3),
              k = intOpt(opts, "minhashk").getOrElse(16),
              bands = intOpt(opts, "bands").getOrElse(4))
        }
      }
      GraftIndexRegistry.put(spark,
        GraftIndexRegistry.IndexDef(name, family, path, table, idCol, valCol))
      status(spark, "CREATE INDEX", name, path)

    case alterRe(name, maintenance, appendFrom) =>
      val d = GraftIndexRegistry.get(spark, name).getOrElse(
        throw new IllegalArgumentException(
          s"index $name is not registered in this session (CREATE ... " +
            "OPTIONS(path '<dir>', attach true) re-attaches a persisted one)"))
      GraftAuth.demandPath(spark, d.path, write = true)
      Option(maintenance).map(_.toUpperCase) match {
        case Some("COMPACT") => d.family match {
          case "exact" => graft.pipeline.ExactIndex.compact(spark, d.path)
          case "minhash" => graft.pipeline.MinhashIndex.compact(spark, d.path)
          case _ => reject("ANN index maintenance is ALTER INDEX ... RETRAIN")
        }
        case Some("RETRAIN") => d.family match {
          case "ann" => graft.pipeline.IvfIndex.retrain(spark, d.path)
          case _ => reject("dedup index maintenance is ALTER INDEX ... COMPACT")
        }
        case _ =>
          // APPEND FROM <source>: a table name or a parenthesized SELECT
          val srcText = appendFrom.trim match {
            case s if s.startsWith("(") && s.endsWith(")") =>
              s.substring(1, s.length - 1)
            case s => s
          }
          val src = GraftTableFunctions.inputFrame(spark, srcText)
          // a DDL append is COMPLETE when the statement returns, so the
          // dedup families write it with its applied marker — the tag is
          // immediately foldable by ALTER INDEX ... COMPACT (a plain
          // markerless append would sit unfoldable under the crash-window
          // rule, which exists for streaming replays, not DDL)
          val tag = "ddl" +
            java.util.UUID.randomUUID().toString.replace("-", "").take(12)
          d.family match {
            case "ann" =>
              graft.pipeline.IvfIndex.append(src, d.idCol, d.valCol, d.path)
              ()
            case "exact" =>
              graft.pipeline.ExactIndex.appendApplied(src, d.valCol, d.idCol,
                d.path, tag, src.select(d.idCol))
              ()
            case "minhash" =>
              graft.pipeline.MinhashIndex.appendApplied(src, d.valCol, d.idCol,
                d.path, tag, src.select(d.idCol))
              ()
          }
      }
      status(spark, "ALTER INDEX", name, d.path)

    case dropRe(kindWord, ifEx, name) =>
      GraftIndexRegistry.get(spark, name) match {
        case None =>
          if (ifEx != null) status(spark, "DROP INDEX", name, "")
          else throw new IllegalArgumentException(
            s"index $name is not registered in this session")
        case Some(d) =>
          val expectAnn = kindWord.equalsIgnoreCase("ANN")
          if (expectAnn != (d.family == "ann"))
            reject(s"index $name is a ${d.family} index — use DROP " +
              s"${if (d.family == "ann") "ANN" else "DEDUP"} INDEX")
          GraftAuth.demandPath(spark, d.path, write = true)
          // delete under the writer lock (r17 review): an unserialized
          // drop raced a live appender — the tree vanished under its
          // in-flight write (which then resurrected orphan directories)
          // and deleting the LIVE lock file let a third writer in. The
          // lock's own release removes the lock file after the body.
          val p = new org.apache.hadoop.fs.Path(d.path)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          graft.pipeline.WriterLock.withLock(spark, d.path) {
            fs.delete(p, true); ()
          }
          GraftIndexRegistry.remove(spark, name)
          status(spark, "DROP INDEX", name, d.path)
      }

    case _ => reject("statement does not match the supported grammar")
  }
}
