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
  * Grammar (names register in [[GraftIndexRegistry]] — DURABLY in the
  * warehouse catalog by default (r17 verdict #1), session-scoped with
  * `TEMPORARY`; the GRAFT table functions accept either the name or the
  * path; identifiers may be bare `\w+`, `"double-quoted"` or
  * `` `backticked` `` with doubled-quote escapes):
  *
  * {{{
  * CREATE [OR REPLACE] [TEMPORARY] ANN INDEX [IF NOT EXISTS] ix
  *   ON <table>(<idCol>, <vecCol>)
  *   [OPTIONS(lists <n>, codec '<raw|sq8>', attrs '<c1,c2>',
  *            path '<dir>', attach <true|false>)]
  * CREATE [OR REPLACE] [TEMPORARY] DEDUP INDEX [IF NOT EXISTS] ix
  *   ON <table>(<idCol>, <textCol>)
  *   [OPTIONS(kind '<exact|minhash>', shingle <n>, minhashk <k>,
  *            bands <b>, path '<dir>', attach <true|false>)]
  * ALTER INDEX ix APPEND FROM <table or (SELECT ...)> [TAG '<tag>']
  * ALTER INDEX ix COMPACT            -- dedup families
  * ALTER INDEX ix RETRAIN            -- ANN
  * DROP ANN INDEX [IF EXISTS] ix     -- deletes the on-disk tree
  * DROP DEDUP INDEX [IF EXISTS] ix
  * }}}
  *
  * `attach true` binds the name to an EXISTING index tree at `path`
  * without building — how a session adopts a durable artifact built
  * elsewhere. A plain CREATE registers the name in the warehouse-backed
  * catalog, so a later connection (a Thrift server makes a session per
  * connection) serves it by name with no re-attach; `TEMPORARY` keeps
  * today's temp-view discipline (the name dies with the session and
  * SHADOWS a durable name on lookup). `OR REPLACE` rebinds an existing
  * NAME — the previously bound tree is left on disk (rebinding is a
  * catalog operation; DROP is the verb that deletes trees).
  *
  * `TAG` on APPEND is a client idempotency tag: a replayed statement
  * carrying an already-applied tag is a no-op for every family (the
  * dedup families overwrite their `ingest=<tag>` partition; the ANN
  * family skips on its applied marker — [[graft.pipeline.IvfIndex]]), so
  * a JDBC client can safely retry a timed-out-but-completed APPEND.
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

  // identifiers: bare \w+, "double-quoted" or `backticked`, with doubled
  // closing quotes as escapes (r17 verdict #4 — quoted names with dots,
  // spaces, or Spark backticks used to be rejected with the generic
  // diagnostic); table names additionally allow bare db.table dotting
  private val Ident = """("(?:[^"]|"")+"|`(?:[^`]|``)+`|\w+)"""
  private val TableIdent = """("(?:[^"]|"")+"|`(?:[^`]|``)+`|[\w.]+)"""

  private[engine] def unquoteIdent(s: String): String =
    if (s.length >= 2 && s.head == '"' && s.last == '"')
      s.substring(1, s.length - 1).replace("\"\"", "\"")
    else if (s.length >= 2 && s.head == '`' && s.last == '`')
      s.substring(1, s.length - 1).replace("``", "`")
    else s

  private val createRe =
    ("""(?is)^CREATE\s+(OR\s+REPLACE\s+)?(TEMPORARY\s+|TEMP\s+)?(ANN|DEDUP)\s+INDEX\s+(?:(IF\s+NOT\s+EXISTS)\s+)?""" +
      Ident + """\s+ON\s+""" + TableIdent + """\s*\(\s*""" + Ident +
      """\s*,\s*""" + Ident + """\s*\)\s*(?:OPTIONS\s*\((.*)\))?\s*$""").r
  private val alterRe =
    ("""(?is)^ALTER\s+INDEX\s+""" + Ident +
      """\s+(?:(COMPACT|RETRAIN)|APPEND\s+FROM\s+(.+?)(?:\s+TAG\s+'((?:[^']|'')*)')?)\s*$""").r
  private val dropRe =
    ("""(?is)^DROP\s+(ANN|DEDUP)\s+INDEX\s+(?:(IF\s+EXISTS)\s+)?""" +
      Ident + """\s*$""").r
  private val showRe =
    """(?is)^\s*SHOW\s+GRAFT\s+INDEXES\s*;?\s*$""".r
  private val headRe =
    """(?is)^\s*(?:CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?(?:ANN|DEDUP)\s+INDEX|DROP\s+(?:ANN|DEDUP)\s+INDEX|ALTER\s+INDEX|SHOW\s+GRAFT\s+INDEXES)\b""".r

  /** True when the statement is index-lifecycle DDL this object owns. */
  def handles(text: String): Boolean = headRe.findFirstIn(text).isDefined

  private def reject(why: String): Nothing =
    throw new IllegalArgumentException(
      s"unsupported index DDL form: $why. Supported: CREATE [OR REPLACE] " +
        "[TEMPORARY] ANN|DEDUP INDEX [IF NOT EXISTS] ix ON table(idCol, " +
        "valCol) [OPTIONS(...)], ALTER INDEX ix APPEND FROM " +
        "<table|(SELECT ...)> [TAG 'tag'] | COMPACT | RETRAIN, DROP " +
        "ANN|DEDUP INDEX [IF EXISTS] ix; identifiers may be bare, " +
        "\"double-quoted\" or `backticked`")

  /** A table identifier as [[GraftTableFunctions.inputFrame]] expects it:
    * a double-quoted DDL identifier becomes a backticked Spark one (the
    * catalog lookup parses backticks, not double quotes). */
  private def sourceRef(rawIdent: String): String =
    if (rawIdent.nonEmpty && rawIdent.head == '"' && rawIdent.last == '"')
      "`" + unquoteIdent(rawIdent).replace("`", "``") + "`"
    else rawIdent

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
      // every visible registration — durable catalog entries plus this
      // session's TEMPORARY names shadowing them (per-tree details live
      // in GRAFT_INDEX_STATS)
      import spark.implicits._
      GraftIndexRegistry.list(spark)
        .map { case (d, temp) =>
          (d.name, d.family, d.path, d.table, d.idCol, d.valCol, temp) }
        .toDF("index", "family", "path", "table", "id_col", "val_col",
          "temporary")

    case createRe(orReplace, temp, kindWord, ifNot, nameQ, tableQ, idColQ,
                  valColQ, optText) =>
      val name = unquoteIdent(nameQ)
      val table = unquoteIdent(tableQ)
      val idCol = unquoteIdent(idColQ)
      val valCol = unquoteIdent(valColQ)
      if (orReplace != null && ifNot != null)
        reject("OR REPLACE cannot be combined with IF NOT EXISTS")
      val temporary = temp != null
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
      // collision checks are LAYER-scoped (temp-view discipline): a
      // TEMPORARY name may shadow a durable one without clashing — only
      // a same-layer redefinition collides
      GraftIndexRegistry.getInLayer(spark, name, temporary) match {
        case Some(d) if orReplace == null =>
          if (ifNot != null) return status(spark, "CREATE INDEX", name, d.path)
          throw new IllegalArgumentException(s"index $name already exists")
        case _ =>
      }
      val path = opts.getOrElse("path", defaultPath(spark, name))
      // strict true/false (r17 ADVICE): `attach '1'` or a typo silently
      // fell through to a full BUILD — staging a new version over the
      // tree the user meant only to adopt read-only
      val attach = opts.get("attach") match {
        case None => false
        case Some(v) if v.equalsIgnoreCase("true") => true
        case Some(v) if v.equalsIgnoreCase("false") => false
        case Some(v) => reject(s"option attach must be true or false, got '$v'")
      }
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
        val src = GraftTableFunctions.inputFrame(spark, sourceRef(tableQ))
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
      val d0 =
        GraftIndexRegistry.IndexDef(name, family, path, table, idCol, valCol)
      if (temporary) GraftIndexRegistry.putTemporary(spark, d0)
      else {
        GraftIndexRegistry.putDurable(spark, d0, replace = orReplace != null)
        // a durable OR REPLACE also clears a same-name TEMPORARY shadow —
        // otherwise the session would keep resolving the name it just
        // asked to replace
        if (orReplace != null) {
          GraftIndexRegistry.dropTemporaryShadow(spark, name); ()
        }
      }
      status(spark, "CREATE INDEX", name, path)

    case alterRe(nameQ, maintenance, appendFrom, tagLit) =>
      val name = unquoteIdent(nameQ)
      val d = GraftIndexRegistry.get(spark, name).getOrElse(
        throw new IllegalArgumentException(
          s"index $name is not registered (plain CREATE registers " +
            "durably in the warehouse catalog; CREATE ... OPTIONS(path " +
            "'<dir>', attach true) re-attaches a persisted tree)"))
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
          // rule, which exists for streaming replays, not DDL).
          // TAG '<tag>' (r17 verdict #2) supplies the tag: a retried
          // statement re-delivers under the SAME tag, which the dedup
          // families absorb by overwriting their ingest=<tag> partition
          // and the ANN family skips on its applied marker — without it
          // each statement draws a fresh tag and a retry double-inserts.
          val clientTag = Option(tagLit).map(_.replace("''", "'"))
          val tag = clientTag.getOrElse("ddl" +
            java.util.UUID.randomUUID().toString.replace("-", "").take(12))
          d.family match {
            case "ann" =>
              graft.pipeline.IvfIndex.append(src, d.idCol, d.valCol, d.path,
                tag = clientTag.orNull)
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

    case dropRe(kindWord, ifEx, nameQ) =>
      val name = unquoteIdent(nameQ)
      GraftIndexRegistry.get(spark, name) match {
        case None =>
          if (ifEx != null) status(spark, "DROP INDEX", name, "")
          else throw new IllegalArgumentException(
            s"index $name is not registered")
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
          // a DANGLING registration (the tree — possibly its whole parent
          // temp dir — is gone) skips the lock: there is nothing to
          // serialize against, and the lock FILE needs the parent to
          // exist; plain unregister is the only remaining work
          if (fs.exists(p))
            graft.pipeline.WriterLock.withLock(spark, d.path) {
              fs.delete(p, true); ()
            }
          GraftIndexRegistry.remove(spark, name)
          status(spark, "DROP INDEX", name, d.path)
      }

    case _ => reject("statement does not match the supported grammar")
  }
}
