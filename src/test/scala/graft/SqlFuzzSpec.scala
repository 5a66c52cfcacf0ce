package graft

import graft.engine.{GraftSql, Tables}
import graft.queries.FuzzQueries
import graft.tql.TqlCompiler

import scala.util.Random

/** Grammar fuzzers (round-7 verdict ask #5).
  *
  * Two nets, both seed-pinned:
  *
  *  1. SQL: 200 seeds through FuzzQueries.genSql — every generated text
  *     must parse, execute through the GraftSql front door, and be
  *     DETERMINISTIC (two executions, the second at a different shuffle
  *     partitioning, must agree bit-for-bit). Nondeterminism is the one
  *     failure mode that would poison the driver's DuckDB hash compare, so
  *     it is asserted here before any seed graduates to the registered
  *     q_fuzz_* set (the driver then differentially checks those against
  *     DuckDB — the independent-engine half of the net).
  *
  *  2. TQL: 200 random TQL queries over the events TimeSeries, each
  *     compiled by TqlCompiler AND rendered to the equivalent Spark SQL
  *     text — results must match row-for-row. This differentially tests
  *     our parser/lowering (the code we own) against Catalyst's own SQL
  *     path, catching precedence, coercion, and NULL-semantics bugs no
  *     single hand-written query would.
  */
class SqlFuzzSpec extends SparkTestBase {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("SQL fuzz: 200 seeds parse, run, and are deterministic") {
    Tables.registerAll(spark, sfDir)
    val failures = Seq.newBuilder[String]
    (0 until 200).foreach { seed =>
      val text = FuzzQueries.genSql(seed)
      try {
        val a = canon(GraftSql.sql(spark, text))
        val b = spark.conf.get("spark.sql.shuffle.partitions") match {
          case old =>
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            try canon(GraftSql.sql(spark, text))
            finally spark.conf.set("spark.sql.shuffle.partitions", old)
        }
        if (a != b)
          failures += s"seed $seed NONDETERMINISTIC (${a.size} vs ${b.size} rows)\n$text"
      } catch {
        case e: Exception =>
          failures += s"seed $seed FAILED: ${e.getMessage.take(200)}\n$text"
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, fs.take(3).mkString("\n---\n"))
  }

  test("SQL fuzz v3/v5 (windows, join trees): 100 seeds each, deterministic") {
    Tables.registerAll(spark, sfDir)
    val failures = Seq.newBuilder[String]
    for (gen <- Seq[Int => String](FuzzQueries.genSql3, FuzzQueries.genSql5);
         seed <- 0 until 100) {
      val text = gen(seed)
      try {
        val a = canon(GraftSql.sql(spark, text))
        val old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val b = try canon(GraftSql.sql(spark, text))
        finally spark.conf.set("spark.sql.shuffle.partitions", old)
        if (a != b) failures += s"seed $seed NONDETERMINISTIC\n$text"
      } catch {
        case e: Exception =>
          failures += s"seed $seed FAILED: ${e.getMessage.take(200)}\n$text"
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, fs.take(3).mkString("\n---\n"))
  }

  test("SQL fuzz v4 (time-typed, events): 100 seeds parse, run, deterministic") {
    Tables.registerAll(spark, sfDir)
    val failures = Seq.newBuilder[String]
    (0 until 100).foreach { seed =>
      val text = FuzzQueries.genSql4(seed)
      try {
        val a = canon(GraftSql.sql(spark, text))
        val old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val b = try canon(GraftSql.sql(spark, text))
        finally spark.conf.set("spark.sql.shuffle.partitions", old)
        if (a != b) failures += s"seed $seed NONDETERMINISTIC\n$text"
      } catch {
        case e: Exception =>
          failures += s"seed $seed FAILED: ${e.getMessage.take(200)}\n$text"
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, fs.take(3).mkString("\n---\n"))
  }

  // ---- TQL differential fuzz ----------------------------------------------

  private val numCols = Vector("value", "user_id", "event_id")
  private def pick[T](r: Random, xs: Vector[T]): T = xs(r.nextInt(xs.size))

  /** (tql fragment, equivalent spark-sql fragment) scalar expr pairs.
    * TQL and Spark SQL share syntax for this core, so most pairs are
    * textually identical — the point is that they go through two different
    * PARSERS and lowerings. */
  private def numPair(r: Random, depth: Int = 0): String = {
    val leaf = r.nextInt(3) match {
      case 0 => pick(r, numCols)
      case 1 => (r.nextInt(200) + 1).toString
      case _ => f"${r.nextDouble() * 100}%.2f"
    }
    if (depth >= 2 || r.nextInt(3) == 0) leaf
    else r.nextInt(4) match {
      case 0 => s"($leaf + ${numPair(r, depth + 1)})"
      case 1 => s"($leaf - ${numPair(r, depth + 1)})"
      case 2 => s"($leaf * ${numPair(r, depth + 1)})"
      case _ => s"ROUND($leaf)"
    }
  }

  private def predPair(r: Random, depth: Int = 0): String = {
    val atom = r.nextInt(5) match {
      case 0 =>
        val op = pick(r, Vector("<", "<=", "=", ">", ">=", "<>"))
        s"${numPair(r, 1)} $op ${numPair(r, 1)}"
      case 1 => s"event_type LIKE '%${pick(r, Vector("ic", "ou", "a"))}%'"
      case 2 => s"props IS ${if (r.nextBoolean()) "NOT " else ""}NULL"
      case 3 => s"event_type = '${pick(r, Vector("click", "view", "purchase"))}'"
      case _ => s"value > ${r.nextInt(500)}"
    }
    if (depth >= 2 || r.nextInt(3) == 0) atom
    else r.nextInt(3) match {
      case 0 => s"($atom AND ${predPair(r, depth + 1)})"
      case 1 => s"($atom OR ${predPair(r, depth + 1)})"
      case _ => s"(NOT ${predPair(r, depth + 1)})"
    }
  }

  test("TQL fuzz: 200 seeds — TqlCompiler matches Catalyst SQL row-for-row") {
    Tables.registerAll(spark, sfDir)
    val ev = Tables.container(spark, sfDir, "events")
    val failures = Seq.newBuilder[String]
    (0 until 200).foreach { seed =>
      val r = new Random(1000 + seed)
      val where = predPair(r)
      val (tql, sql) = r.nextInt(3) match {
        case 0 => // row select with order/limit/offset
          val lim = r.nextInt(50) + 1; val off = r.nextInt(10)
          val dir = if (r.nextBoolean()) "ASC" else "DESC"
          (s"SELECT * WHERE $where ORDER BY event_id $dir LIMIT $lim OFFSET $off",
            s"SELECT * FROM events WHERE $where ORDER BY event_id $dir LIMIT $lim OFFSET $off")
        case 1 => // aggregation
          val (fn, arg) = r.nextInt(5) match {
            case 0 => ("COUNT", "*")
            case 1 => ("SUM", pick(r, numCols))
            case 2 => ("AVG", pick(r, numCols))
            case 3 => ("MIN", pick(r, numCols))
            case _ => ("MAX", pick(r, numCols))
          }
          (s"SELECT $fn($arg) WHERE $where",
            s"SELECT $fn($arg) FROM events WHERE $where")
        case _ => // plain filtered scan, stable total order
          (s"SELECT * WHERE $where ORDER BY event_id",
            s"SELECT * FROM events WHERE $where ORDER BY event_id")
      }
      try {
        val ours = TqlCompiler.run(ev, tql).collect().map(_.toString).toSeq
        val ref = spark.sql(sql).collect().map(_.toString).toSeq
        if (ours != ref)
          failures += s"seed $seed DIVERGED (ours=${ours.size} ref=${ref.size})\nTQL: $tql\nSQL: $sql" +
            s"\nfirst-diff: ${ours.zipAll(ref, "<none>", "<none>").find(p => p._1 != p._2)}"
      } catch {
        case e: Exception =>
          failures += s"seed $seed FAILED: ${e.getMessage.take(200)}\nTQL: $tql"
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"${fs.size} failures\n" + fs.take(3).mkString("\n---\n"))
  }
}
