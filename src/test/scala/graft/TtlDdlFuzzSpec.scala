package graft

import graft.engine.{Expiration, GraftSql}
import scala.util.Random

/** Differential fuzz for the CREATE TABLE ... WITH (...) option surface
  * (r12 — new parser, same discipline as AuthFuzzSpec): random option
  * lists (valid and invalid values, shuffled order, random whitespace,
  * quoted keys) against an independent re-coding of the reference's
  * validation matrix (/root/reference/server/nosql_command.cpp:2100-2211
  * + the engine's PARTITION-needs-interval rule). Asserts three
  * properties per seed:
  *  - accept/reject agrees with the matrix,
  *  - a rejected CREATE leaves NO catalog entry behind,
  *  - an accepted CREATE records exactly the declared expiration + hints.
  */
class TtlDdlFuzzSpec extends SparkTestBase {

  private val units = Seq("DAY", "HOUR", "MINUTE", "SECOND", "MILLISECOND")

  /** One drawn option: key, raw SQL text, and its parsed meaning (None =
    * invalid value for that key). */
  private case class Opt(key: String, sql: String, valid: Boolean,
                         value: String = "")

  private def drawOpt(rnd: Random): Opt = rnd.nextInt(7) match {
    case 0 => // expiration_time: int, sometimes invalid
      rnd.nextInt(5) match {
        case 0 => Opt("expiration_time", "expiration_time=0", valid = false)
        case 1 => Opt("expiration_time", "expiration_time=-3", valid = false)
        case 2 => Opt("expiration_time", "expiration_time=99999999999", valid = false)
        case 3 => Opt("expiration_time", "expiration_time='x'", valid = false)
        case _ =>
          val n = 1 + rnd.nextInt(365)
          Opt("expiration_time", s"expiration_time=$n", valid = true, n.toString)
      }
    case 1 =>
      if (rnd.nextInt(4) == 0)
        Opt("expiration_time_unit", "expiration_time_unit='FORTNIGHT'", valid = false)
      else {
        val u = units(rnd.nextInt(units.size))
        // case-insensitive unit
        val spelled = if (rnd.nextBoolean()) u else u.toLowerCase
        Opt("expiration_time_unit", s"expiration_time_unit='$spelled'",
          valid = true, u)
      }
    case 2 =>
      if (rnd.nextInt(4) == 0)
        Opt("expiration_division_count", "expiration_division_count=0", valid = false)
      else {
        val n = 1 + rnd.nextInt(16)
        Opt("expiration_division_count", s"expiration_division_count=$n",
          valid = true, n.toString)
      }
    case 3 =>
      if (rnd.nextInt(4) == 0)
        Opt("expiration_type", "expiration_type='COLUMN'", valid = false)
      else {
        val t = if (rnd.nextBoolean()) "ROW" else "PARTITION"
        val spelled = if (rnd.nextBoolean()) t else t.toLowerCase
        Opt("expiration_type", s"expiration_type='$spelled'", valid = true, t)
      }
    case 4 =>
      val a = s"aff${rnd.nextInt(9)}"
      Opt("data_affinity", s"data_affinity='$a'", valid = true, a)
    case 5 =>
      Opt("interval_worker_group", s"interval_worker_group=${rnd.nextInt(8)}",
        valid = true)
    case _ =>
      val k = s"bogus_knob_${rnd.nextInt(3)}"
      Opt(k, s"$k=1", valid = false)
  }

  /** The reference's acceptance matrix, re-coded independently of
    * GraftDdl.buildExpiration (different control flow, no shared code). */
  private def expectAccept(opts: Seq[Opt], timeseries: Boolean,
                           interval: Boolean): Boolean = {
    if (opts.map(_.key).distinct.size != opts.size) return acceptDupKeys(opts, timeseries, interval)
    if (opts.exists(o => o.key.startsWith("bogus"))) return false
    if (opts.exists(o => !o.valid)) return false
    val time = opts.find(_.key == "expiration_time")
    val unit = opts.find(_.key == "expiration_time_unit")
    val div = opts.find(_.key == "expiration_division_count")
    val typ = opts.find(_.key == "expiration_type").map(_.value)
    val anyExp = time.isDefined || unit.isDefined || div.isDefined || typ.isDefined
    if (!anyExp) return true // placement hints alone are fine
    val resolved = typ.getOrElse("PARTITION")
    if (div.isDefined && resolved == "PARTITION") return false
    if (resolved == "ROW" && !timeseries) return false
    if (time.isEmpty) return false
    if (resolved == "PARTITION" && !interval) return false
    true
  }

  /** Duplicate keys: the parser keeps the LAST occurrence (Map semantics);
    * acceptance is then the matrix over the deduped (last-wins) list. */
  private def acceptDupKeys(opts: Seq[Opt], timeseries: Boolean,
                            interval: Boolean): Boolean = {
    val lastWins = opts.groupBy(_.key).map(_._2.last).toSeq
    expectAccept(lastWins, timeseries, interval)
  }

  test("WITH-option fuzz: accept/reject matches the reference matrix, no residue, exact recording") {
    val cat = graft.engine.GraftCatalog.forSession(spark)
    var accepted = 0
    var rejected = 0
    for (seed <- 0 until 400) {
      // scramble: sequential java.util.Random seeds correlate heavily on
      // their first draws (LCG), which skews the branch split
      val rnd = new Random((20260815L + seed) * -7046029254386353131L)
      // half the seeds draw a structurally coherent declaration (so the
      // accept branch is exercised ~200 times, not only when 1-4 random
      // draws happen to be consistent); the other half stay adversarial
      val (opts, timeseries, interval) =
        if (rnd.nextBoolean()) {
          val typ = if (rnd.nextBoolean()) "ROW" else "PARTITION"
          val b = Seq.newBuilder[Opt]
          val n = 1 + rnd.nextInt(365)
          b += Opt("expiration_time", s"expiration_time=$n", valid = true, n.toString)
          if (rnd.nextBoolean()) {
            val u = units(rnd.nextInt(units.size))
            b += Opt("expiration_time_unit", s"expiration_time_unit='$u'", valid = true, u)
          }
          if (rnd.nextBoolean())
            b += Opt("expiration_type", s"expiration_type='$typ'", valid = true, typ)
          val typDeclared = b.result().exists(_.key == "expiration_type")
          val resolved = if (typDeclared) typ else "PARTITION"
          if (resolved == "ROW" && rnd.nextBoolean()) {
            val d = 1 + rnd.nextInt(16)
            b += Opt("expiration_division_count", s"expiration_division_count=$d",
              valid = true, d.toString)
          }
          if (rnd.nextBoolean()) {
            val a = s"aff${rnd.nextInt(9)}"
            b += Opt("data_affinity", s"data_affinity='$a'", valid = true, a)
          }
          (b.result(),
            resolved == "ROW" || rnd.nextBoolean(),
            resolved == "PARTITION" || rnd.nextBoolean())
        } else {
          val nOpts = 1 + rnd.nextInt(4)
          (Seq.fill(nOpts)(drawOpt(rnd)), rnd.nextBoolean(), rnd.nextBoolean())
        }
      val shuffled = rnd.shuffle(opts)
      // last-wins is over the SHUFFLED (= parsed) order, not the draw order
      // random whitespace + occasional quoted key
      val optSql = shuffled.map { o =>
        val s = if (rnd.nextInt(5) == 0) "\"" + o.key + "\"" + o.sql.drop(o.key.length) else o.sql
        (" " * rnd.nextInt(3)) + s + (" " * rnd.nextInt(2))
      }.mkString(",")
      val name = "ttlfz_tab"
      val ddl =
        s"CREATE TABLE $name (ts TIMESTAMP PRIMARY KEY, v DOUBLE)" +
          (if (timeseries) " USING TIMESERIES" else "") +
          s" WITH ($optSql)" +
          (if (interval) " PARTITION BY RANGE(ts) EVERY (1, DAY)" else "")
      GraftSql.sql(spark, s"DROP TABLE IF EXISTS $name")
      val expect = expectAccept(shuffled, timeseries, interval)
      val got = try { GraftSql.sql(spark, ddl); true }
                catch { case _: IllegalArgumentException => false }
      assert(got == expect,
        s"seed=$seed expect=$expect got=$got ddl=$ddl")
      if (expect) {
        accepted += 1
        // recording: last-wins dedup of the drawn options
        val byKey = shuffled.groupBy(_.key).map { case (k, v) => k -> v.last }
        val c = cat.get(name)
        val time = byKey.get("expiration_time").map(_.value.toInt)
        if (time.isDefined) {
          val exp = c.expiration.getOrElse(fail(s"seed=$seed: expiration not recorded"))
          assert(exp.time == time.get, s"seed=$seed time")
          assert(exp.unit == byKey.get("expiration_time_unit").map(_.value).getOrElse("DAY"),
            s"seed=$seed unit")
          assert(exp.divisionCount ==
            byKey.get("expiration_division_count").map(_.value.toInt).getOrElse(8),
            s"seed=$seed division")
          assert(exp.expirationType ==
            byKey.get("expiration_type").map(_.value).getOrElse("PARTITION"),
            s"seed=$seed type")
        } else assert(c.expiration.isEmpty, s"seed=$seed: phantom expiration")
        byKey.get("data_affinity").foreach(o =>
          assert(c.placementHints.get("data_affinity").contains(o.value), s"seed=$seed affinity"))
        GraftSql.sql(spark, s"DROP TABLE $name")
      } else {
        rejected += 1
        assert(!cat.exists(name), s"seed=$seed: rejected CREATE left $name behind: $ddl")
      }
    }
    // degenerate-sweep guard: both branches must actually be exercised
    assert(accepted > 80 && rejected > 80, s"skew: accepted=$accepted rejected=$rejected")
  }
}
