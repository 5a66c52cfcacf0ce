package graft

import graft.engine.{GraftAuth, GraftCatalog}
import scala.util.Random

/** Meta-consistency fuzz between the auth gate's two authorities
  * (r13 verdict #7): the TEXT gate (GraftAuth.preCheck — runs before
  * statement routing) and the PLAN gate (GraftAuth.check — runs on the
  * parsed plan). Every bypass found in r10-r13 was a DISAGREEMENT between
  * the layers: the plan side knew the statement touched protected state,
  * the text side mis-lexed a literal/comment and stayed silent.
  *
  * The property: for the statement families whose dialect route executes
  * its catalog effect AT PARSE TIME (GridDB DML verbs — the plan gate
  * never sees an equivalent plan on that route), the TEXT verdict must
  * never GRANT what the PLAN verdict (computed here on the native parse
  * of the same text) DENIES. Text may be stricter, never looser. Shapes
  * without a native parse (REPLACE INTO) are covered by AuthFuzzSpec's
  * end-to-end oracle instead.
  *
  * The mutation pool is the bypass-class museum: literals containing
  * pseudo-verbs, doubled quotes, raw strings (r'\'), comment openers
  * inside literals, nested bracketed comments, double-quoted strings
  * with escapes, case/whitespace noise. Width scales with
  * GRAFT_AUTH_FUZZ_MUL (default 1 = 1000 statements).
  */
class AuthMetaFuzzSpec extends SparkTestBase {

  private val Prot = "mz_prot_tab"

  // parse-time-effect dialect DML: (template, nativeParseable)
  private val shapes: Seq[(String => String, Boolean)] = Seq(
    ((t: String) => s"INSERT INTO $t VALUES (1)", true),
    ((t: String) => s"INSERT OVERWRITE TABLE $t SELECT 1", true),
    ((t: String) => s"REPLACE INTO $t VALUES (1)", false),
    ((t: String) => s"UPDATE $t SET x = 2", true),
    ((t: String) => s"DELETE FROM $t", true))

  private val spellings: Seq[String] =
    Seq(Prot, Prot.toUpperCase, s"`$Prot`", "Mz_Prot_Tab")

  // predicates whose literals are the r13 lexer-bypass classes — each one
  // historically desynced a text scanner from the parser's view
  private val predicates: Seq[String] = Seq(
    "",
    s" WHERE s = 'DELETE FROM $Prot'",
    s" WHERE s = 'INSERT INTO $Prot VALUES (1)'",
    " WHERE s = 'it''s'",
    """ WHERE s = r'\'""",
    " WHERE s = '/* not a comment'",
    """ WHERE s = "d\"q"""",
    " WHERE s = '-- not a line comment'",
    s" WHERE s = '$Prot' AND t = `back` ")

  private def mutate(sql: String, rnd: Random): String = {
    // unconditional draws (seed-stability discipline)
    val comment = rnd.nextInt(4)
    val lower = rnd.nextBoolean()
    val pad = rnd.nextBoolean()
    val s1 = if (lower) sql.toLowerCase else sql
    val s2 = comment match {
      case 0 => s1
      case 1 => s"-- mz\n$s1"
      case 2 => s"/* mz ${rnd.nextInt(100)} */ $s1"
      case _ => s"/* outer /* nested ${rnd.nextInt(100)} */ still comment */ $s1"
    }
    if (pad) s"  $s2" else s2
  }

  private def sweep(withSelectGrant: Boolean, seeds: Range): Unit = {
    val cat = GraftCatalog.forSession(spark)
    if (cat.metaUsers.collect().exists(_.getString(0) == "mz_user"))
      cat.dropUser("mz_user")
    cat.createUser("mz_user", Some("mzpw"))
    if (withSelectGrant) cat.grant("SELECT", Prot, "mz_user")
    GraftAuth.install(cat, Set(Prot))
    spark.conf.set(GraftAuth.UserKey, "mz_user")
    spark.conf.set(GraftAuth.PasswordKey, "mzpw")
    // a VANILLA Spark parser, not the session's dialect parser: the
    // dialect route executes its catalog effect at parse time (and would
    // throw on the missing fixture table), which would make planDenied
    // None and the whole property vacuous (r14 second review pass). The
    // plan verdict must come from the clean native parse of the text.
    val nativeParser = new org.apache.spark.sql.execution.SparkSqlParser()
    try {
      var looser = List.empty[String]
      var planDenials = 0
      for (seed <- seeds) {
        val rnd = new Random(seed)
        val (mk, nativeOk) = shapes(rnd.nextInt(shapes.length))
        val onProt = rnd.nextInt(4) > 0
        val t =
          if (onProt) spellings(rnd.nextInt(spellings.length))
          else Seq("mz_open_tab", "MZ_OPEN_TAB")(rnd.nextInt(2))
        val pred = predicates(rnd.nextInt(predicates.length))
        val base = mk(t)
        // predicates only graft onto verbs that accept one
        val withPred =
          if (pred.nonEmpty && (base.startsWith("UPDATE") || base.startsWith("DELETE")))
            base + pred
          else base
        val sql = mutate(withPred, rnd)
        val textDenied =
          try { GraftAuth.preCheck(spark, sql); false }
          catch { case _: SecurityException => true }
        val planDenied: Option[Boolean] =
          if (!nativeOk) None
          else try {
            val plan = nativeParser.parsePlan(sql)
            try { GraftAuth.check(spark, plan); Some(false) }
            catch { case _: SecurityException => Some(true) }
          } catch { case _: Throwable => None } // no native parse
        if (planDenied.contains(true)) planDenials += 1
        if (planDenied.contains(true) && !textDenied)
          looser ::= s"seed=$seed  plan DENIES, text GRANTS:  $sql"
      }
      assert(looser.isEmpty,
        s"${looser.length} TEXT-LOOSER-THAN-PLAN divergences:\n${looser.mkString("\n")}")
      // non-vacuity: the sweep must actually have produced plan-denied
      // statements, else the property tested nothing
      assert(planDenials > seeds.size / 10,
        s"only $planDenials plan denials in ${seeds.size} seeds — sweep is near-vacuous")
    } finally {
      GraftAuth.uninstall()
      cat.dropUser("mz_user")
      spark.conf.unset(GraftAuth.UserKey)
      spark.conf.unset(GraftAuth.PasswordKey)
    }
  }

  private val mul = sys.env.getOrElse("GRAFT_AUTH_FUZZ_MUL", "1").toInt

  test("meta-fuzz: text gate never grants a parse-time-effect write the plan gate denies (no grant)") {
    sweep(withSelectGrant = false, 0 until 600 * mul)
  }

  test("meta-fuzz: same property under SELECT grant (writes still denied by both)") {
    sweep(withSelectGrant = true, 10000 until (10000 + 400 * mul))
  }

  test("literal-packed statement is scanned in linear time and the real option still gates (r13 ADVICE)") {
    val cat = GraftCatalog.forSession(spark)
    if (cat.metaUsers.collect().exists(_.getString(0) == "mz_user"))
      cat.dropUser("mz_user")
    cat.createUser("mz_user", Some("mzpw"))
    GraftAuth.install(cat, Set(Prot),
      protectedPaths = Map("/data/mz_secret" -> Prot))
    spark.conf.set(GraftAuth.UserKey, "mz_user")
    spark.conf.set(GraftAuth.PasswordKey, "mzpw")
    try {
      // thousands of in-literal pseudo-keywords: every one is a rejected
      // regex hit; pre-fix the scan resumed one char past each rejection
      // (O(n*rejections) rescans — a pre-auth slowdown vector on the
      // wire); post-fix a rejected in-literal hit skips its whole literal
      val decoys = (0 until 3000)
        .map(i => s"'path $i /data/mz_secret OVERWRITE DIRECTORY'")
        .mkString(", ")
      val sql = s"CREATE TABLE mz_alias (c STRING COMMENT 'x') USING parquet " +
        s"OPTIONS (comments array($decoys), path '/data/mz_secret')"
      val t0 = System.nanoTime()
      val denied =
        try { GraftAuth.preCheck(spark, sql); false }
        catch { case _: SecurityException => true }
      val wall = (System.nanoTime() - t0) / 1e9
      assert(denied, "the REAL path option after 3000 decoy literals must still gate")
      assert(wall < 3.0, f"preCheck took $wall%.2f s on a literal-packed statement — quadratic rescans are back")
    } finally {
      GraftAuth.uninstall()
      cat.dropUser("mz_user")
      spark.conf.unset(GraftAuth.UserKey)
      spark.conf.unset(GraftAuth.PasswordKey)
    }
  }
}
