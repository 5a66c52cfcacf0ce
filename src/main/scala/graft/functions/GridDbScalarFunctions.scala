package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

/** GridDB-dialect SQL functions registered into the session's
  * FunctionRegistry so `spark.sql` accepts GridDB names unchanged.
  *
  * Reference registries: TQL /root/reference/server/function_map.cpp:42-105;
  * SQL /root/reference/server/sql_expression_string.h,
  * sql_expression_numeric.h, sql_expression_time.h, sql_expression_aggr.h.
  * Everything here composes existing codegen'd Catalyst expressions — no
  * Scala UDFs in the hot path.
  */
object GridDbScalarFunctions {

  private def one(args: Seq[Expression], n: String): Expression = {
    require(args.size == 1, s"$n expects 1 argument"); args.head
  }

  /** SQLite-style glob pattern -> anchored Java regex. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    glob.foreach {
      case '*' => sb ++= "(?s:.*)"
      case '?' => sb ++= "(?s:.)"
      case c => sb ++= java.util.regex.Pattern.quote(c.toString)
    }
    sb += '$'
    sb.toString
  }

  /** C-strftime -> java DateTimeFormatter pattern (common subset). */
  def strftimeToJava(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt(i) == '%' && i + 1 < fmt.length) {
        out ++= (fmt(i + 1) match {
          case 'Y' => "yyyy"
          case 'm' => "MM"
          case 'd' => "dd"
          case 'H' => "HH"
          case 'M' => "mm"
          case 'S' => "ss"
          case 'j' => "DDD"
          case '%' => "%"
          case other => other.toString
        })
        i += 2
      } else {
        // literal chars need quoting if alphabetic
        val c = fmt(i)
        if (c.isLetter) { out += '\''; out += c; out += '\'' } else out += c
        i += 1
      }
    }
    out.toString
  }

  private def litString(e: Expression, ctx: String): String = e match {
    case Literal(v, StringType) => v.toString
    case other => throw new IllegalArgumentException(s"$ctx expects a string literal, got $other")
  }

  /** All GridDB-dialect function builders (name -> expression builder). */
  lazy val builders: Seq[(String, Seq[Expression] => Expression)] = {
    val out = Seq.newBuilder[(String, Seq[Expression] => Expression)]
    def tmp(name: String)(builder: Seq[Expression] => Expression): Unit =
      out += (name -> builder)

    // ---- time (function_timestamp.h, sql_expression_time.h) ----
    // Per-call timezone: most reference time functions take an optional
    // trailing 'Z'/±hh:mm argument (grammar rules 267-283 + FLAG_OPTIONAL
    // STRING in sql_expression_time.h:47-197; resolveTimeZone). `local`
    // shifts the instant to that offset's wall clock before field math;
    // `unlocal` shifts a wall-clock result back to an instant.
    def local(ts: Expression, tz: Option[Expression]): Expression =
      tz.fold(ts)(z => FromUTCTimestamp(ts, z))
    def unlocal(ts: Expression, tz: Option[Expression]): Expression =
      tz.fold(ts)(z => ToUTCTimestamp(ts, z))

    tmp("to_epoch_ms")(a => UnixMillis(Cast(one(a, "TO_EPOCH_MS"), TimestampType)))
    tmp("to_timestamp_ms")(a => MillisToTimestamp(one(a, "TO_TIMESTAMP_MS")))
    tmp("from_timestamp")(a => Cast(one(a, "FROM_TIMESTAMP"), StringType))
    // TIMESTAMP_TRUNC(unit, ts[, tz]): truncate on the offset's wall clock,
    // result is still an instant
    tmp("timestamp_trunc") { a =>
      require(a.size == 2 || a.size == 3, "TIMESTAMP_TRUNC(unit, ts[, tz])")
      val tz = a.lift(2)
      unlocal(TruncTimestamp(a(0), local(Cast(a(1), TimestampType), tz)), tz)
    }
    tmp("make_timestamp_by_date") { a =>
      require(a.size == 3 || a.size == 4, "MAKE_TIMESTAMP_BY_DATE(y,m,d[,tz])")
      unlocal(Cast(MakeDate(a(0), a(1), a(2)), TimestampType), a.lift(3))
    }
    tmp("strftime") { a =>
      require(a.size == 2 || a.size == 3, "STRFTIME(fmt, ts[, tz])")
      DateFormatClass(local(Cast(a(1), TimestampType), a.lift(2)),
        Literal(strftimeToJava(litString(a(0), "STRFTIME"))))
    }
    // EXTRACT(field, ts[, tz]) (grammar rule 267; fields rules 272-282).
    // DAY_OF_WEEK is Sunday=0 (util/time.cpp:970 (timeDays+4)%7);
    // MICROSECOND/NANOSECOND are sub-second totals (util/time.h:818-828).
    tmp("griddb_extract") { a =>
      require(a.size == 2 || a.size == 3, "EXTRACT(field, ts[, tz])")
      val ts = local(Cast(a(1), TimestampType), a.lift(2))
      val e: Expression = litString(a(0), "EXTRACT field").toUpperCase match {
        case "YEAR" => Year(ts)
        case "MONTH" => Month(ts)
        case "DAY" => DayOfMonth(ts)
        case "HOUR" => Hour(ts)
        case "MINUTE" => Minute(ts)
        case "SECOND" => Cast(Second(ts), IntegerType)
        case "MILLISECOND" => Pmod(UnixMillis(ts), Literal(1000L))
        case "MICROSECOND" => Pmod(UnixMicros(ts), Literal(1000000L))
        case "NANOSECOND" =>
          Multiply(Pmod(UnixMicros(ts), Literal(1000000L)), Literal(1000L))
        case "DAY_OF_WEEK" => Subtract(DayOfWeek(ts), Literal(1))
        case "DAY_OF_YEAR" => DayOfYear(ts)
        case f => throw new IllegalArgumentException(s"EXTRACT: unknown field $f")
      }
      Cast(e, LongType)
    }
    // TIMESTAMP_ADD/DIFF(unit, ts..., [tz]) — GridDB argument order; the
    // wall-clock wrap matters for YEAR/MONTH arithmetic at an offset
    tmp("griddb_timestamp_add") { a =>
      require(a.size == 3 || a.size == 4, "TIMESTAMP_ADD(unit, ts, amount[, tz])")
      val unit = litString(a(0), "TIMESTAMP_ADD unit").toUpperCase
      val tz = a.lift(3)
      unlocal(TimestampAdd(unit, a(2), local(Cast(a(1), TimestampType), tz)), tz)
    }
    tmp("griddb_timestamp_diff") { a =>
      require(a.size == 3 || a.size == 4, "TIMESTAMP_DIFF(unit, ts1, ts2[, tz])")
      val unit = litString(a(0), "TIMESTAMP_DIFF unit").toUpperCase
      val tz = a.lift(3)
      // reference getDifference: ts1 - ts2 in `unit`
      TimestampDiff(unit, local(Cast(a(2), TimestampType), tz),
        local(Cast(a(1), TimestampType), tz))
    }

    // ---- string (function_string.h, sql_expression_string.h) ----
    tmp("hex_to_dec")(a => Cast(Conv(one(a, "HEX_TO_DEC"), Literal(16), Literal(10)), LongType))
    tmp("glob") { a =>
      require(a.size == 2, "GLOB(pattern, str)")
      RLike(a(1), Literal(globToRegex(litString(a(0), "GLOB"))))
    }
    tmp("quote") { a =>
      val e = one(a, "QUOTE")
      Concat(Seq(Literal("'"),
        StringReplace(Cast(e, StringType), Literal("'"), Literal("''")),
        Literal("'")))
    }
    tmp("substr_with_bounds") { a =>
      require(a.size == 3, "SUBSTR_WITH_BOUNDS(s, pos, len)")
      Substring(a(0), a(1), a(2))
    }

    // PRINTF -> format_string (sql_expression_string.h FUNC_PRINTF)
    tmp("printf") { a =>
      require(a.nonEmpty, "PRINTF(fmt, args...)")
      FormatString(a: _*)
    }
    // UNICODE: code point of the first character (BMP — Spark chars)
    tmp("unicode")(a => Ascii(Cast(one(a, "UNICODE"), StringType)))
    // ZEROBLOB(n): n zero bytes (SQLite compat)
    tmp("zeroblob") { a =>
      Unhex(StringRepeat(Literal("00"), Cast(one(a, "ZEROBLOB"), IntegerType)))
    }
    // MAKE_TIMESTAMP(y, mo, d, h, mi, s) and sub-second variants
    // (sql_expression_time.h FUNC_MAKE_TIMESTAMP*)
    tmp("griddb_make_timestamp") { a =>
      require(a.size == 6 || a.size == 7, "MAKE_TIMESTAMP(y, mo, d, h, mi, s[, tz])")
      unlocal(new MakeTimestamp(a(0), a(1), a(2), a(3), a(4),
        Cast(a(5), DecimalType(16, 6))), a.lift(6))
    }
    def makeTsFrac(a: Seq[Expression], n: String, denom: Long): Expression = {
      require(a.size == 7 || a.size == 8, s"$n(y, mo, d, h, mi, s, frac[, tz])")
      val secs = Add(Cast(a(5), DecimalType(16, 6)),
        Divide(Cast(a(6), DecimalType(16, 6)),
          Cast(Literal(denom), DecimalType(16, 0))))
      unlocal(new MakeTimestamp(a(0), a(1), a(2), a(3), a(4),
        Cast(secs, DecimalType(16, 6))), a.lift(7))
    }
    tmp("make_timestamp_ms")(a => makeTsFrac(a, "MAKE_TIMESTAMP_MS", 1000L))
    tmp("make_timestamp_us")(a => makeTsFrac(a, "MAKE_TIMESTAMP_US", 1000000L))

    // ---- numeric (sql_expression_numeric.h) ----
    tmp("trunc_number") { a =>
      // SQLite TRUNC: toward zero
      val e = one(a, "TRUNC_NUMBER")
      Cast(Cast(e, LongType), DoubleType)
    }

    // ---- aggregates (sql_expression_aggr.h) ----
    // TOTAL: SQLite-style double sum, 0.0 (not NULL) on empty input
    tmp("total") { a =>
      Coalesce(Seq(
        Sum(Cast(one(a, "TOTAL"), DoubleType)).toAggregateExpression(),
        Literal(0.0)))
    }
    // STDDEV0 / VARIANCE0: 0 instead of NULL when n <= 1
    tmp("stddev0") { a =>
      Coalesce(Seq(StddevSamp(Cast(one(a, "STDDEV0"), DoubleType)).toAggregateExpression(),
        Literal(0.0)))
    }
    tmp("variance0") { a =>
      Coalesce(Seq(VarianceSamp(Cast(one(a, "VARIANCE0"), DoubleType)).toAggregateExpression(),
        Literal(0.0)))
    }
    // GROUP_CONCAT(x[, sep]) — input-order concat; deterministic form uses
    // sorted order, matching our oracle strategy
    tmp("group_concat") { a =>
      val sep = if (a.size > 1) a(1) else Literal(",")
      ArrayJoin(SortArray(CollectList(Cast(a.head, StringType)).toAggregateExpression(),
        Literal(true)), sep, None)
    }
    // MEDIAN (exact interpolated — GridDB server/sql_expression_aggr.h:128)
    tmp("griddb_median") { a =>
      new Percentile(Cast(one(a, "MEDIAN"), DoubleType), Literal(0.5)).toAggregateExpression()
    }

    // ---- graft-native (codegen'd) ----
    tmp("graft_cosine") { a =>
      require(a.size == 2, "graft_cosine(a, b)")
      CosineSimilarity(Cast(a(0), ArrayType(DoubleType)), Cast(a(1), ArrayType(DoubleType)))
    }
    tmp("graft_dot") { a =>
      require(a.size == 2, "graft_dot(a, b)")
      DotProduct(Cast(a(0), ArrayType(DoubleType)), Cast(a(1), ArrayType(DoubleType)))
    }
    def litInt(e: Expression, n: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case _ => throw new IllegalArgumentException(s"$n must be an integer literal")
    }
    def litLong(e: Expression, n: String): Long = e match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case _ => throw new IllegalArgumentException(s"$n must be an integer/long literal")
    }
    // Bloom-filter membership over 64-bit keys: the serialized filter is a
    // plan-time binary literal, extracted once into a codegen reference
    // object (same discipline as graft_argmin_center's centroid matrix)
    tmp("graft_bloom_contains") { a =>
      require(a.size == 2, "graft_bloom_contains(hash64, bloomBytesLiteral)")
      val bytes = a(1) match {
        case Literal(b: Array[Byte], BinaryType) => b
        case other => throw new IllegalArgumentException(
          s"graft_bloom_contains filter must be a binary literal, got $other")
      }
      BloomMightContainLong(Cast(a(0), LongType), bytes)
    }
    // mergeable bounded top-k (see TopKByScore): partial buffers capped at
    // k entries, so per-group "keep the best k" never windows a whole group
    // through one task
    tmp("graft_top_k") { a =>
      require(a.size == 4, "graft_top_k(value, score, tie, k)")
      TopKByScore(a(0), Cast(a(1), DoubleType), Cast(a(2), LongType),
        litInt(a(3), "graft_top_k k"))
    }
    // shared plan-time merge-table extraction for the BPE kernels: a
    // typedLit arrives as a Literal, the SQL-text form array(array(..))
    // as a foldable CreateArray — fold it rather than reject it
    def bpeMerges(e: Expression, fn: String): Array[(String, String)] = {
      val folded = e match {
        case l: Literal => l
        case other if other.foldable =>
          Literal.create(other.eval(org.apache.spark.sql.catalyst.InternalRow.empty), other.dataType)
        case other => throw new IllegalArgumentException(
          s"$fn merges must be an array<array<string>> literal, got $other")
      }
      folded match {
        case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(ArrayType(StringType, _), _)) =>
          arr.toObjectArray(ArrayType(StringType)).map { p =>
            val pair = p.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            require(pair.numElements() == 2, "each merge must be a [left, right] pair")
            (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
          }
        case other => throw new IllegalArgumentException(
          s"$fn merges must be an array<array<string>> literal, got $other")
      }
    }
    // BPE encoder with the learned merge table as a plan-time literal,
    // extracted once into a BpeTable reference object (see BpeEncode)
    tmp("graft_bpe_encode") { a =>
      require(a.size == 2, "graft_bpe_encode(text, mergesLiteral)")
      BpeEncode(Cast(a(0), StringType), new BpeTable(bpeMerges(a(1), "graft_bpe_encode")))
    }
    // greedy re-encode from an existing piece array (incremental
    // training's compiled state update); merge table extracted at plan
    // time exactly as graft_bpe_encode does
    tmp("graft_bpe_encode_pieces") { a =>
      require(a.size == 2, "graft_bpe_encode_pieces(pieces, mergesLiteral)")
      BpeEncodePieces(a(0), new BpeTable(bpeMerges(a(1), "graft_bpe_encode_pieces")))
    }
    // Misra-Gries frequent-items summary (see MisraGries): fixed m-counter
    // buffers, mergeable across partitions; counts are lower bounds
    tmp("graft_misra_gries") { a =>
      require(a.size == 2, "graft_misra_gries(term, m)")
      MisraGries(Cast(a(0), StringType), litInt(a(1), "graft_misra_gries m"))
    }
    tmp("graft_minhash_sig") { a =>
      require(a.size == 3, "graft_minhash_sig(text, shingleN, k)")
      MinhashSignature(Cast(a(0), StringType),
        litInt(a(1), "shingleN"), litInt(a(2), "k"))
    }
    tmp("graft_simhash64") { a =>
      require(a.size == 1, "graft_simhash64(text)")
      Simhash64(Cast(a(0), StringType))
    }
    // whole SRP signature per row; hyperplanes derived deterministically
    // from (bits, dim, seed) literals so the registry surface stays SQL
    tmp("graft_srp_sig") { a =>
      require(a.size == 4, "graft_srp_sig(vec, bits, dim, seed)")
      SrpSignature(Cast(a(0), ArrayType(DoubleType)),
        graft.pipeline.Similarity.hyperplanes(
          litInt(a(1), "bits"), litInt(a(2), "dim"), litLong(a(3), "seed")))
    }
    // ---- RANDOM / RANDOMBLOB (sql_expression_numeric.h:89,
    // sql_expression_string.cpp:280; SQLite-inherited semantics). Fresh
    // plan-time seed per occurrence, per-partition streams at runtime —
    // nondeterministic like the reference, so they stay outside the oracle
    // set (FunctionsSpec covers range/length/independence). ----
    tmp("random") { a =>
      require(a.isEmpty, "random() takes no arguments")
      GraftRandom(scala.util.Random.nextLong())
    }
    tmp("randomblob") { a =>
      require(a.size <= 1, "randomblob([n])")
      GraftRandomBlob(
        if (a.isEmpty) Literal(1L) else Cast(a.head, LongType),
        scala.util.Random.nextLong())
    }
    // nearest-centroid assignment kernel (pipeline coarse quantizers): the
    // centroid matrix arrives as a foldable nested-array literal and is
    // extracted ONCE at plan time into the kernel's reference object — the
    // literal never reaches codegen, so the generated source stays small at
    // any list count
    tmp("graft_argmin_center") { a =>
      require(a.size == 2, "graft_argmin_center(vec, centersLiteral)")
      val cents = a(1) match {
        case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(ArrayType(DoubleType, _), _)) =>
          arr.toObjectArray(ArrayType(DoubleType))
            .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray())
        case other => throw new IllegalArgumentException(
          s"graft_argmin_center centers must be an array<array<double>> literal, got $other")
      }
      ArgminCenter(Cast(a(0), ArrayType(DoubleType)), cents)
    }

    // Unicode NFC normalization (JDK Normalizer; isNormalized fast path)
    tmp("graft_nfc") { a =>
      require(a.size == 1, "graft_nfc(text)")
      NfcNormalize(Cast(a(0), StringType))
    }
    // PQ ADC: the per-pair m-lookup sum as one fused loop (parity with the
    // interpreted zip_with/aggregate fold it replaces — see PqAdc)
    tmp("graft_pq_adc") { a =>
      require(a.size == 3, "graft_pq_adc(codes, lut, kCodes)")
      PqAdc(a(0), a(1), litInt(a(2), "graft_pq_adc kCodes"))
    }
    // SQ8 ADC: decode-fused cosine against int8 codes; the per-dim stats
    // literals are extracted once at plan time into reference objects
    // (graft_argmin_center discipline)
    tmp("graft_sq_cosine") { a =>
      require(a.size == 4, "graft_sq_cosine(query, codes, mnLiteral, mxLiteral)")
      def darr(e: Expression, what: String): Array[Double] = e match {
        case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(DoubleType, _)) => arr.toDoubleArray()
        case other => throw new IllegalArgumentException(
          s"graft_sq_cosine $what must be an array<double> literal, got $other")
      }
      val mn = darr(a(2), "mn")
      val mx = darr(a(3), "mx")
      SqCosine(Cast(a(0), ArrayType(DoubleType)), a(1),
        mn, mx.zip(mn).map { case (h, l) => h - l })
    }

    // ---- geometry (function_gis.h; PV3 box test tr-cpp/TrPv3.cpp) ----
    tmp("st_qsfmbrintersects") { a =>
      require(a.size == 2, "st_qsfmbrintersects(qsfKey, boxMbr)")
      graft.geometry.QsfMbrIntersects(
        Cast(a(0), ArrayType(DoubleType)), Cast(a(1), ArrayType(DoubleType)))
    }
    out.result()
  }

  // sessions whose registry this object has already populated — weakly
  // held so a stopped session can be collected
  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register into an existing session, once per session. Operators call
    * this on every build (Verify/Bench build ~90 queries in one session);
    * without the guard createOrReplaceTempFunction logs a "function
    * replaced" WARN per name per build, flooding the logs. `unregister`
    * clears the flag so test hygiene still works, and a cheap sentinel
    * probe self-repairs if something other than unregister() dropped the
    * functions out from under us. */
  def register(spark: SparkSession): Unit = registered.synchronized {
    val reg = spark.sessionState.functionRegistry
    val fresh = registered.add(spark)
    if (fresh || !reg.functionExists(FunctionIdentifier(builders.head._1))) {
      builders.foreach { case (name, b) =>
        reg.createOrReplaceTempFunction(name, b, "built-in")
      }
    }
  }

  /** Drop all registrations (test hygiene) — derived from `builders` so the
    * list can never drift from what register() installs. */
  def unregister(spark: SparkSession): Unit = registered.synchronized {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _) => reg.dropFunction(FunctionIdentifier(name)) }
    registered.remove(spark)
  }
}
