package graft

import graft.engine.{GraftSql, PartitionedTables}
import scala.util.Random

/** Differential fuzz for the TTL expiry SWEEP arithmetic (r12 — the
  * closing review found two real defects in exactly this code, so the
  * boundary net earns its place): random unit/TTL/interval/row-instant
  * draws, survivors compared against a first-principles oracle computed
  * directly from the reference semantics —
  *  - ROW:       erase iff ts + ttl <= now      (checkExpirableInterval)
  *  - PARTITION: erase iff bucketEnd + ttl <= now, bucket = floorDiv
  * Rows are drawn CLUSTERED around the expiry boundary (exact boundary,
  * +-1 ms, bucket edges) so off-by-one/inclusivity bugs cannot hide in
  * sparse random draws. Also checks sweep idempotence at the same now.
  */
class TtlSweepFuzzSpec extends SparkTestBase {

  private val cat = graft.engine.GraftCatalog.forSession(spark)

  test("expiry sweep fuzz: survivors match the first-principles oracle (ROW + PARTITION, ms/nano)") {
    for (seed <- 0 until 120) {
      val rnd = new Random((77260815L + seed) * -7046029254386353131L)
      val row = rnd.nextBoolean()
      val nano = rnd.nextBoolean()
      val (unit, unitMs) = Seq(
        ("DAY", 86400000L), ("HOUR", 3600000L), ("MINUTE", 60000L),
        ("SECOND", 1000L))(rnd.nextInt(4))
      val time = 1 + rnd.nextInt(48)
      val ttlMs = time * unitMs
      val everyMs = Seq(3600000L, 86400000L, 60000L)(rnd.nextInt(3))
      val now = 1704067200000L + rnd.nextInt(1 << 30) // 2024-01-01 + ~12d
      val cutoff = now - ttlMs
      val wm = PartitionedTables.ttlWatermark(now, ttlMs, everyMs)

      // rows clustered on the boundaries: the ROW cutoff instant +-1, the
      // watermark bucket's edges +-1, plus uniform background
      val instants = (Seq(cutoff - 1, cutoff, cutoff + 1,
        wm - 1, wm, wm + 1, wm - everyMs, wm + everyMs - 1, wm + everyMs) ++
        Seq.fill(12)(now - rnd.nextLong(4 * ttlMs + 1)))
        .filter(_ > 0).distinct.sorted
      val expectSurvive = instants.filter { ts =>
        if (row) !(ts + ttlMs <= now)
        else {
          val bucket = Math.floorDiv(ts, everyMs) * everyMs
          !(bucket + everyMs + ttlMs <= now)
        }
      }

      val name = "ttl_sweep_fz"
      GraftSql.sql(spark, s"DROP TABLE IF EXISTS $name")
      val tsType = if (nano) "TIMESTAMP(9)" else "TIMESTAMP"
      val ddl =
        s"CREATE TABLE $name (ts $tsType PRIMARY KEY, v DOUBLE) USING TIMESERIES " +
          s"WITH (expiration_time=$time, expiration_time_unit='$unit'" +
          (if (row) ", expiration_type='ROW') " else ") ") +
          (if (!row) s"PARTITION BY RANGE(ts) EVERY (${everyMs / 60000}, MINUTE)" else "")
      GraftSql.sql(spark, ddl)
      val values = instants.zipWithIndex.map { case (ms, i) =>
        val tsLit =
          if (nano) (ms * 1000000L).toString
          else s"TIMESTAMP '${java.time.Instant.ofEpochMilli(ms).toString.stripSuffix("Z").replace("T", " ")}'"
        s"($tsLit, $i.0)"
      }
      GraftSql.sql(spark, s"REPLACE INTO $name VALUES ${values.mkString(", ")}")

      cat.expireNow(now)
      val survived = GraftSql.sql(spark, s"SELECT ts FROM $name").collect().map { r =>
        if (nano) r.getLong(0) / 1000000L
        else r.getTimestamp(0).toInstant.toEpochMilli
      }.sorted.toSeq
      assert(survived == expectSurvive,
        s"seed=$seed row=$row nano=$nano unit=$unit time=$time every=$everyMs now=$now\n" +
          s"survived=$survived\nexpected=$expectSurvive")
      // idempotent at the same instant
      assert(cat.expireNow(now).filter(org.apache.spark.sql.functions.col("TABLE_NAME") === name)
        .collect()(0).getAs[Long]("REMOVED_ROWS") == 0L, s"seed=$seed not idempotent")
      GraftSql.sql(spark, s"DROP TABLE $name")
    }
  }
}
