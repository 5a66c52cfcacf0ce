package graft.queries

/** All registered queries, keyed by name. */
object Registry {
  lazy val all: Seq[Q] =
    CoreSql.qs ++ TimeSeriesQueries.qs ++ PipelineQueries.qs ++ TqlQueries.qs ++
      MatchRecognizeQueries.qs ++ NanoQueries.qs ++ GeoQueries.qs ++
      StreamingQueries.qs ++ FuzzQueries.qs ++ TqlFuzz.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  lazy val benchQueries: Seq[Q] = all.filter(_.bench)

  /** Scale factor implied by a data dir's basename, in driver-SF units:
    * `sfX` → X (the driver fixtures, TESTDATA.md), `sfNz` → N × 0.1 (the
    * ScaleGen corpora are N× replications of sf0.1 — scaledata/sf10z is
    * 10× sf0.1 ≈ TPC-H sf1). Unknown layouts (zipf*, ad-hoc dirs) return
    * NaN — the guard then stays out of the way rather than guessing. */
  def sfOf(dir: String): Double = {
    val base = new java.io.File(dir).getName
    base match {
      case s if s.matches("sf\\d+(\\.\\d+)?z") =>
        s.stripPrefix("sf").stripSuffix("z").toDouble * 0.1
      case s if s.matches("sf\\d+(\\.\\d+)?") =>
        s.stripPrefix("sf").toDouble
      case _ => Double.NaN
    }
  }

  /** Refuse to run a driver-SF-only entry (see [[Q.maxSf]]) against a dir
    * whose parsed SF exceeds its cap — an exact-O(N²) baseline reaching an
    * sf100z sweep is a run that never finishes, caught here in ms. */
  def assertScaleSafe(qs: Seq[Q], dir: String): Unit = {
    val sf = sfOf(dir)
    if (!sf.isNaN) {
      val over = qs.filter(q => sf > q.maxSf)
      require(over.isEmpty,
        s"queries capped below sf=$sf of $dir (driver-SF-only exact " +
          s"baselines/bounds — see Q.maxSf): ${over.map(_.name).mkString(", ")}")
    }
  }
}
