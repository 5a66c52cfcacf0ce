package graft.queries

/** All registered queries, keyed by name. */
object Registry {
  lazy val all: Seq[Q] =
    CoreSql.qs ++ TimeSeriesQueries.qs ++ PipelineQueries.qs ++ TqlQueries.qs ++
      MatchRecognizeQueries.qs ++ NanoQueries.qs ++ GeoQueries.qs ++
      StreamingQueries.qs ++ FuzzQueries.qs ++ TqlFuzz.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  lazy val benchQueries: Seq[Q] = all.filter(_.bench)
}
