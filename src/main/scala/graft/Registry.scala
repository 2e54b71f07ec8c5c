package graft

/** Central capability registry: every operator family from SURVEY.md §2 that
  * is implemented registers exactly one (or more) [[Q]] here. SparkEntry's
  * driver contract (`queries` / `oracleSql`) is derived from this list, so a
  * query cannot exist without being visible to the correctness gate.
  */
object Registry {
  lazy val all: Seq[Q] =
    graft.queries.Relational.queries ++
      graft.queries.Scalars.queries ++
      graft.queries.Structured.queries ++
      graft.queries.SqlQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.JdbcQueries.queries ++
      graft.queries.Events.queries ++
      graft.queries.Partitioned.queries ++
      graft.queries.Incremental.queries ++
      graft.queries.Behavior.queries ++
      graft.queries.Formats.queries ++
      graft.queries.Graph.queries ++
      graft.queries.Audits.queries ++
      graft.queries.TopKQueries.queries ++
      graft.ext.TextQueries.queries ++
      graft.ext.DedupQueries.queries ++
      graft.ext.SimilarityQueries.queries ++
      graft.ext.MultimodalQueries.queries ++
      graft.ext.MediaSegQueries.queries ++
      graft.ext.CorpusQueries.queries ++
      graft.ext.QualityQueries.queries ++
      graft.ext.EmbedQueries.queries ++
      graft.ext.MonitorQueries.queries ++
      graft.ext.SketchQueries.queries ++
      graft.ext.SearchQueries.queries ++
      graft.ext.ClusterQueries.queries ++
      graft.ext.ProbeQueries.queries

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  lazy val headline: Seq[Q] = all.filter(_.headline)
}
