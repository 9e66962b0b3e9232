package graft

/** Single source of truth: every declared query (SURVEY §2.12 + extensions)
  * with its oracle. SparkEntry/Verify/Bench all derive from this map.
  */
object Registry {
  val all: Map[String, QueryDef] =
    queries.RelationalCore.defs ++
    queries.RelationalAgg.defs ++
    queries.RelationalPipeline.defs ++
    queries.LlmSimilarity.defs ++
    queries.LlmDedup.defs ++
    queries.LlmText.defs ++
    queries.Surface.defs ++
    queries.Auth.defs ++
    queries.StreamingQueries.defs ++
    queries.AsOf.defs ++
    queries.Temporal.defs ++
    queries.Profiling.defs ++
    queries.SemDedup.defs ++
    queries.Mixing.defs ++
    queries.Graph.defs

  def headline: Map[String, QueryDef] = all.filter(_._2.headline)
}
