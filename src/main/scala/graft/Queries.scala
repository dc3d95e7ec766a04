package graft

import graft.multimodal.Media
import graft.operators._

/** Central registry of the verified query surface (SURVEY.md §2 coverage +
  * the training-data-pipeline extensions). */
object Queries {
  val all: Seq[GraftQuery] =
    Relational.all ++
      TextAnalytics.all ++
      TfIdf.all ++
      Retrieval.all ++
      EventAnalytics.all ++
      Dedup.all ++
      Similarity.all ++
      Profiling.all ++
      Skew.all ++
      TemporalJoins.all ++
      PipelineOps.all ++
      CorpusQuality.all ++
      Clustering.all ++
      LexicalStats.all ++
      BehaviorAnalytics.all ++
      Graph.all ++
      Media.all

  val byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap
  require(byName.size == all.size, "duplicate query names")
}
