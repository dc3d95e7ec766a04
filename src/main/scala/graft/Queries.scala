package graft

import graft.multimodal.Media
import graft.operators._

/** Central registry of the verified query surface (SURVEY.md §2 coverage +
  * the training-data-pipeline extensions). */
object Queries {
  /** Queries grouped by contributing family (short keys — they ride in
    * Bench's one-line family-subtotal summary, which must stay ≤300 chars
    * so a hard tail truncation of the consumer's window still preserves
    * family-level forensics). */
  val families: Seq[(String, Seq[GraftQuery])] = Seq(
    "rel" -> Relational.all,
    "text" -> TextAnalytics.all,
    "tfi" -> TfIdf.all,
    "rt" -> Retrieval.all,
    "evt" -> EventAnalytics.all,
    "dd" -> Dedup.all,
    "sim" -> Similarity.all,
    "prof" -> Profiling.all,
    "skew" -> Skew.all,
    "tj" -> TemporalJoins.all,
    "pipe" -> PipelineOps.all,
    "cq" -> CorpusQuality.all,
    "cl" -> Clustering.all,
    "lex" -> LexicalStats.all,
    "bhv" -> BehaviorAnalytics.all,
    "gr" -> Graph.all,
    "gov" -> Governance.all,
    "ml" -> MlEval.all,
    "med" -> Media.all)

  val all: Seq[GraftQuery] = families.flatMap(_._2)

  val byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap
  require(byName.size == all.size, "duplicate query names")
}
