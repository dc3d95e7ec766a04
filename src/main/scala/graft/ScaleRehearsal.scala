package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the pair-join dedup families (dev harness, invoked
  * via `Prof -scale [N] [baseDir]`): replicates `documents` and
  * `embeddings` N× with salted ids (text/vectors unchanged — the
  * adversarial everything-is-a-duplicate corpus, the worst case a dedup
  * pipeline can meet at a scale-up) and measures, at 1× and N×, each
  * family's
  *   - candidate-GENERATION volume (posting rows entering the pair join),
  *   - candidate-pair count (pair-join output before verification),
  *   - full-query wall time.
  *
  * Because candidate generation is purely text/vector-derived, exact
  * replication obeys closed-form growth laws the measurements (and
  * ScaleLawSpec, on the same shared relations) check against:
  *   postings(N·corpus) = N · postings(corpus)                    [linear]
  *   pairs(N·corpus)    = N² · pairs(corpus) + C(N,2) · docs⁺     [bounded]
  * where docs⁺ counts documents with ≥1 posting (each one's N replicas
  * pair among themselves). A family whose measured growth exceeds its law
  * has id-dependent or unbounded candidate generation — the regression
  * this rehearsal exists to catch before a real 10× corpus does. */
object ScaleRehearsal {

  /** Replica id offset — far above any real doc_id/vec_id. A multiple of 3
    * so id-derived modality (`kind = media_id % 3`, part of the media
    * pHash family's bucket key) is replica-invariant: the growth laws
    * assume candidate generation is invariant under replication, and kind
    * is the one id-derived feature in any family's bucket key. */
  val SaltStride: Long = 3L << 40

  /** Write the N×-replicated tables under `out` (same file layout the
    * Tables loaders read). `events` salts user_id (not event_id): the
    * basket-join family keys on (user, day), so user-salted replication
    * multiplies BASKETS by N — the growth a real user-base scale-up
    * produces — while timestamps/types stay untouched. */
  def build(spark: SparkSession, base: String, out: String, n: Int): Unit = {
    def replicate(name: String, idCol: String): Unit = {
      val t = spark.read.parquet(s"$base/$name.parquet")
      (0 until n).map(r => t.withColumn(idCol, col(idCol) + lit(r * SaltStride)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    replicate("documents", "doc_id")
    replicate("embeddings", "vec_id")
    replicate("events", "user_id")
  }

  /** The banded pair-join law: replicas pair across replica pairs (N²·
    * cand) plus each posting-bearing doc's replicas pair among themselves
    * (C(N,2)·docs⁺). Default for the LSH-shaped families. */
  val quadraticLaw: (Int, Long, Long) => Long = (n, cand1, docsPlus) =>
    n.toLong * n * cand1 + n.toLong * (n - 1) / 2 * docsPlus

  final case class Fam(
      name: String,
      postings: (SparkSession, String) => Long,
      docsWithPostings: (SparkSession, String) => Long,
      candidates: (SparkSession, String) => Long,
      query: GraftQuery,
      /** Expected candN from (n, cand1, docsPlus) — quadratic for banded
        * bucket joins; the round-11 families (SNM window, within-basket,
        * within-doc) are LINEAR by construction and override this. */
      lawAtN: (Int, Long, Long) => Long = quadraticLaw)

  /** The text pair-join families under rehearsal (incl. the unfiltered
    * containment variant) plus the media pHash family and SemDeDup.
    * LSH/ngram/prefix/winnow/phash count their shared posting/candidate
    * relations (the SAME definitions the queries execute — no drift);
    * SemDeDup counts assignment rows and Σ C(cell,2) via the shared cell
    * audit. */
  def families: Seq[Fam] = Seq(
    Fam("lsh",
      (s, d) => Dedup.minhashPostings(Dedup.docShingles(s, d, 2)).count(),
      (s, d) => Dedup.minhashPostings(Dedup.docShingles(s, d, 2))
        .select("doc_id").distinct().count(),
      (s, d) => Dedup.minhashCandidates(Dedup.docShingles(s, d, 2)).count(),
      Dedup.qDedupMinhash),
    Fam("ngram",
      (s, d) => Dedup.ngramPostings(s, d).count(),
      (s, d) => Dedup.ngramPostings(s, d).select("doc_id").distinct().count(),
      (s, d) => Dedup.ngramCandidates(s, d).count(),
      Dedup.qNgramJaccard),
    Fam("prefix",
      (s, d) => Dedup.prefixPostings(s, d).count(),
      (s, d) => Dedup.prefixPostings(s, d).select("doc_id").distinct().count(),
      (s, d) => Dedup.prefixCandidates(s, d).count(),
      Dedup.qJaccardPrefix),
    Fam("winnow",
      (s, d) => Dedup.winnowPostings(s, d).count(),
      (s, d) => Dedup.winnowPostings(s, d).select("doc_id").distinct().count(),
      (s, d) => Dedup.winnowCandidates(s, d).count(),
      Dedup.qWinnowOverlap),
    Fam("phash",
      (s, d) => graft.multimodal.Media.phashPostings(s, d).count(),
      (s, d) => graft.multimodal.Media.phashPostings(s, d)
        .select("media_id").distinct().count(),
      (s, d) => graft.multimodal.Media.phashCandidates(s, d).count(),
      graft.multimodal.Media.qMediaPhashDedup),
    Fam("contain",
      (s, d) => Dedup.ngramPostings(s, d).count(),
      (s, d) => Dedup.ngramPostings(s, d).select("doc_id").distinct().count(),
      (s, d) => Dedup.containmentCandidates(s, d).count(),
      Dedup.qContainmentDedup),
    Fam("semdedup",
      (s, d) => Tables.embeddings(s, d).count(),
      (s, d) => Tables.embeddings(s, d).count(),
      (s, d) => Similarity.qSemdedupCellAudit.run(s, d)
        .select("cell_pairs").head().getLong(0),
      Similarity.qSemanticDedup),
    // ---- round-11 join families: candidate volume LINEAR by construction
    // (sorted-window / within-basket / within-doc pairing never crosses
    // the replica boundary the way a shared bucket does) — the rehearsal
    // verifies the measured 10× volume AND wall time sit on those laws
    Fam("snm",
      // postings = ranked documents entering the sorted-neighborhood pass
      (s, d) => Dedup.snmRanked(s, d).count(),
      (s, d) => Dedup.snmRanked(s, d).count(),
      (s, d) => Dedup.snmCandidates(s, d).count(),
      Dedup.qSnmDedup,
      // every rank pairs with its ≤W−1 successors over m = N·docs⁺ ranks
      (n, _, docsPlus) => (Dedup.SnmWindow - 1).toLong * n * docsPlus -
        Dedup.SnmWindow.toLong * (Dedup.SnmWindow - 1) / 2),
    Fam("linkage",
      // Fellegi–Sunter rides the SAME SNM candidate relation; what this
      // row adds is the WALL TIME of the scoring tail (attribute joins +
      // shingle verify + EM-free scoring) at 10× pair volume
      (s, d) => Dedup.snmRanked(s, d).count(),
      (s, d) => Dedup.snmRanked(s, d).count(),
      (s, d) => Dedup.snmCandidates(s, d).count(),
      Dedup.qRecordLinkage,
      (n, _, docsPlus) => (Dedup.SnmWindow - 1).toLong * n * docsPlus -
        Dedup.SnmWindow.toLong * (Dedup.SnmWindow - 1) / 2),
    Fam("assoc",
      // postings = distinct (user, day, type) memberships; docs⁺ stands
      // in for baskets; candidates = within-basket pair stream — all
      // linear in baskets under user-salted replication
      (s, d) => graft.operators.BehaviorAnalytics
        .assocBaskets(Tables.events(s, d)).count(),
      (s, d) => graft.operators.BehaviorAnalytics
        .assocBaskets(Tables.events(s, d))
        .select("user_id", "d").distinct().count(),
      (s, d) => graft.operators.BehaviorAnalytics.assocPairRows(
        graft.operators.BehaviorAnalytics.assocBaskets(Tables.events(s, d)))
        .count(),
      graft.operators.BehaviorAnalytics.qAssocRules,
      (n, cand1, _) => n.toLong * cand1),
    Fam("pmi",
      // postings/candidates from the shared df-capped pair stream; the
      // median df-cap is replication-invariant (all dfs scale ×N, so the
      // kept vocabulary half is identical), hence exact linearity
      (s, d) => graft.operators.LexicalStats.cooccurKept(s, d).count(),
      (s, d) => Tables.documents(s, d).count(),
      (s, d) => graft.operators.LexicalStats.cooccurPairRows(s, d).count(),
      graft.operators.LexicalStats.qCooccurPmi,
      (n, cand1, _) => n.toLong * cand1))

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  final case class Row(fam: String, post1: Long, postN: Long, cand1: Long,
      candN: Long, docsPlus: Long, law: Long, t1: Double, tN: Double)

  def measure(spark: SparkSession, base: String, scaled: String, n: Int,
      withTimes: Boolean = true): Seq[Row] =
    families.map { fam =>
      def fresh[T](f: => T): T = { val r = f; spark.catalog.clearCache(); r }
      val post1 = fresh(fam.postings(spark, base))
      val postN = fresh(fam.postings(spark, scaled))
      val docsPlus = fresh(fam.docsWithPostings(spark, base))
      val cand1 = fresh(fam.candidates(spark, base))
      val candN = fresh(fam.candidates(spark, scaled))
      val law = fam.lawAtN(n, cand1, docsPlus)
      val t1 = if (withTimes) fresh(timed(
        fam.query.run(spark, base).write.format("noop").mode("overwrite").save()))
      else 0.0
      val tN = if (withTimes) fresh(timed(
        fam.query.run(spark, scaled).write.format("noop").mode("overwrite").save()))
      else 0.0
      Row(fam.name, post1, postN, cand1, candN, docsPlus, law, t1, tN)
    }

  def run(spark: SparkSession, base: String, scaled: String, n: Int): Unit = {
    println(s"SCALE rehearsal: base=$base vs ${n}x salted exact replicas")
    println(f"${"family"}%-9s${"post_1x"}%10s${"post_Nx"}%11s${"cand_1x"}%10s" +
      f"${"cand_Nx"}%12s${"law_Nx"}%12s${"t_1x"}%8s${"t_Nx"}%8s")
    for (r <- measure(spark, base, scaled, n)) {
      println(f"${r.fam}%-9s${r.post1}%10d${r.postN}%11d${r.cand1}%10d" +
        f"${r.candN}%12d${r.law}%12d${r.t1}%8.2f${r.tN}%8.2f")
    }
  }
}
