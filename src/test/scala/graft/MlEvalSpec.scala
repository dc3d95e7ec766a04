package graft

import graft.operators.MlEval
import org.apache.spark.sql.functions._

/** Unit pins for the ML-eval family: the OLS solver on a constructed
  * dataset with a KNOWN exact solution, the AUC midrank formula on planted
  * separable/random scores, and plan guards for the collapse-first shape. */
class MlEvalSpec extends SparkSpec {
  import spark.implicits._

  test("OLS recovers planted coefficients exactly on orthogonal residuals") {
    // y = 2 + 3q + 5d + e over the 4×4 (q, d) grid, each cell twice with
    // e = ±1: residuals are orthogonal to (1, q, d), so the OLS optimum IS
    // (2, 3, 5); every moment is a small exact integer, so the Cramer
    // ratios and rmse = sqrt(Σe²/n) = 1 come out bit-exact.
    val rows = for {
      q <- 1 to 4; d <- 1 to 4; e <- Seq(1, -1)
    } yield (q.toDouble, d.toDouble, 2.0 + 3 * q + 5 * d + e)
    val df = rows.toDF("l_quantity", "l_discount", "l_extendedprice")
    val out = MlEval.olsSolve(MlEval.olsFinish(MlEval.olsMomentsDec(df)))
      .as[(Long, Double, Double, Double, Double, Double)].collect().toSeq
    val (n, b0, b1, b2, r2, rmse) = out.head
    assert(n === 32L && b0 === 2.0 && b1 === 3.0 && b2 === 5.0)
    assert(rmse === 1.0)
    assert(r2 > 0.95 && r2 < 1.0) // sse = 32 > 0, sst >> sse
  }

  test("AUC is 1 on separable scores, 0.5 with fully tied scores") {
    def auc(rows: Seq[(Long, String, Double)]): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft-ml").toString
      rows.toDF("event_id", "event_type", "value")
        .withColumn("ts", timestamp_micros($"event_id" * 1000000L))
        .withColumn("user_id", $"event_id")
        .withColumn("props", lit("{}"))
        .write.parquet(s"$dir/events.parquet")
      Queries.byName("q_roc_auc").run(spark, dir)
        .select($"auc").as[Double].collect().head
    }
    // every purchase scored above every non-purchase → AUC = 1
    val sep = (1L to 20L).map(i =>
      (i, if (i <= 10) "view" else "purchase", i.toDouble))
    assert(auc(sep) === 1.0)
    // one fully tied score → midrank AUC = 0.5 exactly
    val tied = (1L to 20L).map(i =>
      (i, if (i % 2 == 0) "purchase" else "view", 7.0))
    assert(auc(tied) === 0.5)
  }

  test("calibration: ece equals the n-weighted mean per-bin gap") {
    val out = Queries.byName("q_calibration_bins")
      .run(spark, "/root/testdata/sf0.001")
      .select($"n", $"gap", $"ece").as[(Long, Double, Double)].collect()
    assert(out.nonEmpty)
    val eces = out.map(_._3).distinct
    assert(eces.length === 1) // one global ECE repeated per bin
    // reconstruction from the 6-dp-rounded per-bin gaps agrees to 6 dp of
    // rounding slack per bin
    val n = out.map(_._1).sum
    val approx = out.map(r => r._1 * r._2).sum / n
    assert(math.abs(approx - eces.head) < 1e-5)
  }

  test("plan guard: each query collapses the corpus in ONE aggregate pass") {
    // q_ols_fit: a single scan of lineitem feeding one partial+final
    // aggregate — no join, no window, no second corpus scan
    val ols = MlEval.qOlsFit.run(spark, "/root/testdata/sf0.001")
    val plan = ols.queryExecution.executedPlan.toString
    assert(plan.split("FileScan parquet").length - 1 === 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // q_calibration_bins: the unpartitioned ECE window is allowed ONLY
    // above the ten-row bin collapse, never over the corpus scan —
    // top-down plan order must be Window THEN the collapsing aggregate
    val p = Queries.byName("q_calibration_bins")
      .run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val winIdx = p.indexOf("Window")
    val aggIdx = p.indexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx >= 0 && winIdx < aggIdx,
      s"window must sit above the collapsing aggregate\n$p")
    assert(p.split("FileScan parquet").length - 1 === 1, p)
    // q_roc_auc: the persisted value-domain relation serves both
    // reductions — every consumer reads the cache (InMemoryTableScan
    // present; the scan-count heuristic is useless here because AQE
    // reprints the cached child plan inline), and the class-total join is
    // a broadcast, never a SortMergeJoin
    val roc = Queries.byName("q_roc_auc").run(spark, "/root/testdata/sf0.001")
    roc.collect() // materialize the persist so the reuse is in effect
    val rp = roc.queryExecution.executedPlan.toString
    assert(rp.contains("InMemoryTableScan"), rp)
    assert(!rp.contains("SortMergeJoin"), rp)
  }

  test("conformal: per-type coverage lands near 1 - alpha at sf0.01") {
    val rows = Queries.byName("q_conformal_interval")
      .run(spark, "/root/testdata/sf0.01")
      .select($"qhat", $"coverage").as[(Double, Double)].collect()
    assert(rows.length === 5)
    // split-conformal promise: coverage concentrates around 0.9; the
    // per-arm calibration sets are ~200 rows, so allow sampling slack
    assert(rows.forall { case (q, c) => q > 0 && c > 0.8 && c < 0.98 })
  }

  test("crossval: folds partition the corpus and share one pooled rmse") {
    val rows = Queries.byName("q_crossval_ols")
      .run(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0L until 5L))
    val total = rows.head._2 + rows.head._3 // n_train + n_test = corpus
    assert(rows.forall(r => r._2 + r._3 === total))
    assert(rows.map(_._3).sum === total) // test folds partition the corpus
    assert(rows.map(_._8).distinct.length === 1) // one pooled cv_rmse
    assert(rows.forall(r => r._7 > 0 && r._8 > 0))
  }

  test("feature importance: r2 decomposes as without + importance") {
    val rows = Queries.byName("q_feature_importance")
      .run(spark, "/root/testdata/sf0.001")
      .as[(String, Double, Double, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq === Seq("l_discount", "l_quantity"))
    rows.foreach { case (_, _, full, without, imp) =>
      assert(math.abs(full - (without + imp)) < 2e-6)
      assert(full >= without)
    }
  }

  test("logistic IRLS converges to the base-rate model on independent labels") {
    val r = Queries.byName("q_logistic_irls")
      .run(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    val (n, nPos, b0, b1, b2, ll) = r
    val rate = nPos.toDouble / n
    val h = -(rate * math.log(rate) + (1 - rate) * math.log(1 - rate))
    // label ~ independent of regressors: intercept near logit(rate),
    // slopes near zero, log-loss near the base-rate entropy (in-sample it
    // may dip a few 1e-6 below H — the 3 fitted params buy exactly that)
    assert(math.abs(b0 - math.log(rate / (1 - rate))) < 0.05)
    assert(math.abs(b1) < 0.01 && math.abs(b2) < 0.5)
    assert(ll >= h - 1e-3 && ll < h + 0.01)
  }

  test("ridge path: alpha 0 is exactly OLS; slopes shrink, rmse rises") {
    val path = Queries.byName("q_ridge_path")
      .run(spark, "/root/testdata/sf0.001")
      .as[(Double, Double, Double, Double, Double)].collect().sortBy(_._1)
    val ols = Queries.byName("q_ols_fit").run(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, Double, Double, Double, Double)].collect().head
    assert((path.head._2, path.head._3, path.head._4) ===
      ((ols._2, ols._3, ols._4)))
    assert(math.abs(path.head._5 - ols._6) < 1e-6)
    // |slopes| weakly decrease along the path, train rmse weakly rises
    path.sliding(2).foreach { case Array(a, b) =>
      assert(math.abs(b._3) <= math.abs(a._3) + 1e-9)
      assert(math.abs(b._4) <= math.abs(a._4) + 1e-9)
      assert(b._5 >= a._5 - 1e-9)
    }
  }

  test("brier decomposition: components bounded, residual is binning error") {
    val sf = "/root/testdata/sf0.001"
    val (n, brier, rel, res, unc, resid) =
      MlEval.qBrierDecomp.run(spark, sf)
        .as[(Long, Double, Double, Double, Double, Double)].head()
    assert(n > 0)
    // proper-score bounds: all components in [0, 1]; unc <= 1/4
    assert(brier >= 0 && brier <= 1 && rel >= 0 && res >= 0)
    assert(unc >= 0 && unc <= 0.25)
    // resolution cannot exceed uncertainty (Murphy); residual is the
    // within-bin variance the 3-term identity drops — small but >= 0
    assert(res <= unc + 1e-9)
    assert(resid >= -1e-6)
    // identity check: brier == rel - res + unc + resid by construction
    assert(math.abs(brier - (rel - res + unc + resid)) < 2e-6)
  }

  test("q_text_classifier separates a planted two-cluster corpus") {
    // hi docs: 40+i long non-stopword tokens (quality ≈ 1.88 > τ);
    // lo docs: 8+i%7 stopwords (quality ≈ 0.76 < τ). Lengths VARY inside
    // each class so the structural (1, xl, xa) Gramian is nonsingular and
    // the exact 3×3 block trains; content differs so the hashed-bucket
    // block separates too. The trained filter must be perfect here.
    val dir = java.nio.file.Files.createTempDirectory("graft-cls").toString
    val stops = Seq("the", "a", "is", "of", "and", "to", "in")
    val rows = (0 until 40).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      val text =
        if (i < 20)
          (0 until 40 + i).map(k => f"quality${(k + i) % 30}%02ditem")
            .mkString(" ")
        else
          (0 until 8 + i % 7).map(k => stops((k + i) % stops.length))
            .mkString(" ")
      (i.toLong, text, lang, "src", text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Queries.byName("q_text_classifier").run(spark, dir).collect()
    assert(out.map(_.getAs[String]("lang")).toSeq === Seq("en", "fr"))
    out.foreach { r =>
      assert(r.getAs[Long]("n") === 20)
      assert(r.getAs[Long]("n_pos") === 10)   // the label derivation
      assert(r.getAs[Long]("n_pred") === 10)  // the trained separation
      assert(r.getAs[Long]("tp") === 10)
      assert(r.getAs[Double]("prec") === 1.0)
      assert(r.getAs[Double]("rec") === 1.0)
    }
    // determinism: a second end-to-end train+score run is bit-identical —
    // through the non-memoized path, so a real retrain happens (the query
    // surface memoizes per (session, dir) to share one fit)
    val again = MlEval.textClassifierReport(
      Tables.spread(Tables.documents(spark, dir))).collect()
    assert(again.toSeq === out.toSeq)
    // the SAME trained model applied as a mixture filter: perfect
    // separation keeps exactly the 10 hi docs per (lang, source) cell,
    // and everything it keeps is label-positive
    val imp = Queries.byName("q_filter_impact").run(spark, dir).collect()
    assert(imp.map(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
      .toSeq === Seq(("en", "src"), ("fr", "src")))
    imp.foreach { r =>
      assert(r.getAs[Long]("n_docs") === 20)
      assert(r.getAs[Long]("n_kept") === 10)
      assert(r.getAs[Double]("keep_rate") === 0.5)
      assert(r.getAs[Double]("kept_pos_rate") === 1.0)
      // the kept tokens are the hi docs' (longer) halves: more than half
      // of the token mass survives
      assert(r.getAs[Double]("token_keep_rate") > 0.5)
    }
  }

  test("q_text_classifier_v2: bigrams are a non-vacuous leg") {
    // the planted two-cluster corpus with DIRECTED pair markers — "alpha
    // beta" rides only hi docs, "beta alpha" only lo docs (md5 buckets 35
    // vs 33, distinct mod 64) — plus two probe docs with IDENTICAL
    // unigram multisets (6×alpha + 6×beta) differing only in bigram
    // direction. The unigram model MUST score the probes identically
    // (same feature vector, bit-for-bit); the bigram model must not —
    // the Flesch lesson's non-vacuity pin.
    val dir = java.nio.file.Files.createTempDirectory("graft-cls2").toString
    val stops = Seq("the", "a", "is", "of", "and", "to", "in")
    val probeA = Seq.fill(6)("alpha beta").mkString(" ")
    val probeB = Seq.fill(6)("beta alpha").mkString(" ")
    val rows = (0 until 40).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      val text =
        if (i < 20)
          ((0 until 40 + i).map(k => f"quality${(k + i) % 30}%02ditem") ++
            Seq.fill(4)("alpha beta")).mkString(" ")
        else
          ((0 until 8 + i % 7).map(k => stops((k + i) % stops.length)) ++
            Seq.fill(4)("beta alpha")).mkString(" ")
      (i.toLong, text, lang, "src", text.length.toLong)
    } ++ Seq(
      (100L, probeA, "en", "src", probeA.length.toLong),
      (101L, probeB, "en", "src", probeB.length.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val docs = Tables.spread(Tables.documents(spark, dir))
    val (c1, b1) = MlEval.clsFit(docs)
    val (c2, b2) = MlEval.clsFit2(docs)
    // bigrams change the fitted hash block
    assert(!java.util.Arrays.equals(b1, b2))
    def etas(prep: org.apache.spark.sql.DataFrame,
        c: (Double, Double, Double), b: Array[Double]): Map[Long, Double] =
      MlEval.clsScored(prep, c, b).filter($"doc_id" >= 100L)
        .select($"doc_id", $"eta").as[(Long, Double)].collect().toMap
    val e1 = etas(MlEval.clsDocs(docs), c1, b1)
    val e2 = etas(MlEval.clsDocs2(docs), c2, b2)
    assert(e1(100L) === e1(101L)) // unigrams cannot see direction
    assert(e2(100L) !== e2(101L)) // bigrams can
    // end-to-end: per-lang delta column populated, schema as declared
    val out = Queries.byName("q_text_classifier_v2").run(spark, dir)
    assert(out.columns.toSeq === Seq("lang", "n", "n_pos", "n_pred", "tp",
      "prec", "rec", "log_loss", "delta_log_loss"))
    val rowsOut = out.collect()
    assert(rowsOut.map(_.getAs[String]("lang")).toSeq === Seq("en", "fr"))
    rowsOut.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("delta_log_loss")))
      assert(!r.isNullAt(r.fieldIndex("log_loss")))
    }
  }

  test("q_filter_threshold_sweep: monotone retention over the grid") {
    val dir = java.nio.file.Files.createTempDirectory("graft-thr").toString
    val stops = Seq("the", "a", "is", "of", "and", "to", "in")
    val rows = (0 until 40).map { i =>
      val text =
        if (i < 20)
          (0 until 40 + i).map(k => f"quality${(k + i) % 30}%02ditem")
            .mkString(" ")
        else
          (0 until 8 + i % 7).map(k => stops((k + i) % stops.length))
            .mkString(" ")
      (i.toLong, text, if (i % 2 == 0) "en" else "fr", "src",
        text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Queries.byName("q_filter_threshold_sweep").run(spark, dir)
      .collect()
    assert(out.map(_.getAs[Double]("thr")).toSeq ===
      (1 to 9).map(_ / 10.0))
    // raising the threshold can only shrink the kept set (docs AND tokens)
    val kept = out.map(_.getAs[Long]("n_kept")).toSeq
    val keptTok = out.map(_.getAs[Double]("token_keep_rate")).toSeq
    assert(kept === kept.sorted.reverse)
    assert(keptTok === keptTok.sorted.reverse)
    // global columns constant across the grid; rates bounded
    assert(out.map(_.getAs[Long]("n_docs")).toSet === Set(40L))
    assert(out.map(_.getAs[Long]("n_pos")).toSet === Set(20L))
    out.foreach { r =>
      assert(r.getAs[Long]("kept_pos") <= r.getAs[Long]("n_kept"))
      val kr = r.getAs[Double]("keep_rate")
      assert(kr >= 0.0 && kr <= 1.0)
    }
    // the planted separation holds at the middle of the grid: at t=0.5
    // the filter keeps exactly the 20 hi docs, all label-positive
    val mid = out(4)
    assert(mid.getAs[Long]("n_kept") === 20L)
    assert(mid.getAs[Double]("prec") === 1.0)
    assert(mid.getAs[Double]("rec") === 1.0)
  }

  test("q_classifier_calibration: bin identities and the ECE mass balance") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cal").toString
    val stops = Seq("the", "a", "is", "of", "and", "to", "in")
    val rows = (0 until 40).map { i =>
      val text =
        if (i < 20)
          (0 until 40 + i).map(k => f"quality${(k + i) % 30}%02ditem")
            .mkString(" ")
        else
          (0 until 8 + i % 7).map(k => stops((k + i) % stops.length))
            .mkString(" ")
      (i.toLong, text, if (i % 2 == 0) "en" else "fr", "src",
        text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = Queries.byName("q_classifier_calibration").run(spark, dir)
      .collect()
    assert(out.nonEmpty && out.length <= 10)
    assert(out.map(_.getAs[Long]("n")).sum === 40L)
    assert(out.map(_.getAs[Long]("n_pos")).sum === 20L)
    val ece = out.map(_.getAs[Double]("ece")).distinct
    assert(ece.length === 1) // global column constant across bins
    out.foreach { r =>
      val mp = r.getAs[Double]("mean_pred")
      val pr = r.getAs[Double]("pos_rate")
      val gap = r.getAs[Double]("gap")
      assert(mp >= 0.0 && mp <= 1.0)
      // per-bin identity up to the two independent 6-dp roundings
      assert(math.abs(gap - math.abs(mp - pr)) < 2e-6)
    }
    // ECE is the n-weighted mean per-bin gap (up to rounding)
    val n = out.map(_.getAs[Long]("n").toDouble)
    val gaps = out.map(_.getAs[Double]("gap"))
    val expected = n.zip(gaps).map { case (a, b) => a * b }.sum / n.sum
    assert(math.abs(ece.head - expected) < 2e-6)
  }

  test("rocReport degrades to null auc/gini/ks on a one-class value log") {
    // a delta log that so far holds only negatives — the early-StreamRoc
    // shape the n_pos/n_neg guards exist for: must yield a null readout
    // row, never a division error or NaN
    val vc = Seq((1.0, 0L, 5L), (2.0, 0L, 3L)).toDF("v", "p", "f")
    val row = MlEval.rocReport(vc).collect().head
    assert(row.getLong(0) === 0L && row.getLong(1) === 8L)
    assert(row.isNullAt(2) && row.isNullAt(3) && row.isNullAt(4))
  }

  test("liftReport degrades to null lift/gain with zero positives") {
    val vc = Seq((1.0, 0L, 4L), (2.0, 0L, 6L)).toDF("v", "p", "f")
    val rows = MlEval.liftReport(vc).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("resp_rate") === 0.0)
      assert(r.isNullAt(r.fieldIndex("lift")))
      assert(r.isNullAt(r.fieldIndex("cum_gain")))
    }
    // and a fully empty log yields an empty gains table, not an error
    assert(MlEval.liftReport(vc.limit(0)).collect().isEmpty)
  }

  test("q_corpus_prep_v2: trained vs heuristic gate genuinely disagree on real data") {
    val dir = "/root/testdata/sf0.001"
    val out = Queries.byName("q_corpus_prep_v2").run(spark, dir).collect()
    assert(out.nonEmpty)
    def tot(f: String) = out.map(_.getAs[Long](f)).sum
    // non-vacuity on REAL data (the q_hard_negatives lesson): the learned
    // gate keeps documents, the heuristic gate keeps documents, and they
    // DISAGREE somewhere -- otherwise the v2 readout is the v1 readout
    assert(tot("kept_model") > 0 && tot("kept_heur") > 0)
    assert(tot("n_disagree") > 0)
    out.foreach { r =>
      val nd = r.getAs[Long]("n_disagree")
      val d = r.getAs[Long]("delta_docs")
      // delta = model-only - heur-only, disagree = model-only + heur-only
      assert(math.abs(d) <= nd && (nd - math.abs(d)) % 2 === 0L)
      assert(r.getAs[Long]("kept_model") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_heur") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tok_model") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("tok_heur") <= r.getAs[Long]("n_tokens"))
    }
    // pin a CONCRETE disagreeing document: rebuild the sampled-keeper
    // cascade, score under a fresh fit (the session memo holds the same
    // fit), and recount that document's (lang, source) cell
    val docs = Tables.spread(Tables.documents(spark, dir))
    val (coef, beta) = MlEval.clsFit(docs)
    val rates = graft.operators.PipelineOps.SampleRates
      .map { case (l, r) => (l, (r * 4294967296L).toLong) }.toDF("lang", "thr")
    val cascade = docs
      .withColumn("keep_id", min($"doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5($"text"))))
      .filter($"doc_id" === $"keep_id")
      .join(broadcast(rates), Seq("lang"))
      .filter(expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)")
        < $"thr")
      .select($"doc_id", $"lang", $"source", $"text")
    val dis = MlEval.clsScored(MlEval.clsDocs(cascade), coef, beta)
      .filter(($"eta" > 0.0) =!= ($"quality" >= 1.5))
      .select($"doc_id", $"lang", $"source")
      .as[(Long, String, String)].collect()
    assert(dis.nonEmpty)
    val (_, dl, ds) = dis.head
    val cell = out.find(r =>
      r.getString(0) == dl && r.getString(1) == ds).get
    assert(cell.getAs[Long]("n_disagree")
      === dis.count(t => t._2 == dl && t._3 == ds).toLong)
  }

  test("LOO influence ranks a planted outlier first and respects trace(H)=p") {
    // clean grid exactly on y = 2 + 3q + 5d, plus ONE gross outlier at an
    // interior design point: the outlier carries essentially all of the
    // SSE, so its Cook's distance dominates every clean row's.
    val clean = for { q <- 1 to 4; d <- 1 to 4 } yield
      (100L + q * 10 + d, 1, q.toDouble, d.toDouble, 2.0 + 3 * q + 5 * d)
    val rows = clean :+ ((999L, 1, 2.0, 2.0, 2.0 + 6 + 10 + 400.0))
    val df = rows.toDF("l_orderkey", "l_linenumber", "l_quantity",
      "l_discount", "l_extendedprice")
    val out = MlEval.looInfluence(df, 17).collect()
    assert(out.length === 17)
    assert(out.head.getAs[Long]("l_orderkey") === 999L)
    // the outlier's residual is by far the largest in magnitude
    assert(math.abs(out.head.getAs[Double]("resid")) >
      out.tail.map(r => math.abs(r.getAs[Double]("resid"))).max * 5)
    // hat-matrix trace: Σ hᵢ = p = 3 (6-dp rounding per row → loose tol)
    val traceH = out.map(_.getAs[Double]("leverage")).sum
    assert(math.abs(traceH - 3.0) < 1e-4, s"trace(H) = $traceH")
    // every leverage sits in (0, 1) — the textbook bounds for a design
    // with an intercept and no duplicated-row degeneracy at p < n
    assert(out.forall { r =>
      val h = r.getAs[Double]("leverage"); h > 0.0 && h < 1.0
    })
    // Cook's D is non-negative everywhere (rounded)
    assert(out.forall(_.getAs[Double]("cooks_d") >= 0.0))
  }

  test("Bradley-Terry recovers a planted dominance order with exact " +
      "hand-counted wins; ties drop; strengths normalize") {
    // a's values beat b's except one 2-dp tie (dropped); c loses every
    // decided comparison → wins: a>b 5 (1 tie), a>c 6, b>c 4, W = (11,4,0)
    val scored = Seq(
      ("a", 0.9), ("a", 0.8), ("a", 0.9),
      ("b", 0.5), ("b", 0.8),
      ("c", 0.1), ("c", 0.2)).toDF("source", "q")
    val out = MlEval.bradleyTerryOf(scored).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    val byS = out.map(r => r.getString(0) ->
      (r.getAs[Long]("n_games"), r.getAs[Long]("n_wins"),
        r.getAs[Double]("strength"))).toMap
    assert(byS("a")._1 === 11L && byS("a")._2 === 11L)
    assert(byS("b")._1 === 9L && byS("b")._2 === 4L)
    assert(byS("c")._1 === 10L && byS("c")._2 === 0L)
    // zero wins → zero strength, exactly; the rest sum to one (per-row
    // 6-dp rounding → loose tol)
    assert(byS("c")._3 === 0.0)
    assert(math.abs(out.map(_.getAs[Double]("strength")).sum - 1.0) < 1e-5)
    assert(byS("a")._3 > byS("b")._3)
    // a undefeated among decided comparisons vs b: the fitted model must
    // put P(a beats b) = wa/(wa+wb) above 0.9
    assert(byS("a")._3 / (byS("a")._3 + byS("b")._3) > 0.9)
  }

  test("q_bradley_terry on sf0.001: one row per source, rank is a " +
      "permutation, global win accounting balances") {
    val out = MlEval.qBradleyTerry.run(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 20)
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq
      === (1L to 20L).toSeq)
    // Σ_i games_i counts every decided pair twice, Σ_i wins_i once
    assert(out.map(_.getAs[Long]("n_games")).sum
      === 2L * out.map(_.getAs[Long]("n_wins")).sum)
    assert(math.abs(out.map(_.getAs[Double]("strength")).sum - 1.0) < 1e-4)
    // output is ordered by rank = strength desc
    assert(out.map(_.getAs[Double]("strength")).toSeq
      === out.map(_.getAs[Double]("strength")).sortBy(-_).toSeq)
  }
}
