package graft.operators

import graft.{GraftQuery, Tables}
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for a training-data pipeline, over `documents`:
  *
  *  - exact dedup (hash group-by on the full text);
  *  - MinHash + LSH banding near-dup (shingle → minhash signature → banded
  *    bucket join → exact Jaccard verify) — the scalable path: candidate
  *    generation never compares all pairs, only docs sharing an LSH bucket;
  *  - SimHash (tf-weighted bitwise signature, banded hamming join);
  *  - n-gram Jaccard (exact, candidates pruned by the shared-shingle join).
  *
  * All hashing is md5-based: Spark's `md5` and DuckDB's `md5` agree
  * byte-for-byte, which makes every one of these sketches oracle-checkable —
  * no engine-private hash (xxhash/murmur) appears in the verified surface.
  *
  * The driver corpus plants 25 near-duplicate pairs (documents containing
  * the marker token "dup"); 2-shingle Jaccard ≥ 0.6 isolates exactly those.
  * Scale note: at 100 TB the only all-pairs stage here would be the Jaccard
  * verify, and it only ever sees LSH-candidate pairs (O(n) with bounded
  * bucket sizes after the common-shingle prune), not O(n²).
  */
object Dedup {

  val MinHashK = 12        // signature length
  val BandRows = 2         // rows per LSH band => 6 bands
  val JaccardThreshold = 0.6

  /** Exact duplicate groups: one keeper per distinct text. */
  val qDedupExact = GraftQuery(
    "q_dedup_exact",
    (spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .groupBy(md5($"text").as("fp"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select($"keep_id", $"n_copies", $"fp")
        .orderBy($"keep_id")
    },
    Some("""
      SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS fp
      FROM documents
      GROUP BY md5(text)
      ORDER BY keep_id""")
  )

  /** Distinct 2-gram shingles per document (word bigrams). */
  private def shingles(spark: SparkSession, dir: String, n: Int): DataFrame = {
    import spark.implicits._
    val toks = Text.tokens($"text")
    val sh = array_distinct(
      if (n == 2)
        zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat_ws(" ", a, b))
      else
        zip_with(
          zip_with(slice(toks, lit(1), size(toks) - 2), slice(toks, lit(2), size(toks) - 2),
            (a, b) => concat_ws(" ", a, b)),
          slice(toks, lit(3), size(toks) - 2),
          (ab, c) => concat_ws(" ", ab, c)))
    Tables.documents(spark, dir)
      .select($"doc_id", explode(sh).as("shingle"))
  }

  /** DuckDB twin of [[shingles]] (list comprehension over split tokens). */
  private def shinglesSql(n: Int): String =
    if (n == 2)
      """SELECT doc_id, unnest(list_distinct(
           [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))])) AS shingle
         FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)"""
    else
      """SELECT doc_id, unnest(list_distinct(
           [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws)-1)])) AS shingle
         FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)"""

  /** MinHash + LSH banding + exact Jaccard verification.
    *
    * Signature h_i(doc) = min over shingles of md5(i || ':' || shingle);
    * band key = concat of the BandRows signature values; candidate pairs =
    * docs sharing any band key; verified Jaccard from the true shingle sets.
    */
  val qDedupMinhash = GraftQuery(
    "q_dedup_minhash",
    (spark, dir) => {
      import spark.implicits._
      val sh = shingles(spark, dir, 2).cache()
      // k minhash values per doc: explode hash index 0..k-1
      val hashed = sh
        .crossJoin(spark.range(MinHashK).toDF("h"))
        .select($"doc_id", $"h",
          md5(concat($"h".cast(StringType), lit(":"), $"shingle")).as("hv"))
        .groupBy($"doc_id", $"h").agg(min($"hv").as("mh"))
      val bands = hashed
        .withColumn("band", expr(s"h div $BandRows"))
        .groupBy($"doc_id", $"band")
        .agg(concat_ws("|", sort_array(collect_list(struct($"h", $"mh"))).getField("mh")).as("key"))
      val cand = bands.as("a").join(bands.as("b"),
          $"a.band" === $"b.band" && $"a.key" === $"b.key" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"))
        .distinct()
      val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("ns"))
      val inter = cand
        .join(sh.as("sa"), $"ia" === $"sa.doc_id")
        .join(sh.as("sb"), $"ib" === $"sb.doc_id" && $"sa.shingle" === $"sb.shingle")
        .groupBy($"ia", $"ib").agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.as("na"), $"ia" === $"na.doc_id")
        .join(sizes.as("nb"), $"ib" === $"nb.doc_id")
        .select($"ia", $"ib",
          round($"inter" / ($"na.ns" + $"nb.ns" - $"inter"), 6).as("jaccard"))
        .filter($"jaccard" >= JaccardThreshold)
        .orderBy($"ia", $"ib")
    },
    Some(s"""
      WITH sh AS (${shinglesSql(2)}),
      hashed AS (
        SELECT doc_id, h, min(md5(h || ':' || shingle)) AS mh
        FROM sh CROSS JOIN (SELECT unnest(range($MinHashK)) AS h)
        GROUP BY doc_id, h),
      bands AS (
        SELECT doc_id, h // $BandRows AS band,
          string_agg(mh, '|' ORDER BY h) AS key
        FROM hashed GROUP BY doc_id, h // $BandRows),
      cand AS (
        SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
      inter AS (
        SELECT ia, ib, count(*) AS inter
        FROM cand
        JOIN sh sa ON ia = sa.doc_id
        JOIN sh sb ON ib = sb.doc_id AND sa.shingle = sb.shingle
        GROUP BY ia, ib)
      SELECT ia, ib,
        round(inter * 1.0 / (na.ns + nb.ns - inter), 6) AS jaccard
      FROM inter
      JOIN sizes na ON ia = na.doc_id
      JOIN sizes nb ON ib = nb.doc_id
      WHERE round(inter * 1.0 / (na.ns + nb.ns - inter), 6) >= $JaccardThreshold
      ORDER BY ia, ib""")
  )

  /** SimHash: 32-bit tf-weighted signature; banded join (4 bands × 8 bits)
    * guarantees recall for hamming distance ≤ 3 by pigeonhole. */
  val qDedupSimhash = GraftQuery(
    "q_dedup_simhash",
    (spark, dir) => {
      import spark.implicits._
      val tf = Tables.documents(spark, dir)
        .select($"doc_id", explode(Text.tokens($"text")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        .withColumn("hv", expr("cast(conv(substr(md5(term), 1, 8), 16, 10) as bigint)"))
      val bits = tf
        .crossJoin(spark.range(32).toDF("b"))
        .groupBy($"doc_id", $"b")
        .agg(sum($"tf" * (expr("(hv >> cast(b as int)) & 1") * lit(2L) - lit(1L))).as("s"))
      val sig = bits
        .groupBy($"doc_id")
        .agg(sum(when($"s" >= 0, expr("shiftleft(cast(1 as bigint), cast(b as int))"))
          .otherwise(0L)).as("simhash"))
      val banded = sig.select($"doc_id", $"simhash",
          explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bkey", expr("(simhash >> (band * 8)) & 255"))
      banded.as("a").join(banded.as("b"),
          $"a.band" === $"b.band" && $"a.bkey" === $"b.bkey" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
          expr("cast(bit_count(a.simhash ^ b.simhash) as bigint)").as("hamming"))
        .distinct()
        .filter($"hamming" <= 3)
        .orderBy($"ia", $"ib")
    },
    Some("""
      WITH tf AS (
        SELECT doc_id, term, count(*) AS tf,
          CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS hv
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY doc_id, term),
      bits AS (
        SELECT doc_id, b, sum(tf * (((hv >> b) & 1) * 2 - 1)) AS s
        FROM tf CROSS JOIN (SELECT unnest(range(32)) AS b)
        GROUP BY doc_id, b),
      sig AS (
        SELECT doc_id,
          sum(CASE WHEN s >= 0 THEN 1::BIGINT << b ELSE 0 END) AS simhash
        FROM bits GROUP BY doc_id),
      banded AS (
        SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS bkey
        FROM sig CROSS JOIN (SELECT unnest(range(4)) AS band)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib,
          bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
      SELECT ia, ib, hamming FROM pairs
      WHERE hamming <= 3
      ORDER BY ia, ib""")
  )

  /** Exact n-gram (3-shingle) Jaccard near-dup: candidates from the shared-
    * shingle join (never all pairs), exact similarity from true set sizes. */
  val qNgramJaccard = GraftQuery(
    "q_ngram_jaccard",
    (spark, dir) => {
      import spark.implicits._
      val sh = shingles(spark, dir, 3).cache()
      val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("ns"))
      val inter = sh.as("a").join(sh.as("b"),
          $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("ia"), $"b.doc_id".as("ib"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.as("na"), $"ia" === $"na.doc_id")
        .join(sizes.as("nb"), $"ib" === $"nb.doc_id")
        .select($"ia", $"ib",
          round($"inter" / ($"na.ns" + $"nb.ns" - $"inter"), 6).as("jaccard"))
        .filter($"jaccard" >= JaccardThreshold)
        .orderBy($"ia", $"ib")
    },
    Some(s"""
      WITH sh AS (${shinglesSql(3)}),
      sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY ia, ib)
      SELECT ia, ib,
        round(inter * 1.0 / (na.ns + nb.ns - inter), 6) AS jaccard
      FROM inter
      JOIN sizes na ON ia = na.doc_id
      JOIN sizes nb ON ib = nb.doc_id
      WHERE round(inter * 1.0 / (na.ns + nb.ns - inter), 6) >= $JaccardThreshold
      ORDER BY ia, ib""")
  )

  val all: Seq[GraftQuery] = Seq(qDedupExact, qDedupMinhash, qDedupSimhash, qNgramJaccard)
}
