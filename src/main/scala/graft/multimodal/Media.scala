package graft.multimodal

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, and a batched decode/feature-extract pass.
  *
  * The container has no image/audio codecs, so `decodeStub` is a clearly
  * marked deterministic fake — but everything Spark-side is real and tested:
  * the schema (binary payload + typed metadata), the partition-preserving
  * `mapPartitions` batch shape (the Scala analog of a pandas-UDF iterator:
  * per-partition init cost amortized across rows, e.g. loading a codec once),
  * and the downstream relational feature queries.
  */
object Media {

  /** One media object: opaque payload + metadata the catalog would carry. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,            // "image" | "audio" | "video"
      data: Array[Byte],
      declared_width: Int,
      declared_height: Int)

  /** Output of the (stubbed) decoder. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      brightness: Double)

  /** Manufacture media rows from `documents`: payload = UTF-8 text bytes
    * (an opaque blob as far as the pipeline is concerned). */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id".as("media_id"),
        element_at(lit(Array("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
        encode($"text", "UTF-8").as("data"),
        (pmod($"doc_id" * 37, lit(640)) + lit(1)).cast(IntegerType).as("declared_width"),
        (pmod($"doc_id" * 53, lit(480)) + lit(1)).cast(IntegerType).as("declared_height"))
      .as[MediaRecord]
  }

  /** STUB — deterministic fake decoder. A real deployment would call an
    * image/audio codec here (libs not present in this container). The fake
    * derives features from the payload so tests are exact; a null payload
    * decodes like an empty one (no NPE in the batch pass). */
  def decodeStub(data: Array[Byte]): (Int, Int, Int, Double) = {
    val n = if (data == null) 0 else data.length
    val width = n % 640 + 1
    // Long arithmetic: n * 7 overflows Int past ~306 MB payloads, wrapping
    // the remainder negative — the relational twin computes in BIGINT
    val height = (n.toLong * 7 % 480 + 1).toInt
    val channels = 3
    // "brightness": mean code point of the UTF-8-decoded payload — the
    // stand-in for a decoded-pixel stat, chosen because the relational twin
    // reproduces it exactly with ascii() over characters in BOTH engines
    // (a mean over raw BYTES would diverge from any per-character SQL
    // formulation on non-ASCII payloads).
    val cps =
      if (n == 0) Array.empty[Int]
      else new String(data, java.nio.charset.StandardCharsets.UTF_8)
        .codePoints().toArray
    val brightness =
      if (cps.isEmpty) 0.0
      else math.round(cps.map(_.toLong).sum.toDouble / cps.length * 1e6) / 1e6
    (width, height, channels, brightness)
  }

  /** Batched decode: mapPartitions so per-partition setup (codec init in a
    * real deployment) happens once per partition, not once per row. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights, ...)
      rows.map { r =>
        val (w, h, c, bright) = decodeStub(r.data)
        val nBytes = if (r.data == null) 0L else r.data.length.toLong
        MediaFeatures(r.media_id, r.kind, nBytes, w, h, c, bright)
      }
    }
  }

  /** The relational (oracle-checkable) twin of the feature pass: the same
    * fake-decode arithmetic expressed as columns. `brightness` is the mean
    * code point of the text — byte-identical to decodeStub's value. */
  val qMediaFeatures = GraftQuery(
    "q_media_features",
    (spark, dir) => {
      import spark.implicits._
      val nBytes = length(encode($"text", "UTF-8")).cast(LongType)
      Tables.documents(spark, dir)
        .select(
          $"doc_id".as("media_id"),
          element_at(lit(Array("image", "audio", "video")),
            (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
          nBytes.as("n_bytes"),
          (nBytes % 640 + 1).as("width"),
          ((nBytes * 7) % 480 + 1).as("height"),
          // native one-pass mean code point (the decodeStub semantic,
          // empty text → 0.0): the declarative aggregate-over-sequence
          // fold is a CodegenFallback per-CHARACTER interpreted lambda —
          // the hottest expression in the whole bench before this
          call_function("mean_codepoint", $"text").as("brightness"))
        .orderBy($"media_id")
    },
    Some("""
      SELECT doc_id AS media_id,
        ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
        octet_length(encode(text))::BIGINT AS n_bytes,
        octet_length(encode(text))::BIGINT % 640 + 1 AS width,
        (octet_length(encode(text))::BIGINT * 7) % 480 + 1 AS height,
        CASE WHEN length(text) > 0 THEN
          floor(list_sum(list_transform(range(1, length(text) + 1),
                i -> ascii(text[i])))::DOUBLE
                / length(text) * 1000000.0 + 0.5)
                / 1000000.0 ELSE 0.0 END AS brightness
      FROM documents
      ORDER BY media_id""")
  )

  /** Vision-preprocessing target box (the standard 224×224 model input). */
  val FitBox = 224

  /** Resize planning: aspect-preserving fit of each media's (fake-decoded)
    * dimensions into the FitBox — `scale = min(224/w, 224/h)`, floor, clamp
    * to ≥ 1. Identical IEEE double math in both engines, so the plan is
    * oracle-checkable; the payload "resample" itself would live in the same
    * mapPartitions pass as decodeStub (codec work, out of container scope).
    * Map-only. */
  val qMediaResize = GraftQuery(
    "q_media_resize",
    (spark, dir) => {
      import spark.implicits._
      val nBytes = length(encode($"text", "UTF-8")).cast(LongType)
      val w = (nBytes % 640 + 1).cast(DoubleType)
      val h = ((nBytes * 7) % 480 + 1).cast(DoubleType)
      val scale = least(lit(FitBox.toDouble) / w, lit(FitBox.toDouble) / h)
      Tables.documents(spark, dir)
        .select(
          $"doc_id".as("media_id"),
          w.cast(LongType).as("width"),
          h.cast(LongType).as("height"),
          greatest(lit(1L), floor(w * scale).cast(LongType)).as("out_width"),
          greatest(lit(1L), floor(h * scale).cast(LongType)).as("out_height"))
        .orderBy($"media_id")
    },
    Some(s"""
      SELECT media_id, width::BIGINT AS width, height::BIGINT AS height,
        greatest(1, floor(width * scale))::BIGINT AS out_width,
        greatest(1, floor(height * scale))::BIGINT AS out_height
      FROM (
        SELECT media_id, width, height,
          least($FitBox.0 / width, $FitBox.0 / height) AS scale
        FROM (
          SELECT doc_id AS media_id,
            (octet_length(encode(text))::BIGINT % 640 + 1)::DOUBLE AS width,
            ((octet_length(encode(text))::BIGINT * 7) % 480 + 1)::DOUBLE AS height
          FROM documents))
      ORDER BY media_id""")
  )

  /** Synthetic "duration": 1 second of video per 100 payload bytes. */
  val BytesPerSecond = 100

  /** Frame sampling: one frame timestamp per second of (fake) duration for
    * the video-kind media — the explode-shaped fan-out a real frame sampler
    * produces (rows ∝ Σ durations), with the per-frame decode again
    * belonging to the batched mapPartitions pass. */
  val qMediaFrames = GraftQuery(
    "q_media_frames",
    (spark, dir) => {
      import spark.implicits._
      val nBytes = length(encode($"text", "UTF-8")).cast(LongType)
      Tables.documents(spark, dir)
        .select(
          $"doc_id".as("media_id"),
          element_at(lit(Array("image", "audio", "video")),
            (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
          expr(s"cast(length(encode(text, 'UTF-8')) as bigint) div $BytesPerSecond")
            .as("dur_s"))
        .filter($"kind" === "video")
        .select($"media_id",
          explode(sequence(lit(0L), $"dur_s")).as("frame_idx"))
        .select($"media_id", $"frame_idx",
          ($"frame_idx" * 1000).as("frame_ts_ms"))
        .orderBy($"media_id", $"frame_idx")
    },
    Some(s"""
      SELECT media_id, unnest(range(0, dur_s + 1)) AS frame_idx,
        unnest(range(0, dur_s + 1)) * 1000 AS frame_ts_ms
      FROM (
        SELECT doc_id AS media_id,
          octet_length(encode(text))::BIGINT // $BytesPerSecond AS dur_s
        FROM documents
        WHERE ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] = 'video')
      ORDER BY media_id, frame_idx""")
  )

  /** Byte budget per shard for [[qMediaShards]] — a library parameter (real
    * WebDataset shards are ~100 MB-1 GB; the bench corpus uses a small
    * budget so the assignment exercises multiple shards per kind). */
  val ShardBytes = 4096L

  /** In-order byte-budget BLOCK layout of a (media_id, kind, n_bytes)
    * relation — one thin wrapper over the single shared boundary-math
    * helper ([[graft.operators.PipelineOps.prefixDivAssign]], also behind
    * q_pack_sequences) so the two schemes can never drift. Block
    * semantics: an object whose bytes overrun the budget STRADDLES into
    * the next block (the reader seeks offset + n_bytes across block
    * files) — deliberately not whole-object greedy tar packing, which has
    * no closed prefix-sum form. Factored out so the assignment math is
    * unit-testable on a constructed relation with a tiny budget
    * (MediaSpec). */
  private[graft] def shardAssign(media: DataFrame, budget: Long): DataFrame = {
    import media.sparkSession.implicits._
    graft.operators.PipelineOps
      .prefixDivAssign(media, "kind", "media_id", "n_bytes", budget, "shard_id")
      .select($"media_id", $"kind", $"n_bytes", $"shard_id",
        ($"cum_before" % budget).as("shard_offset"))
  }

  /** Media block-shard planning — the manifest step between "curated media
    * rows" and "fixed-size blocks on object storage": lay each modality's
    * objects, in stable id order, into fixed-byte-budget blocks. The
    * manifest (object → block, offset) is what the block writer and the
    * training dataloader both consume; objects may straddle block
    * boundaries (see [[shardAssign]]).
    *
    * Scale shape: one hash exchange on `kind` + an in-partition running
    * sum — the per-stratum prefix-sum shape shared with q_pack_sequences.
    * (At real scale the partition key is (kind, coarse id range) so no
    * single modality serializes through one task; the budget constant and
    * the scheme are unchanged.) */
  val qMediaShards = GraftQuery(
    "q_media_shards",
    (spark, dir) => {
      import spark.implicits._
      val media = fromDocuments(spark, dir)
        .select($"media_id", $"kind", length($"data").cast(LongType).as("n_bytes"))
      shardAssign(media, ShardBytes).orderBy($"media_id")
    },
    Some(s"""
      SELECT media_id, kind, n_bytes,
        bytes_before // $ShardBytes AS shard_id,
        bytes_before % $ShardBytes AS shard_offset
      FROM (
        SELECT media_id, kind, n_bytes,
          coalesce(sum(n_bytes) OVER (PARTITION BY kind ORDER BY media_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
            AS bytes_before
        FROM (
          SELECT doc_id AS media_id,
            CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
            octet_length(encode(text))::BIGINT AS n_bytes
          FROM documents))
      ORDER BY media_id""")
  )

  /** Hamming radius for [[qMediaPhashDedup]]. With 4 bands of 4 bits, any
    * pair within distance 3 shares at least one intact band (pigeonhole) —
    * banded candidate generation has NO false negatives at this radius. */
  val PhashHamming = 3

  /** Banded pHash posting rows (media_id, kind, ah, band, bkey) — the
    * candidate-GENERATION volume of the media dedup family (4 rows per
    * object, linear in the corpus). Shared by [[qMediaPhashDedup]] and the
    * scale rehearsal (ScaleRehearsal / ScaleLawSpec measure the SAME
    * relation the query executes — no drift). NOTE: the bucket key
    * includes `kind` (= media_id % 3), so the rehearsal's salt stride must
    * be a multiple of 3 for replicas to keep their modality. */
  private[graft] def phashPostings(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id".as("media_id"),
        element_at(lit(Array("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
        call_function("ahash16", $"text").as("ah"))
      .select($"media_id", $"kind", $"ah",
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bkey", expr("(ah >> (band * 4)) & 15"))
  }

  /** Distinct candidate pairs from the banded bucket join, BEFORE the
    * Hamming verify — the pair-join output the replica growth law bounds.
    * The Hamming distance rides along so [[qMediaPhashDedup]] can filter
    * it; Catalyst pushes that filter below the distinct (the predicate
    * references only distinct keys), so the executed dedup shuffle still
    * carries only verified pairs. */
  private[graft] def phashCandidates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val banded = phashPostings(spark, dir)
    banded.as("a").join(banded.as("b"),
        $"a.kind" === $"b.kind" && $"a.band" === $"b.band" &&
          $"a.bkey" === $"b.bkey" && $"a.media_id" < $"b.media_id")
      .select($"a.media_id".as("ia"), $"b.media_id".as("ib"),
        $"a.kind".as("kind"),
        expr("cast(bit_count(a.ah ^ b.ah) as bigint)").as("hamming"))
      .distinct()
  }

  /** Perceptual-hash near-dedup over the media payloads — the multimodal
    * member of the dedup family (images that differ by re-encode/resize
    * survive exact byte-hash dedup; a perceptual hash catches them): one
    * map-side `ahash16` signature per object (16-block average hash, the
    * classic aHash scheme over the decode stub's code-point stream — a real
    * deployment feeds decoded pixel luma through the SAME 16-block
    * relational shape), 4×4-bit banded LSH candidate generation scoped per
    * modality ([[phashPostings]]), exact Hamming verify ≤ [[PhashHamming]]
    * applied over [[phashCandidates]] (whose scaladoc explains why the
    * verify still executes below the candidate distinct — the
    * q_dedup_simhash discipline, one modality column added to the bucket
    * key).
    *
    * Scale shape: signatures are one map pass (native codegen, no explode);
    * candidates come only from shared (kind, band, bkey) buckets — never an
    * all-pairs product. */
  val qMediaPhashDedup = GraftQuery(
    "q_media_phash_dedup",
    (spark, dir) => {
      import spark.implicits._
      phashCandidates(spark, dir)
        .filter($"hamming" <= PhashHamming)
        .orderBy($"ia", $"ib")
    },
    // ahash16's relational twin: per-position code points via the
    // qMediaFeatures ascii(text[i]) idiom; block b = (p·16) // n; bit set
    // iff block mean > global mean by INTEGER cross-multiplication
    // (HUGEINT, mirroring the expression's BigInteger guard)
    Some(s"""
      WITH media AS (
        SELECT doc_id AS media_id,
          ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
          text FROM documents),
      pos AS (
        SELECT media_id, kind, length(text) AS n,
          unnest([{'p': i - 1, 'cp': ascii(text[i])}
                  for i in range(1, length(text) + 1)]) AS c
        FROM media),
      blocks AS (
        SELECT media_id, kind, n, (c.p * 16) // n AS b,
          sum(c.cp) AS sb, count(*) AS cb
        FROM pos GROUP BY media_id, kind, n, b),
      tot AS (SELECT media_id, sum(sb) AS total FROM blocks GROUP BY media_id),
      sig AS (
        SELECT media_id, kind,
          sum(CASE WHEN sb::HUGEINT * n > total::HUGEINT * cb
              THEN 1::BIGINT << b ELSE 0 END) AS ah
        FROM blocks JOIN tot USING (media_id)
        GROUP BY media_id, kind),
      banded AS (
        SELECT media_id, kind, ah, band, (ah >> (band * 4)) & 15 AS bkey
        FROM sig CROSS JOIN (SELECT unnest(range(4)) AS band)),
      pairs AS (
        SELECT DISTINCT a.media_id AS ia, b.media_id AS ib, a.kind AS kind,
          bit_count(xor(a.ah, b.ah))::BIGINT AS hamming
        FROM banded a JOIN banded b
          ON a.kind = b.kind AND a.band = b.band AND a.bkey = b.bkey
            AND a.media_id < b.media_id)
      SELECT ia, ib, kind, hamming FROM pairs
      WHERE hamming <= $PhashHamming
      ORDER BY ia, ib""")
  )

  /** ViT patch edge for [[qPackMultimodal]] (224/16 = the standard 14×14
    * grid at full FitBox). */
  val PatchSize = 16L

  /** Audio token rate for [[qPackMultimodal]] — tokens per (fake) second of
    * audio payload, the Whisper-style fixed-rate encoder convention. */
  val TokensPerAudioSecond = 25L

  /** Context-window token budget for [[qPackMultimodal]] — larger than the
    * text-only [[graft.operators.PipelineOps.PackSize]] because interleaved
    * samples carry media tokens too. */
  val MMPackTokens = 2048L

  /** Interleaved multimodal sequence packing — the batch-assembly step of a
    * multimodal training pipeline: each document is an interleaved sample
    * costing its TEXT tokens plus its attached media object's tokens under
    * the standard per-modality encoders — image: ViT patch grid of the
    * [[qMediaResize]] output (`⌈out_w/16⌉·⌈out_h/16⌉`); audio: fixed
    * [[TokensPerAudioSecond]] per second of [[qMediaFrames]]-convention
    * duration; video: one resized frame per second, each a patch grid.
    * Samples are then packed into [[MMPackTokens]]-token context windows
    * per language with the SAME shared prefix-sum boundary math as text
    * packing and byte shard planning — three consumers, one scheme.
    *
    * Exactness: resize doubles are the oracle-green [[qMediaResize]] ops;
    * every token count is integer arithmetic (`⌈a/b⌉` as `(a+b−1) div b`);
    * the prefix sum is exact BIGINT.
    *
    * Scale shape: token costing is map-only; the packing is one lang-keyed
    * exchange + running-sum window (the [[graft.operators.PipelineOps]]
    * per-stratum prefix-sum shape — parallelism = strata, the honest form
    * of order-dependent packing). */
  val qPackMultimodal = GraftQuery(
    "q_pack_multimodal",
    (spark, dir) => {
      import spark.implicits._
      val nBytes = length(encode($"text", "UTF-8")).cast(LongType)
      val w = (nBytes % 640 + 1).cast(DoubleType)
      val h = ((nBytes * 7) % 480 + 1).cast(DoubleType)
      val scale = least(lit(FitBox.toDouble) / w, lit(FitBox.toDouble) / h)
      val outW = greatest(lit(1L), floor(w * scale).cast(LongType))
      val outH = greatest(lit(1L), floor(h * scale).cast(LongType))
      val patches = expr(s"((out_w + ${PatchSize - 1}) div $PatchSize) * " +
        s"((out_h + ${PatchSize - 1}) div $PatchSize)")
      val costed = Tables.documents(spark, dir)
        .select($"doc_id", $"lang",
          element_at(lit(Array("image", "audio", "video")),
            (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
          size(graft.functions.Text.tokens($"text")).cast(LongType)
            .as("n_text_tokens"),
          outW.as("out_w"), outH.as("out_h"),
          expr(s"cast(length(encode(text, 'UTF-8')) as bigint) div $BytesPerSecond")
            .as("dur_s"))
        .select($"doc_id", $"lang", $"kind", $"n_text_tokens",
          when($"kind" === "image", patches)
            .when($"kind" === "audio", $"dur_s" * TokensPerAudioSecond)
            .otherwise(($"dur_s" + 1L) * patches).as("n_media_tokens"))
        .withColumn("n_tokens", $"n_text_tokens" + $"n_media_tokens")
      graft.operators.PipelineOps
        .prefixDivAssign(costed, "lang", "doc_id", "n_tokens",
          MMPackTokens, "pack_id")
        .select($"doc_id", $"lang", $"kind", $"n_text_tokens",
          $"n_media_tokens", $"n_tokens", $"pack_id",
          ($"cum_before" % MMPackTokens).as("pack_offset"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH rs AS (
        SELECT doc_id, lang, kind, n_text_tokens,
          greatest(1, floor(w * least($FitBox.0 / w, $FitBox.0 / h)))::BIGINT
            AS out_w,
          greatest(1, floor(h * least($FitBox.0 / w, $FitBox.0 / h)))::BIGINT
            AS out_h,
          n_bytes // $BytesPerSecond AS dur_s
        FROM (
          SELECT doc_id, lang,
            ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
            len(string_split_regex(lower(text), '[[:space:]]+'))::BIGINT
              AS n_text_tokens,
            octet_length(encode(text))::BIGINT AS n_bytes,
            (octet_length(encode(text))::BIGINT % 640 + 1)::DOUBLE AS w,
            ((octet_length(encode(text))::BIGINT * 7) % 480 + 1)::DOUBLE AS h
          FROM documents)),
      tok AS (
        SELECT doc_id, lang, kind, n_text_tokens,
          CASE kind
            WHEN 'image' THEN
              ((out_w + ${PatchSize - 1}) // $PatchSize)
                * ((out_h + ${PatchSize - 1}) // $PatchSize)
            WHEN 'audio' THEN dur_s * $TokensPerAudioSecond
            ELSE (dur_s + 1)
              * ((out_w + ${PatchSize - 1}) // $PatchSize)
              * ((out_h + ${PatchSize - 1}) // $PatchSize)
          END AS n_media_tokens
        FROM rs),
      packed AS (
        SELECT doc_id, lang, kind, n_text_tokens, n_media_tokens,
          n_text_tokens + n_media_tokens AS n_tokens,
          coalesce(sum(n_text_tokens + n_media_tokens) OVER (
            PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
            AS cum_before
        FROM tok)
      SELECT doc_id, lang, kind, n_text_tokens, n_media_tokens, n_tokens,
        cum_before // $MMPackTokens AS pack_id,
        cum_before % $MMPackTokens AS pack_offset
      FROM packed
      ORDER BY doc_id""")
  )

  val all: Seq[GraftQuery] =
    Seq(qMediaFeatures, qMediaResize, qMediaFrames, qMediaShards,
      qMediaPhashDedup, qPackMultimodal)
}
