package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native array expressions for the similarity operators.
  *
  * The declarative formulation of these (zip_with/aggregate with
  * DECIMAL(38,12) accumulators) is CodegenFallback — every element step is
  * an interpreted lambda call allocating boxed decimals, which is the single
  * biggest CPU wart at scale. These expressions keep the EXACT same
  * semantics (each double product rounded to a scale-12 decimal via the
  * shortest-decimal representation, exact decimal accumulation — i.e.
  * order-independent and bit-identical to the DuckDB oracle's
  * `sum(CAST(x*y AS DECIMAL(38,12)))::DOUBLE`) in one tight loop inside
  * whole-stage codegen.
  */
object ArrayOps {

  /** Exact decimal dot product of two float arrays (null on null input /
    * element, or length mismatch — mirroring the zip_with formulation). */
  def dotF32(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      sum = sum.add(java.math.BigDecimal.valueOf(p)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    sum.doubleValue()
  }

  /** Plain-double dot product of two float arrays — the cheap PREFILTER twin
    * of [[dotF32]]: same null/length semantics, IEEE double accumulation in
    * array order instead of exact decimals. Error vs the decimal-exact value:
    * ≤ n·5e-13 absolute (per-term decimal rounding) plus ~n·ε·Σ|aᵢbᵢ|
    * relative fold error. Guard bands built on this must live in DOT space
    * (`fast ≥ thr·scale − (abs + rel·scale)`, see qEmbedNeardupLsh) — a
    * fixed cosine-space band divides the absolute part by the norms and
    * silently stops covering small-norm vectors. */
  def dotF32Fast(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  /** Sign-LSH bucket of a float array under the deterministic LCG plane
    * weights w(j,d) = ((1103515245*(j*64+d) + 12345) div 65536) % 19 - 9,
    * projections accumulated in scale-12 decimals (sign decisions identical
    * to the oracle's decimal sums). */
  def lshBucket(arr: ArrayData, nPlanes: Int): java.lang.Long = {
    val n = arr.numElements()
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      var sum = java.math.BigDecimal.ZERO
      var d = 0
      while (d < n) {
        if (arr.isNullAt(d)) return null
        val w = ((1103515245L * (j * 64 + d) + 12345L) / 65536L) % 19L - 9L
        val p = w * arr.getFloat(d).toDouble
        sum = sum.add(java.math.BigDecimal.valueOf(p)
          .setScale(12, java.math.RoundingMode.HALF_UP))
        d += 1
      }
      if (sum.signum() >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".toCharArray

  /** `"i:"` prefix bytes for hash index i, cached for the small i this
    * expression ever sees. */
  private val prefixCache: Array[Array[Byte]] =
    Array.tabulate(64)(i => (i.toString + ":").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))

  private def hex32(d: Array[Byte], sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < 16) {
      sb.append(hexDigits((d(i) >> 4) & 0xf))
      sb.append(hexDigits(d(i) & 0xf))
      i += 1
    }
  }

  /** MinHash LSH band keys of a shingle set, all K hashes in one pass.
    *
    * Semantically identical to the declarative formulation
    * `concat_ws("|", array_min(transform(sh, s -> md5(concat(i, ':', s)))) …)`
    * per band (and to the DuckDB oracle's
    * `min(md5(h || ':' || shingle)) … string_agg(mh, '|' ORDER BY h)`):
    * h_i(doc) = min over shingles of md5(i + ":" + shingle) as lowercase hex
    * (hex strings compare identically to their digest bytes — the nibble→hex
    * map is monotonic); band key b = h_{b·R} || '|' || … || h_{b·R+R-1}.
    * Null shingle elements are skipped (array_min semantics); an EMPTY set
    * yields NULL — the doc never enters banding, exactly like the oracle
    * (which produces no hashed rows for it). Empty-string keys here would
    * collide every shingle-less document into one bucket per band and send
    * the candidate self-join quadratic in their count.
    *
    * The declarative twin is CodegenFallback: every one of the K·|sh| md5
    * calls runs through an interpreted lambda with boxed UTF8String
    * allocations. This loop is the same work inside whole-stage codegen —
    * one MessageDigest per thread, digests compared as raw bytes.
    */
  def minhashBands(sh: ArrayData, k: Int, bandRows: Int): ArrayData = {
    val md = md5Local.get()
    val n = sh.numElements()
    val mins = new Array[Array[Byte]](k)
    var j = 0
    while (j < n) {
      if (!sh.isNullAt(j)) {
        val sBytes = sh.getUTF8String(j).getBytes
        var i = 0
        while (i < k) {
          md.reset()
          md.update(if (i < prefixCache.length) prefixCache(i)
                    else (i.toString + ":").getBytes(
                      java.nio.charset.StandardCharsets.UTF_8))
          md.update(sBytes)
          val d = md.digest()
          if (mins(i) == null || java.util.Arrays.compareUnsigned(d, mins(i)) < 0)
            mins(i) = d
          i += 1
        }
      }
      j += 1
    }
    if (mins(0) == null) return null  // no non-null shingles at all
    val nBands = k / bandRows
    val out = new Array[AnyRef](nBands)
    var b = 0
    while (b < nBands) {
      val sb = new java.lang.StringBuilder(bandRows * 33)
      var first = true
      var r = 0
      while (r < bandRows) {
        val m = mins(b * bandRows + r)
        if (m != null) {
          if (!first) sb.append('|')
          first = false
          hex32(m, sb)
        }
        r += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit tf-weighted SimHash signature of a text, computed per row.
    *
    * Identical to the relational formulation (explode tokens → per-token
    * hv = first 8 md5 hex chars as unsigned 32-bit → per-bit Σ ±1 over token
    * INSTANCES → sign) and to the DuckDB oracle's tf-weighted per-term sums
    * (summing ±1 over instances ≡ tf-weighted sum over distinct terms) —
    * but with no explode and no aggregation shuffle: the signature is one
    * map-side pass per document, which at 100 TB removes the whole
    * (doc_id, term) shuffle from the plan. */
  def simhash32(text: UTF8String): Long = {
    val md = md5Local.get()
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val sums = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hv = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
               ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((hv >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** 16-bit average hash (aHash) of a payload's code-point stream — the
    * perceptual-hash stand-in for media near-dedup: split the stream into
    * 16 contiguous blocks (code point at position p → block ⌊p·16/n⌋), set
    * bit b iff block b's mean code point strictly exceeds the global mean.
    * On a real deployment the same 16-block/mean-threshold scheme runs over
    * decoded pixel luma (classic aHash); the code-point stream is this
    * container's deterministic decode stub (see multimodal.Media).
    *
    * Exactness: block-vs-global mean comparisons are cross-multiplied in
    * INTEGER arithmetic (`sum_b · n > total · cnt_b`) — no double division,
    * so bit-identical to a BIGINT/HUGEINT SQL twin; the multiply is done in
    * BigInteger so multi-gigabyte payloads cannot overflow (DuckDB's twin
    * casts to HUGEINT for the same reason). Empty payload → hash 0. */
  def ahash16(s: UTF8String): Long = {
    val str = s.toString
    val sums = new Array[Long](16)
    val cnts = new Array[Long](16)
    val n = str.codePointCount(0, str.length).toLong
    if (n == 0L) return 0L
    var total = 0L
    var i = 0
    var p = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val b = (p * 16L / n).toInt
      sums(b) += cp
      cnts(b) += 1
      total += cp
      p += 1
      i += Character.charCount(cp)
    }
    var h = 0L
    var b = 0
    while (b < 16) {
      if (cnts(b) > 0 &&
        java.math.BigInteger.valueOf(sums(b)).multiply(java.math.BigInteger.valueOf(n))
          .compareTo(java.math.BigInteger.valueOf(total)
            .multiply(java.math.BigInteger.valueOf(cnts(b)))) > 0)
        h |= 1L << b
      b += 1
    }
    h
  }

  /** Upper-triangle outer-product stream of a float vector: one
    * struct(i, j, p = double(vᵢ)·double(vⱼ)) per dimension pair i ≤ j, in
    * row-major order — the map-side feed of the Gram/covariance aggregate
    * (explode → partial sum per (i, j), so the shuffle carries d(d+1)/2
    * rows per partition however large the corpus). Each product is one
    * IEEE double multiply of exactly-widened floats — bit-identical to the
    * oracle's `embedding[i]::DOUBLE * embedding[j]::DOUBLE`. */
  def upperProducts(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = a.getFloat(i).toDouble; i += 1 }
    val out = new Array[Any](n * (n + 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](i, j, v(i) * v(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact decimal squared L2 distance between a float vector and a double
    * vector (a trained centroid): Σ dec₁₂((aᵢ-bᵢ)²). Same exactness contract
    * as [[dotF32]] — each double term rounded to scale-12 decimal via its
    * shortest-decimal representation, exact accumulation — so it is
    * bit-identical to the oracle's
    * `sum(CAST((v-c)*(v-c) AS DECIMAL(38,12)))::DOUBLE`. */
  /** Exact-decimal dot product of an array&lt;float&gt; vector and an
    * array&lt;double&gt; centroid — the mixed-width sibling of [[dotF32]]
    * (same per-term dec₁₂ rounding, so `dot_f32_f64(v, cast(c))` equals
    * `dot_f32(v, c)` bit-for-bit when the centroid is an exact float
    * cast). Exists for the TRAINED IVF codebook, whose centroids are
    * per-dimension decimal means (doubles) rather than corpus vectors. */
  def dotF32F64(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val p = a.getFloat(i).toDouble * b.getDouble(i)
      sum = sum.add(java.math.BigDecimal.valueOf(p)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    sum.doubleValue()
  }

  def dist2F32F64(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getDouble(i)
      sum = sum.add(java.math.BigDecimal.valueOf(d * d)
        .setScale(12, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    sum.doubleValue()
  }

  /** Plain-double twin of [[dist2F32F64]] — the cheap RANKING prefilter:
    * error vs the decimal-exact value is ~n·ε·Σ(aᵢ-bᵢ)² (≈1e-13 at n=64),
    * so `fast ≤ group_min_fast + 1e-6` can never exclude the exact argmin. */
  def dist2F32F64Fast(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getDouble(i)
      sum += d * d
      i += 1
    }
    sum
  }

  /** Mean Unicode code point of a string, qrounded to 6 dp (0.0 for empty) —
    * the decodeStub "brightness" semantic as one codegen pass. The
    * declarative twin (aggregate over sequence(1, length) with
    * ascii(substring)) is a CodegenFallback per-character interpreted fold —
    * the single hottest expression in the honest bench before this existed. */
  def meanCodepoint(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    var sum = 0L
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sum += cp
      n += 1
      i += Character.charCount(cp)
    }
    math.floor(sum.toDouble / n * 1e6 + 0.5) / 1e6
  }

  /** Per-document repetition statistics in ONE pass (the Gopher repetition
    * rules' raw counts): [n_tokens, distinct_tokens, top_token_count,
    * n_2grams, distinct_2grams, top_2gram_count] over the lowercase
    * whitespace tokenization every other text operator uses. The relational
    * twin (explode → per-term counts → per-doc aggregate) costs a full
    * (doc, term) shuffle; this is a map-side projection — at 100 TB the
    * difference between a shuffle ∝ corpus tokens and none at all. */
  def repStats(text: UTF8String): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val n = toks.length
    val tokCounts = new java.util.HashMap[String, Int]()
    var topTok = 0
    var i = 0
    while (i < n) {
      val c = tokCounts.merge(toks(i), 1, (x, y) => x + y)
      if (c > topTok) topTok = c
      i += 1
    }
    val gramCounts = new java.util.HashMap[String, Int]()
    var topGram = 0
    i = 0
    while (i + 2 <= n) {
      val g = toks(i) + " " + toks(i + 1)
      val c = gramCounts.merge(g, 1, (x, y) => x + y)
      if (c > topGram) topGram = c
      i += 1
    }
    new GenericArrayData(Array[Long](
      n.toLong, tokCounts.size.toLong, topTok.toLong,
      math.max(n - 1, 0).toLong, gramCounts.size.toLong, topGram.toLong))
  }

  /** One-pass vocabulary-diversity counters of a document:
    * `[n_tokens, n_types, rep2]` over lowercase whitespace-split tokens,
    * where `rep2 = Σ_term c·(c−1)` (the Simpson-index numerator: ordered
    * same-term token pairs). Identical by construction to the declarative
    * explode → count-per-(doc, term) → `sum(c*(c-1))` formulation (and to
    * the oracle's `tc` CTE) — but computed map-side in one hash pass, so
    * the per-(doc, term) exchange disappears entirely. Incremental
    * identity: a term reaching count c adds 2·(c−1) ordered pairs. */
  def tokenDiversity(text: UTF8String): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val counts = new java.util.HashMap[String, Int]()
    var rep2 = 0L
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, (x, y) => x + y)
      rep2 += 2L * (c - 1)
      i += 1
    }
    new GenericArrayData(Array[Long](toks.length.toLong, counts.size.toLong, rep2))
  }

  /** Distinct word n-gram shingles of a text, lowercase whitespace-split.
    *
    * Set-identical to the declarative
    * `array_distinct(zip_with(slice(toks,…), …, concat_ws(" ", …)))` over
    * `split(lower(text), "\\s+")` (and to the oracle's
    * `list_distinct([ws[i] || ' ' || ws[i+1] …])`): Java's
    * `split(regex, -1)` matches Spark's `split` limit=-1 semantics
    * (leading empty token kept, trailing empties kept), insertion order =
    * first occurrence like array_distinct. The declarative twin is
    * CodegenFallback — per-token interpreted lambdas; this is one tight
    * loop inside codegen. */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Every word n-gram shingle of a text IN POSITION ORDER and NOT distinct
    * (unlike [[wordShingles]]): `posexplode` of the result yields
    * (start_token_position, shingle) for every sliding window — the
    * positional span stream exact-substring dedup needs (a span repeated
    * inside one document must surface once per occurrence, and the array
    * index IS the token offset). Same lowercase `split("\\s+", -1)`
    * tokenization as every other text op in the engine. Returns the empty
    * array when the text has fewer than n tokens. */
  def wordShinglesAll(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val m = math.max(toks.length - n + 1, 0)
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Non-overlapping word n-token chunks of a text, lowercase
    * whitespace-split, IN ORDER and NOT distinct (unlike
    * [[wordShingles]] — span-level dedup needs every positional span,
    * including in-document repeats, and needs the trailing partial chunk
    * so reassembly reproduces the full document). Same `split(regex, -1)`
    * tokenization as every other text op in the engine; the DuckDB twin is
    * `[array_to_string(ws[i:i+n-1], ' ') for i in range(1, len(ws)+1, n)]`. */
  def wordChunks(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val out = new Array[UTF8String](((toks.length + n - 1) / n).max(1))
    var i = 0
    var k = 0
    while (i < toks.length || (i == 0 && k == 0)) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val end = math.min(i + n, toks.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(k) = UTF8String.fromString(sb.toString)
      k += 1
      i += n
    }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }

  /** Bits per dimension interleaved by [[zorder2]]: 2 × 21 = 42-bit keys,
    * exact in a BIGINT in both engines. */
  val ZorderBits = 21

  /** Morton / Z-order interleave of the low [[ZorderBits]] bits of two
    * non-negative dimension values: bit i of `x` lands at bit 2i, bit i of
    * `y` at bit 2i+1. Bits at or above 2^21 are ignored — callers bucket
    * each dimension below that first (the curve only needs RELATIVE order
    * within a dimension). DuckDB twin:
    * `list_sum([(((x>>i)&1)<<(2*i)) + (((y>>i)&1)<<(2*i+1)) for i in
    * range(21)])`. */
  def zorder2(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < ZorderBits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Symmetric int8 round-trip stats of a float vector, one pass:
    * `(max_abs, errs)` where `max_abs = max |x_i|` (as double — float→double
    * is exact) and `errs_i = |dequant(quant(x_i)) − x_i|` for the symmetric
    * int8 scheme `scale = max_abs / 127`, `q_i = floor(x_i·127/max_abs +
    * 0.5)` (half-up, the cross-engine-exact floor(v+0.5) form — NEVER
    * engine round()). Every step is IEEE double arithmetic written in the
    * SAME association as the DuckDB twin (`x*127/max_abs`, `q*(max_abs/
    * 127)`), so errs are bit-identical. All-zero vector: scale degenerates,
    * errs defined as 0. */
  def q8Stats(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getFloat(i).toDouble)
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val errs = new Array[Any](n)
    i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      errs(i) =
        if (maxAbs == 0.0) 0.0
        else {
          val q = math.floor(x * 127.0 / maxAbs + 0.5)
          math.abs(q * (maxAbs / 127.0) - x)
        }
      i += 1
    }
    new GenericInternalRow(Array[Any](maxAbs, new GenericArrayData(errs)))
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD'03
    * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
    * algorithm): md5-hex each positional word n-gram, slide a w-window over
    * the hash sequence, keep each window's MINIMUM hash, return the DISTINCT
    * selected hashes sorted ascending.
    *
    * Guarantee (the paper's): any token run of length ≥ n + w − 1 shared by
    * two documents contributes at least one shared selected fingerprint —
    * so overlap detection keyed on this set has no false negatives above
    * that span length, while keeping only ~2/(w+1) of the gram stream.
    * Lowercase-hex md5 strings compare identically to their digest bytes
    * (the nibble→hex map is monotonic), so both engines pick the same
    * minima. Fewer than n tokens → empty array; 0 < grams < w → one window
    * spanning all grams (the standard short-document tail rule). Positions
    * are deliberately dropped: the overlap operators key on the hash SET,
    * and a distinct sorted array keeps the per-doc relation bounded.
    *
    * The window scan is the naive O(grams·w) loop — w is a small constant
    * (≤ 8 everywhere in the engine) and the md5 pass dominates; a monotonic
    * deque would save nothing measurable. Same lowercase `split("\\s+", -1)`
    * tokenization as every other text op in the engine. */
  def winnowHashes(text: UTF8String, n: Int, w: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val md = md5Local.get()
    val hs = new Array[String](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hx = new java.lang.StringBuilder(32)
      hex32(d, hx)
      hs(i) = hx.toString
      i += 1
    }
    val sel = new java.util.TreeSet[String]()
    val nWindows = math.max(m - w + 1, 1)
    var s = 0
    while (s < nWindows) {
      var min = hs(s)
      var k = s + 1
      val end = math.min(s + w, m)
      while (k < end) {
        if (hs(k).compareTo(min) < 0) min = hs(k)
        k += 1
      }
      sel.add(min)
      s += 1
    }
    val out = new Array[AnyRef](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = UTF8String.fromString(it.next())
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Content-defined chunking (the rolling-hash boundary scheme of LBFS /
    * storage dedup, word-granular): a chunk boundary falls AFTER every token
    * whose u32(md5(token)) ≡ 0 (mod divisor) — and after the final token —
    * and each chunk's md5 hex is emitted in document order. Because
    * boundaries depend only on LOCAL content, an insertion early in a
    * document shifts at most the one chunk it lands in: the chunk stream
    * RE-ALIGNS at the next boundary, which is what makes chunk-hash dedup
    * robust to the prefix/suffix edits that break fixed-width
    * `word_chunks`. Expected chunk length = divisor tokens. u32 is the
    * engine-wide first-8-hex-chars-of-md5 hash (PipelineOps.u32Expr), so
    * the oracle reproduces every boundary decision exactly. Chunks are NOT
    * distinct and NOT sorted — positional repeats matter to dedup
    * accounting, exactly like word_shingles_all. */
  def cdcChunkHashes(text: UTF8String, divisor: Int): ArrayData = {
    val toks = text.toLowerCase.toString.split("\\s+", -1)
    val md = md5Local.get()
    val out = new java.util.ArrayList[AnyRef]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < toks.length) {
      if (sb.length > 0) sb.append(' ')
      sb.append(toks(i))
      md.reset()
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val u32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
                ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (u32 % divisor == 0 || i == toks.length - 1) {
        md.reset()
        val ch = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val hx = new java.lang.StringBuilder(32)
        hex32(ch, hx)
        out.add(UTF8String.fromString(hx.toString))
        sb.setLength(0)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `dot_f32(a, b)`: exact-decimal dot product of two array&lt;float&gt;. */
case class DotF32(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f32"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("dot_f32 requires two array<float> arguments")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.dotF32(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.ArrayOps.dotF32($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}

/** `dot_f32_fast(a, b)`: plain-double dot product of two array&lt;float&gt; —
  * the prefilter twin of `dot_f32` (see [[ArrayOps.dotF32Fast]]). */
case class DotF32Fast(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f32_fast"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("dot_f32_fast requires two array<float> arguments")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.dotF32Fast(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.ArrayOps.dotF32Fast($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32Fast =
    copy(left = newLeft, right = newRight)
}

/** `lsh_bucket(embedding)`: 8-plane sign-LSH bucket id of an array&lt;float&gt;. */
case class LshBucket(child: Expression, nPlanes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) if nPlanes >= 1 && nPlanes <= 63 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
        s"lsh_bucket requires 1 <= n_planes <= 63 (bits of one bigint), got $nPlanes")
      case _ => TypeCheckResult.TypeCheckFailure("lsh_bucket requires array<float>")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.lshBucket(input.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.ArrayOps.lshBucket($c, $nPlanes);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** `dot_f32_f64(v, c)`: exact-decimal dot product of an array&lt;float&gt;
  * vector and an array&lt;double&gt; centroid (see [[ArrayOps.dotF32F64]]). */
case class DotF32F64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f32_f64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "dot_f32_f64 requires (array<float>, array<double>)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.dotF32F64(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.ArrayOps.dotF32F64($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32F64 =
    copy(left = newLeft, right = newRight)
}

/** `dist2_f32_f64(v, c)`: exact-decimal squared L2 distance between an
  * array&lt;float&gt; vector and an array&lt;double&gt; centroid (see
  * [[ArrayOps.dist2F32F64]]). */
case class Dist2F32F64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dist2_f32_f64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "dist2_f32_f64 requires (array<float>, array<double>)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.dist2F32F64(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.ArrayOps.dist2F32F64($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2F32F64 =
    copy(left = newLeft, right = newRight)
}

/** `dist2_f32_f64_fast(v, c)`: plain-double squared L2 distance — the
  * ranking-prefilter twin of `dist2_f32_f64` (see
  * [[ArrayOps.dist2F32F64Fast]]). */
case class Dist2F32F64Fast(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dist2_f32_f64_fast"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "dist2_f32_f64_fast requires (array<float>, array<double>)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.dist2F32F64Fast(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.ArrayOps.dist2F32F64Fast($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2F32F64Fast =
    copy(left = newLeft, right = newRight)
}

/** `mean_codepoint(text)`: mean code point qrounded to 6 dp (see
  * [[ArrayOps.meanCodepoint]]). */
case class MeanCodepoint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "mean_codepoint"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("mean_codepoint requires STRING")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.meanCodepoint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayOps.meanCodepoint($c)")

  override protected def withNewChildInternal(newChild: Expression): MeanCodepoint =
    copy(child = newChild)
}

/** `rep_stats(text)`: one-pass repetition counters of a document (see
  * [[ArrayOps.repStats]] — [n_tokens, distinct_tokens, top_token_count,
  * n_2grams, distinct_2grams, top_2gram_count]). */
case class RepStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rep_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("rep_stats requires STRING")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.repStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrayOps.repStats($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

/** `token_diversity(text)`: one-pass diversity counters (see
  * [[ArrayOps.tokenDiversity]] — [n_tokens, n_types, rep2]). */
case class TokenDiversity(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_diversity"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("token_diversity requires STRING")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.tokenDiversity(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrayOps.tokenDiversity($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): TokenDiversity =
    copy(child = newChild)
}

/** `minhash_bands(shingles, k, band_rows)`: the K-hash MinHash signature of a
  * shingle array, pre-banded into k/band_rows LSH band keys (see
  * [[ArrayOps.minhashBands]] for the exact semantics and oracle twin). */
case class MinhashBands(child: Expression, k: Int, bandRows: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k > 0 && bandRows > 0 && k % bandRows == 0 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(
          s"minhash_bands requires k > 0 divisible by band_rows, got k=$k band_rows=$bandRows")
      case _ =>
        TypeCheckResult.TypeCheckFailure("minhash_bands requires array<string>")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.minhashBands(input.asInstanceOf[ArrayData], k, bandRows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrayOps.minhashBands($c, $k, $bandRows);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

/** `word_shingles(text, n)`: distinct word n-gram shingles of a string (see
  * [[ArrayOps.wordShingles]] for the exact split/distinct semantics). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
      case StringType =>
        TypeCheckResult.TypeCheckFailure(s"word_shingles requires n > 0, got $n")
      case _ => TypeCheckResult.TypeCheckFailure("word_shingles requires STRING")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrayOps.wordShingles($c, $n);
    """)

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `word_shingles_all(text, n)`: every sliding word n-gram in position order,
  * repeats kept — array index = start token offset (see
  * [[ArrayOps.wordShinglesAll]]). */
case class WordShinglesAll(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_shingles_all"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
      case StringType =>
        TypeCheckResult.TypeCheckFailure(s"word_shingles_all requires n > 0, got $n")
      case _ => TypeCheckResult.TypeCheckFailure("word_shingles_all requires STRING")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.wordShinglesAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrayOps.wordShinglesAll($c, $n);
    """)

  override protected def withNewChildInternal(newChild: Expression): WordShinglesAll =
    copy(child = newChild)
}

/** `word_chunks(text, n)`: non-overlapping in-order n-token chunks (see
  * [[ArrayOps.wordChunks]] for the exact split/ordering semantics). The
  * context-chunking primitive: posexplode of the result turns a document
  * into its (chunk_idx, chunk_text) training windows. */
case class WordChunks(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
      case StringType =>
        TypeCheckResult.TypeCheckFailure(s"word_chunks requires n > 0, got $n")
      case _ => TypeCheckResult.TypeCheckFailure("word_chunks requires STRING")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.wordChunks(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrayOps.wordChunks($c, $n);
    """)

  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)
}

/** `simhash32(text)`: per-row 32-bit tf-weighted SimHash signature (see
  * [[ArrayOps.simhash32]]). */
case class Simhash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("simhash32 requires STRING")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayOps.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

/** `ahash16(text)`: 16-bit average perceptual hash of a payload's code-point
  * stream (see [[ArrayOps.ahash16]]) — map-side media near-dup signature. */
case class Ahash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "ahash16"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("ahash16 requires STRING")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.ahash16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayOps.ahash16($c)")

  override protected def withNewChildInternal(newChild: Expression): Ahash16 =
    copy(child = newChild)
}

/** `upper_products(vec)`: upper-triangle outer-product stream of an
  * array&lt;float&gt; — array of struct(i, j, p) (see
  * [[ArrayOps.upperProducts]]) — the map-side Gram/covariance feed. */
case class UpperProducts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("p", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "upper_products"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure("upper_products requires array<float>")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.upperProducts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrayOps.upperProducts($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): UpperProducts =
    copy(child = newChild)
}

/** `zorder2(x, y)`: Morton/Z-order bit-interleave of two bigint dimension
  * values (see [[ArrayOps.zorder2]]) — the space-filling-curve key for
  * multi-dimensional data layout. */
case class Zorder2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("zorder2 requires two BIGINT arguments")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayOps.zorder2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayOps.zorder2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Zorder2 =
    copy(left = newLeft, right = newRight)
}

/** `q8_stats(vec)`: symmetric-int8 quantization round-trip stats of an
  * array&lt;float&gt; — struct(max_abs, errs) (see [[ArrayOps.q8Stats]]). */
case class Q8Stats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("max_abs", DoubleType, nullable = false),
    StructField("errs", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "q8_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("q8_stats requires array<float>")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.q8Stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrayOps.q8Stats($c);
    """)

  override protected def withNewChildInternal(newChild: Expression): Q8Stats =
    copy(child = newChild)
}

/** `winnow_hashes(text, n, w)`: distinct sorted winnowing fingerprints of a
  * text — window-w minima over the md5 hashes of its positional word
  * n-grams (see [[ArrayOps.winnowHashes]]). */
case class WinnowHashes(child: Expression, n: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if n > 0 && w > 0 => TypeCheckResult.TypeCheckSuccess
      case StringType =>
        TypeCheckResult.TypeCheckFailure(s"winnow_hashes requires n > 0 and w > 0, got n=$n w=$w")
      case _ => TypeCheckResult.TypeCheckFailure("winnow_hashes requires STRING")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.winnowHashes(input.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrayOps.winnowHashes($c, $n, $w);
    """)

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}

/** `cdc_chunk_hashes(text, divisor)`: md5 of each content-defined chunk in
  * document order — boundaries where u32(md5(token)) % divisor == 0 (see
  * [[ArrayOps.cdcChunkHashes]]). */
case class CdcChunkHashes(child: Expression, divisor: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_chunk_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if divisor > 0 => TypeCheckResult.TypeCheckSuccess
      case StringType =>
        TypeCheckResult.TypeCheckFailure(s"cdc_chunk_hashes requires divisor > 0, got $divisor")
      case _ => TypeCheckResult.TypeCheckFailure("cdc_chunk_hashes requires STRING")
    }

  override protected def nullSafeEval(input: Any): Any =
    ArrayOps.cdcChunkHashes(input.asInstanceOf[UTF8String], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrayOps.cdcChunkHashes($c, $divisor);
    """)

  override protected def withNewChildInternal(newChild: Expression): CdcChunkHashes =
    copy(child = newChild)
}
