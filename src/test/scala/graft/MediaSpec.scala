package graft

import graft.multimodal.Media

/** Multimodal plumbing: the typed mapPartitions feature pass must agree with
  * its relational oracle twin row-for-row, and the stub decoder must be
  * total (empty payloads included). */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  test("mapPartitions decode pass matches the relational twin") {
    val typed = Media.extractFeatures(Media.fromDocuments(spark, fixtureDir))
      .collect()
      .map(f => f.media_id -> ((f.kind, f.n_bytes, f.width, f.height, f.brightness)))
      .toMap
    val relational = Media.qMediaFeatures.run(spark, fixtureDir)
      .select($"media_id", $"kind", $"n_bytes", $"width", $"height", $"brightness")
      .as[(Long, String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4.toInt, r._5.toInt, r._6)))
      .toMap
    assert(typed.view.mapValues(v => (v._1, v._2, v._3, v._4, v._5)).toMap
      === relational)
  }

  test("kind assignment cycles deterministically by id") {
    val kinds = Media.fromDocuments(spark, fixtureDir).collect()
      .map(r => r.media_id -> r.kind).toMap
    assert(kinds(0L) === "image" && kinds(1L) === "audio" && kinds(2L) === "video")
    assert(kinds(3L) === "image")
  }

  test("decode stub is total: empty payload yields zero brightness") {
    assert(Media.decodeStub(Array.emptyByteArray) === ((1, 1, 3, 0.0)))
  }

  test("resize plan fits the box, preserves aspect, never hits zero") {
    val rows = Media.qMediaResize.run(spark, fixtureDir)
      .select($"width", $"height", $"out_width", $"out_height")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, h, ow, oh) =>
      assert(ow >= 1 && oh >= 1 && ow <= Media.FitBox && oh <= Media.FitBox)
      // the longer side hits the box (within floor slack)
      assert(math.max(ow, oh) >= Media.FitBox - 1 ||
        (w <= Media.FitBox && h <= Media.FitBox))
      // aspect preserved within one floor step
      assert(math.abs(ow * h - oh * w) <= w + h)
    }
  }

  test("frame sampling emits dur+1 frames for video media only") {
    val frames = Media.qMediaFrames.run(spark, fixtureDir)
      .as[(Long, Long, Long)].collect()
    // fixture videos: doc_id % 3 == 2 -> docs 2 and 5
    assert(frames.map(_._1).distinct.sorted === Seq(2L, 5L))
    frames.groupBy(_._1).foreach { case (_, fs) =>
      val idxs = fs.map(_._2).sorted
      assert(idxs === (0L until idxs.length).toSeq)  // contiguous from 0
      assert(fs.forall(f => f._3 === f._2 * 1000))
    }
  }

  test("shardAssign lays out blocks by byte budget within each kind") {
    val media = Seq(
      (1L, "image", 10L), (2L, "image", 5L), (3L, "image", 4L),
      (4L, "audio", 20L), (5L, "audio", 1L))
      .toDF("media_id", "kind", "n_bytes")
    val got = Media.shardAssign(media, 16L)
      .orderBy($"media_id")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "image", 10L, 0L, 0L),   // bytes_before 0
      (2L, "image", 5L, 0L, 10L),   // 10
      (3L, "image", 4L, 0L, 15L),   // starts at 15 and STRADDLES into block 1
      (4L, "audio", 20L, 0L, 0L),   // oversized object spans blocks 0-1
      (5L, "audio", 1L, 1L, 4L)))   // 20 -> block 1, offset 4
  }

  test("q_media_shards: offsets reconstruct the running sum on the fixture") {
    val rows = Media.qMediaShards.run(spark, fixtureDir)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) === Seq(0L, 1L, 2L, 3L, 4L, 5L))
    rows.groupBy(_._2).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_._1).foreach { case (_, _, nb, sid, off) =>
        assert(sid === cum / Media.ShardBytes && off === cum % Media.ShardBytes)
        cum += nb
      }
    }
  }

  /** Plain-Scala replica of ahash16 (independent of ArrayOps' loop). */
  private def ahashModel(s: String): Long = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0L
    val sums = new Array[Long](16); val cnts = new Array[Long](16)
    for ((cp, p) <- cps.zipWithIndex) {
      val b = (p.toLong * 16 / n).toInt
      sums(b) += cp; cnts(b) += 1
    }
    val total = cps.map(_.toLong).sum
    (0 until 16).foldLeft(0L) { (h, b) =>
      if (cnts(b) > 0 && BigInt(sums(b)) * n > BigInt(total) * cnts(b))
        h | (1L << b)
      else h
    }
  }

  test("ahash16 law: expression equals the block-mean model; edge cases") {
    val texts = Seq("", "a", "aaaa", "fast fast slow",
      "abcdefghijklmnopqrstuvwxyz0123456789", "zz " * 40,
      (1 to 30).map(i => s"w$i").mkString(" "))
    val got = texts.toDF("t")
      .selectExpr("ahash16(t)").as[Long].collect().toSeq
    assert(got === texts.map(ahashModel))
    // uniform payloads (every block mean == global mean) hash to 0
    assert(ahashModel("aaaa") === 0L)
    // hash is 16-bit
    assert(got.forall(h => h >= 0L && h < 65536L))
  }

  test("q_media_phash_dedup: banded recall equals brute force at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val sig = Tables.documents(spark, dir)
      .selectExpr("doc_id",
        "element_at(array('image','audio','video'), cast(doc_id % 3 + 1 as int)) AS kind",
        "ahash16(text) AS ah")
      .as[(Long, String, Long)].collect().toSeq
    val brute = (for {
      (ia, ka, ha) <- sig; (ib, kb, hb) <- sig
      if ia < ib && ka == kb
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= Media.PhashHamming
    } yield (ia, ib, ka, d.toLong)).sortBy(p => (p._1, p._2))
    val got = Media.qMediaPhashDedup.run(spark, dir)
      .as[(Long, Long, String, Long)].collect().toSeq
    // 4×4-bit bands over radius 3: pigeonhole guarantees zero false
    // negatives, and the exact verify removes all false positives
    assert(got === brute)
    assert(got.nonEmpty) // the tiny-vocab corpus must surface near-dups
  }

  test("q_pack_multimodal equals an independent plain-Scala cost+pack model") {
    def cost(id: Long, text: String): (String, Long, Long) = {
      val n = text.getBytes("UTF-8").length
      val kinds = Seq("image", "audio", "video")
      val kind = kinds((id % 3).toInt)
      val w = (n % 640 + 1).toDouble
      val h = ((n.toLong * 7) % 480 + 1).toDouble
      val scale = math.min(224.0 / w, 224.0 / h)
      val outW = math.max(1L, math.floor(w * scale).toLong)
      val outH = math.max(1L, math.floor(h * scale).toLong)
      val patches = ((outW + 15) / 16) * ((outH + 15) / 16)
      val durS = n / 100
      val media = kind match {
        case "image" => patches
        case "audio" => durS * Media.TokensPerAudioSecond
        case _       => (durS + 1) * patches
      }
      (kind, text.split("\\s+").length.toLong, media)
    }
    val costed = SparkSpec.fixtureDocs.map { case (id, text, lang, _) =>
      val (kind, t, m) = cost(id, text)
      (id, lang, kind, t, m, t + m)
    }
    val expected = costed.groupBy(_._2).values.flatMap { rows =>
      rows.sortBy(_._1).scanLeft((0L, 0L, "", "", 0L, 0L, 0L)) {
        case ((cum, _, _, _, _, _, tokPrev), (id, lang, kind, t, m, tot)) =>
          (cum + tokPrev, id, lang, kind, t, m, tot)
      }.drop(1).map { case (cum, id, lang, kind, t, m, tot) =>
        (id, lang, kind, t, m, tot,
          cum / Media.MMPackTokens, cum % Media.MMPackTokens)
      }
    }.toSeq.sortBy(_._1)
    val got = Media.qPackMultimodal.run(spark, fixtureDir)
      .as[(Long, String, String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === expected)
    // fixture sanity: all three modalities appear, and every sample's
    // media cost is positive (an image is never 0 patches)
    assert(got.map(_._3).distinct.sorted === Seq("audio", "image", "video"))
    assert(got.filter(_._3 != "audio").forall(_._5 > 0))
  }

}
