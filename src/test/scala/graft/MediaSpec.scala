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
}
