package graft.operators

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {

  private def media(id: Long, kind: String, n: Int, w: Int = 4, h: Int = 3, durMs: Long = 0) =
    MediaRow(id, kind, Array.tabulate(n)(i => ((i * 37 + id) % 251).toByte), s"x/$kind", w, h, durMs)

  test("decodeImages emits a WxH plane per image row, deterministic") {
    val sp = spark
    import sp.implicits._
    val ds = Seq(media(1, "image", 64), media(2, "audio", 64), media(3, "image", 0)).toDS()
    val out = decodeImages(ds).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 3L)) // non-images filtered
    assert(out.forall(d => d.pixels.length == d.width * d.height))
    val again = decodeImages(ds).collect().sortBy(_.media_id)
    assert(out.zip(again).forall { case (a, b) => a.pixels.sameElements(b.pixels) })
  }

  test("extractFeatures: fixed-width normalized histograms for every kind") {
    val sp = spark
    import sp.implicits._
    val ds = Seq(media(1, "image", 100), media(2, "audio", 50), media(3, "video", 10, durMs = 1000)).toDS()
    val out = extractFeatures(ds, bins = 16).collect()
    assert(out.length == 3)
    assert(out.forall(_.feature.length == 16))
    out.filter(_.media_id != 3).foreach(f => assert(math.abs(f.feature.sum - 1.0f) < 1e-3))
  }

  test("resize produces exact nearest-neighbor planes") {
    val sp = spark
    import sp.implicits._
    val ds = Seq(media(1, "image", 64, w = 4, h = 4)).toDS()
    val out = Multimodal.resize(Multimodal.decodeImages(ds), outW = 2, outH = 2).collect()(0)
    assert(out.width == 2 && out.height == 2 && out.pixels.length == 4)
    val src = Multimodal.decodeImages(ds).collect()(0).pixels
    // nearest-neighbor at scale 2: rows/cols 0 and 2 of the 4x4 source
    assert(out.pixels.toSeq == Seq(src(0), src(2), src(8), src(10)))
  }

  test("sampleFrames explodes videos into per-timestamp frame features") {
    val sp = spark
    import sp.implicits._
    val ds = Seq(media(7, "video", 200, durMs = 950), media(8, "image", 10)).toDS()
    val out = sampleFrames(ds, everyMs = 100).collect().sortBy(_.frameIdx)
    assert(out.forall(_.media_id == 7L)) // images not frame-sampled
    assert(out.length == 9) // 950ms / 100ms
    assert(out.map(_.tsMs).toSeq == (0 until 9).map(_ * 100L))
    assert(out.forall(_.feature.length == 16))
  }

  test("mediaStats aggregates metadata without touching payloads") {
    val sp = spark
    import sp.implicits._
    val df = Seq(media(1, "image", 100), media(2, "image", 200), media(3, "audio", 50)).toDF()
    val stats = mediaStats(df).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(stats.toSeq == Seq(("audio", 1L, 50L), ("image", 2L, 300L)))
  }
}
