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

  // ---- real codec fixtures (binary files in src/test/resources) ----------

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/$name")
    try in.readAllBytes() finally in.close()
  }

  private def bt601(r: Int, g: Int, b: Int): Float =
    ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat

  test("decodeImages decodes a real BMP fixture (dims from the file, BT.601 luma, bottom-up rows)") {
    val sp = spark
    import sp.implicits._
    // metadata says 9x9 — the FILE says 4x3 and the file must win
    val ds = Seq(MediaRow(1, "image", fixture("fixture.bmp"), "image/bmp", 9, 9, 0)).toDS()
    val out = decodeImages(ds).collect()(0)
    assert(out.width == 4 && out.height == 3)
    assert(math.abs(out.pixels(0) - bt601(255, 0, 0)) < 1e-6) // top-left red
    assert(math.abs(out.pixels(3) - 1.0f) < 1e-6) // top-right white
    assert(math.abs(out.pixels(2 * 4) - bt601(10, 20, 30)) < 1e-6) // bottom-left
  }

  test("decodeImages decodes a real PPM fixture (P6, header comments)") {
    val sp = spark
    import sp.implicits._
    val ds = Seq(MediaRow(2, "image", fixture("fixture.ppm"), "image/x-portable-pixmap", 0, 0, 0)).toDS()
    val out = decodeImages(ds).collect()(0)
    assert(out.width == 3 && out.height == 2)
    assert(math.abs(out.pixels(0) - bt601(255, 0, 0)) < 1e-6)
    assert(math.abs(out.pixels(5) - 128.0f / 255.0f) < 1e-6) // bottom-right gray
  }

  test("decodeAudio decodes a real WAV fixture (PCM16 mono ramp)") {
    val sp = spark
    import sp.implicits._
    val ds = Seq(
      MediaRow(3, "audio", fixture("fixture.wav"), "audio/wav", 0, 0, 2),
      MediaRow(4, "audio", Array[Byte](1, 2, 3), "audio/unknown", 0, 0, 2)).toDS()
    val out = decodeAudio(ds).collect()
    assert(out.map(_.media_id).toSeq == Seq(3L)) // unparseable audio skipped
    val a = out(0)
    assert(a.sampleRate == 8000 && a.channels == 1 && a.samples.length == 16)
    (0 until 16).foreach(i => assert(math.abs(a.samples(i) - i * 1000 / 32768.0f) < 1e-6))
  }

  test("sampleFrames decodes a real Y4M fixture and histograms the right frame per timestamp") {
    val sp = spark
    import sp.implicits._
    // 3 frames at 25 fps (constant luma 0, 128, 255) -> 120 ms duration
    val ds = Seq(MediaRow(5, "video", fixture("fixture.y4m"), "video/x-yuv4mpeg", 4, 4, 0)).toDS()
    val out = sampleFrames(ds, everyMs = 40, bins = 16).collect().sortBy(_.frameIdx)
    assert(out.length == 3)
    assert(out.map(_.tsMs).toSeq == Seq(0L, 40L, 80L))
    assert(out(0).feature(0) == 1.0f) // all-black frame -> bin 0
    assert(out(1).feature((128 * 16) / 256) == 1.0f) // mid-gray frame -> bin 8
    assert(out(2).feature(15) == 1.0f) // all-white frame -> clamped top bin
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
