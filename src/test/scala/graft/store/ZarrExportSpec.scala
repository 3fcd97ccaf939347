package graft.store

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{GZIPInputStream, ZipFile}

import graft.SparkSpec

/** S6 zarr v2 byte-level interop (archiver.py:542-608): the written zip /
  * directory must be openable by any standard zarr v2 reader, so these
  * tests re-implement the READ side (gunzip + little-endian decode +
  * metadata parse) independently and check bytes, not round-trips through
  * the writer's own code.
  */
class ZarrExportSpec extends SparkSpec {
  import spark.implicits._

  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b))
    try in.readAllBytes() finally in.close()
  }

  private def doubles(b: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(gunzip(b)).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(bb.remaining() / 8)(bb.getDouble)
  }

  private def samples = Seq(
    // numeric PV, 10 points -> 3 chunks at chunkElems=4
    ("XX:m1.VAL", 1000000L, "1.5"), ("XX:m1.VAL", 2000000L, "2.5"),
    ("XX:m1.VAL", 3000000L, "3.0"), ("XX:m1.VAL", 4000000L, "4.25"),
    ("XX:m1.VAL", 5000000L, "5.0"), ("XX:m1.VAL", 6000000L, "6.0"),
    ("XX:m1.VAL", 7000000L, "7.0"), ("XX:m1.VAL", 8000000L, "8.0"),
    ("XX:m1.VAL", 9000000L, "9.0"), ("XX:m1.VAL", 10000000L, "10.5"),
    // string PV: one non-numeric value flips the whole array to |S<w>
    ("XX:status", 1500000L, "OK"), ("XX:status", 2500000L, "3.5"),
    ("XX:status", 3500000L, "FAULT")
  ).toDF("pvname", "tsUs", "value")

  private def meta = Seq(
    ("XX:m1.VAL", "motor 1", "double", 5.0, 0.1, "12.5", "-1.5", "normal"),
    ("XX:status", "status word", "string", 10.0, 0.0, "not-a-number", "", "discrete")
  ).toDF("pvname", "description", "type", "deadtime", "deadband",
    "graph_hi", "graph_lo", "graph_type")

  test("zip store: layout, metadata, and chunk bytes decode as zarr v2") {
    val file = Files.createTempDirectory("graft_zarr").resolve("run.zip").toString
    ZarrExport.exportZipStore(samples, file, Some(meta), chunkElems = 4)
    val zf = new ZipFile(file)
    try {
      def entry(p: String): Array[Byte] = {
        val e = zf.getEntry(p)
        assert(e != null, s"missing zip entry $p")
        zf.getInputStream(e).readAllBytes()
      }
      def text(p: String) = new String(entry(p), StandardCharsets.UTF_8)

      assert(text(".zgroup").contains("\"zarr_format\":2"))
      assert(text("pvarch/.zgroup").contains("\"zarr_format\":2"))
      assert(text("pvarch/XX:m1.VAL/.zgroup").contains("\"zarr_format\":2"))

      // attrs: reference keys, graph_hi float-coerced, unparseable -> ""
      val attrs = text("pvarch/XX:m1.VAL/.zattrs")
      assert(attrs.contains("\"description\":\"motor 1\""))
      assert(attrs.contains("\"deadtime\":5.0") && attrs.contains("\"deadband\":0.1"))
      assert(attrs.contains("\"graph_hi\":12.5") && attrs.contains("\"graph_lo\":-1.5"))
      val sAttrs = text("pvarch/XX:status/.zattrs")
      assert(sAttrs.contains("\"graph_hi\":\"\"") && sAttrs.contains("\"graph_lo\":\"\""))

      // ts array: float seconds, 3 gzip chunks of <f8
      val tsMeta = text("pvarch/XX:m1.VAL/ts/.zarray")
      assert(tsMeta.contains("\"dtype\":\"<f8\"") && tsMeta.contains("\"shape\":[10]")
        && tsMeta.contains("\"chunks\":[4]")
        && tsMeta.contains("\"compressor\":{\"id\":\"gzip\",\"level\":1}"))
      // every chunk (incl. the last) decodes to the FULL chunk shape, as a
      // zarr reader's chunk.reshape(chunks) requires; the array shape
      // slices the zero-filled tail away
      val tsChunks = Seq("0", "1", "2").map(c => doubles(entry(s"pvarch/XX:m1.VAL/ts/$c")))
      assert(tsChunks.forall(_.length == 4))
      assert(tsChunks.flatten.take(10) == (1 to 10).map(_.toDouble))
      assert(tsChunks.flatten.drop(10).forall(_ == 0.0)) // fill tail

      // all-numeric data -> <f8
      val d = Seq("0", "1", "2").flatMap(c => doubles(entry(s"pvarch/XX:m1.VAL/data/$c")))
      assert(d.take(10) == Seq(1.5, 2.5, 3.0, 4.25, 5.0, 6.0, 7.0, 8.0, 9.0, 10.5))

      // mixed values -> |S5 ("FAULT"), null-padded fixed width + fill tail
      val sMeta = text("pvarch/XX:status/data/.zarray")
      assert(sMeta.contains("\"dtype\":\"|S5\"") && sMeta.contains("\"shape\":[3]"))
      val full = gunzip(entry("pvarch/XX:status/data/0"))
      assert(full.length == 20) // chunkElems * width, zero-filled past n
      assert(full.drop(15).forall(_ == 0))
      val raw = full.take(15)
      assert(new String(raw, StandardCharsets.UTF_8) ==
        "OK\u0000\u0000\u00003.5\u0000\u0000FAULT")

      // STORED zip entries (zarr.ZipStore convention: no double compression)
      assert(zf.getEntry("pvarch/XX:m1.VAL/ts/0").getMethod == java.util.zip.ZipEntry.STORED)
    } finally zf.close()
  }

  test("wide string values shrink the data chunk length instead of exploding the buffer") {
    val sp = spark
    import sp.implicits._
    val wide = "x" * 3000 // non-numeric -> |S3000
    val df = Seq(("W:pv", 1000000L, wide), ("W:pv", 2000000L, "short"))
      .toDF("pvname", "tsUs", "value")
    val dir = Files.createTempDirectory("graft_zarr_wide").toString
    // default chunkElems (256 Ki): a width-scaled chunk would be 750 MiB
    ZarrExport.exportDirectoryStore(df, dir, None)
    val meta = new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "pvarch/W:pv/data/.zarray")), StandardCharsets.UTF_8)
    val chunkLen = "\"chunks\":\\[(\\d+)\\]".r.findFirstMatchIn(meta).get.group(1).toInt
    assert(chunkLen == (2 << 20) / 3000, meta) // ~2 MiB budget / width
    val raw = gunzip(Files.readAllBytes(java.nio.file.Paths.get(dir, "pvarch/W:pv/data/0")))
    assert(raw.length == chunkLen * 3000)
    assert(new String(raw, 0, 3000, StandardCharsets.UTF_8) == wide)
  }

  test("directory store: distributed writer produces the same zarr v2 bytes") {
    val dir = Files.createTempDirectory("graft_zarr_dir").toString
    ZarrExport.exportDirectoryStore(samples, dir, Some(meta), chunkElems = 4)
    def read(p: String) = Files.readAllBytes(java.nio.file.Paths.get(dir, p))
    def text(p: String) = new String(read(p), StandardCharsets.UTF_8)
    assert(text(".zgroup").contains("\"zarr_format\":2"))
    assert(text("pvarch/XX:m1.VAL/ts/.zarray").contains("\"shape\":[10]"))
    val ts = doubles(read("pvarch/XX:m1.VAL/ts/0")) ++
      doubles(read("pvarch/XX:m1.VAL/ts/1")) ++
      doubles(read("pvarch/XX:m1.VAL/ts/2"))
    assert(ts.length == 12 && ts.take(10).toSeq == (1 to 10).map(_.toDouble))
    assert(text("pvarch/XX:status/data/.zarray").contains("\"dtype\":\"|S5\""))
    assert(gunzip(read("pvarch/XX:status/data/0")).length == 20)
    // missing meta row -> empty attrs object, still valid JSON
    val noMeta = Files.createTempDirectory("graft_zarr_dir2").toString
    ZarrExport.exportDirectoryStore(samples.limit(2), noMeta, None, chunkElems = 4)
    assert(text(".zgroup").nonEmpty)
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(noMeta, "pvarch/XX:m1.VAL/.zattrs")),
      StandardCharsets.UTF_8).startsWith("{"))
    // the staged-commit protocol must leave no _stage-* litter behind
    assert(!listNames(dir).exists(_.startsWith("_stage-")))
  }

  test("path-shaped pvnames are rejected before they touch the store layout") {
    val sp = spark
    import sp.implicits._
    for (bad <- Seq("a/b", "../escape", "..", ".", "a/../../b")) {
      val df = Seq((bad, 1000000L, "1.0")).toDF("pvname", "tsUs", "value")
      val dir = Files.createTempDirectory("graft_zarr_bad").toString
      val e = intercept[org.apache.spark.SparkException] {
        ZarrExport.exportDirectoryStore(df, dir, None, chunkElems = 4)
      }
      assert(e.getMessage.contains("not usable") ||
        Option(e.getCause).exists(_.getMessage.contains("not usable")), bad)
      // nothing escaped or half-committed under pvarch/ (Hadoop's local FS
      // adds .crc checksum sidecars; those aren't store content)
      assert(!listNames(dir, "pvarch")
        .exists(n => n != ".zgroup" && !n.endsWith(".crc")))
    }
    // reserved zarr metadata names must be rejected like path shapes
    intercept[org.apache.spark.SparkException] {
      ZarrExport.exportDirectoryStore(
        Seq((".zgroup", 1000000L, "1.0")).toDF("pvname", "tsUs", "value"),
        Files.createTempDirectory("graft_zarr_badmeta").toString, None, chunkElems = 4)
    }
    intercept[IllegalArgumentException] {
      ZarrExport.exportZipStore(
        Seq(("x/y", 1000000L, "1.0")).toDF("pvname", "tsUs", "value"),
        Files.createTempDirectory("graft_zarr_badzip").resolve("z.zip").toString)
    }
  }

  test("re-export replaces the previous store's groups instead of nesting into them") {
    val sp = spark
    import sp.implicits._
    val dir = Files.createTempDirectory("graft_zarr_rerun").toString
    val v1 = Seq(("RR:pv", 1000000L, "1.0"), ("RR:old", 1000000L, "2.0"))
      .toDF("pvname", "tsUs", "value")
    ZarrExport.exportDirectoryStore(v1, dir, None, chunkElems = 4)
    val v2 = Seq(("RR:pv", 1000000L, "9.0")).toDF("pvname", "tsUs", "value")
    ZarrExport.exportDirectoryStore(v2, dir, None, chunkElems = 4)
    // no nested RR:pv/RR:pv, the dropped PV is gone, and the data is v2's
    assert(listNames(dir, "pvarch").filterNot(_.endsWith(".crc")).sorted ==
      Seq(".zgroup", "RR:pv"))
    assert(!Files.exists(java.nio.file.Paths.get(dir, "pvarch/RR:pv/RR:pv")))
    val data = doubles(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "pvarch/RR:pv/data/0")))
    assert(data(0) == 9.0, data.toSeq)
  }

  test("readDirectoryStore round-trips the exported store distributed") {
    val dir = Files.createTempDirectory("graft_zarr_read").toString
    ZarrExport.exportDirectoryStore(samples, dir, Some(meta), chunkElems = 4)
    val got = ZarrExport.readDirectoryStore(spark, dir)
      .orderBy("pvname", "idx").collect()
      .map(r => (r.getAs[String]("pvname"), r.getAs[Long]("idx"),
        r.getAs[Double]("ts"), Option(r.getAs[java.lang.Double]("dvalue")),
        Option(r.getAs[String]("value"))))
    val numeric = got.filter(_._1 == "XX:m1.VAL")
    assert(numeric.length == 10)
    assert(numeric.map(_._3).toSeq == (1 to 10).map(_.toDouble))
    assert(numeric.map(_._4.get).toSeq ==
      Seq(1.5, 2.5, 3.0, 4.25, 5.0, 6.0, 7.0, 8.0, 9.0, 10.5))
    assert(numeric.forall(_._5.isEmpty)) // f8 data -> dvalue only
    val str = got.filter(_._1 == "XX:status")
    assert(str.map(_._5.get).toSeq == Seq("OK", "3.5", "FAULT"))
    assert(str.forall(_._4.isEmpty)) // |S data -> value only
    // no RDD scans, no global windows: the read plan is file-scan based
    val lint = graft.plans.PlanLint.lint(ZarrExport.readDirectoryStore(spark, dir))
    assert(!lint.exists(f => f.rule == "driver-materialized-input" ||
      f.rule == "global-window"), lint.toString)
  }

  test("readZipStore equals readDirectoryStore on the same samples") {
    val zip = Files.createTempDirectory("graft_zarr_zip_rt").resolve("s.zip").toString
    val dir = Files.createTempDirectory("graft_zarr_dir_rt").toString
    ZarrExport.exportZipStore(samples, zip, Some(meta), chunkElems = 4)
    ZarrExport.exportDirectoryStore(samples, dir, Some(meta), chunkElems = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("pvname", "idx").collect().map(_.toSeq).toSeq
    assert(rows(ZarrExport.readZipStore(spark, zip)) ==
      rows(ZarrExport.readDirectoryStore(spark, dir)))
  }

  test(".zattrs round-trip: reader attrs == writer metaMap, both store layouts") {
    val sp = spark
    import sp.implicits._
    // descriptions exercise the JSON escapes both directions (quote,
    // backslash, newline, a control char); graph_hi/lo exercise the
    // float-or-'' coercion (archiver.py:566-574) surfacing as null
    val trickyMeta = Seq(
      ("XX:m1.VAL", "he said \"go\"\nline2\\end", "double",
        5.0, 0.1, "12.5", "-1.5", "normal"),
      ("XX:status", "status word", "string", 10.0, 0.0,
        "not-a-number", "", "discrete")
    ).toDF("pvname", "description", "type", "deadtime", "deadband",
      "graph_hi", "graph_lo", "graph_type")
    val base = Files.createTempDirectory("graft_zarr_attrs")
    val dir = base.resolve("store").toString
    val zip = base.resolve("run.zip").toString
    ZarrExport.exportDirectoryStore(samples, dir, Some(trickyMeta), chunkElems = 4)
    ZarrExport.exportZipStore(samples, zip, Some(trickyMeta), chunkElems = 4)
    val expected = Seq(
      ("XX:m1.VAL", 0.1, 5.0, "he said \"go\"\nline2\\end",
        Option(12.5), Option(-1.5), "normal", "double"),
      ("XX:status", 0.0, 10.0, "status word",
        Option.empty[Double], Option.empty[Double], "discrete", "string"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("pvname").collect().map(r => (
        r.getAs[String]("pvname"), r.getAs[Double]("deadband"),
        r.getAs[Double]("deadtime"), r.getAs[String]("description"),
        Option(r.getAs[java.lang.Double]("graph_hi")).map(_.doubleValue),
        Option(r.getAs[java.lang.Double]("graph_lo")).map(_.doubleValue),
        r.getAs[String]("graph_type"), r.getAs[String]("type"))).toSeq
    assert(rows(ZarrExport.readDirectoryStoreAttrs(spark, dir)) == expected)
    assert(rows(ZarrExport.readZipStoreAttrs(spark, zip)) == expected)
  }

  test("sliceWindow reproduces the reference's i0/i1 quirks") {
    val sp = spark
    import sp.implicits._
    // pv 'a': rows before tmin exist at idx 3 -> i0 = 2 (one EXTRA back);
    // pv 'b': nothing before tmin -> the reference's bare `except: i0 = 1`
    //         is itself decremented by the `if i0 > 0: i0 -= 1` that runs
    //         AFTER the except (archiver.py:160-165), so i0 = 0 and row 0
    //         is KEPT (r10 ADVICE fix);
    // pv 'c': nothing before tmax either -> i1 = n (everything from i0)
    val df = Seq(
      ("a", 0L, 10.0), ("a", 1L, 20.0), ("a", 2L, 30.0), ("a", 3L, 40.0),
      ("a", 4L, 50.0), ("a", 5L, 60.0), ("a", 6L, 70.0),
      ("b", 0L, 45.0), ("b", 1L, 55.0), ("b", 2L, 58.0),
      ("c", 0L, 90.0), ("c", 1L, 95.0)
    ).toDF("pvname", "idx", "ts")
    val got = ZarrExport.sliceWindow(df, tmin = 45.0, tmax = 60.0)
      .orderBy("pvname", "ts").collect()
      .map(r => (r.getAs[String]("pvname"), r.getAs[Double]("ts"))).toSeq
    assert(got == Seq(
      ("a", 30.0), ("a", 40.0), ("a", 50.0),      // i0=2 (3-1), i1=4
      ("b", 45.0), ("b", 55.0), ("b", 58.0),      // i0=0 (1-1), i1=2
      ("c", 90.0), ("c", 95.0)))                  // i0=0, i1=n=2
  }

  /** Immediate file names under dir/parts, with the Files.list stream
    * closed (its javadoc requires it).
    */
  private def listNames(dir: String, parts: String*): Seq[String] = {
    val s = Files.list(java.nio.file.Paths.get(dir, parts: _*))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).toList
    } finally s.close()
  }
}
