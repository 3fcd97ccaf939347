package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Export
import graft.store.SampleStore
import graft.streaming.Downsampler
import graft.streaming.Downsampler.{PvConfig, RawSample}

/** SURVEY §5.3 golden path: synthetic CA event log → T2 downsampler →
  * partitioned store → Archive.getData → ASCII export, each hop checked
  * against hand-computed expectations.
  */
class EndToEndSpec extends SparkSpec {

  private val S = 1000000L
  private val runWidth = 3600L * S // 1h runs

  test("ingest -> downsample -> store -> getData -> export") {
    val sp = spark
    import sp.implicits._
    Engine.tune(sp)

    // one fast double PV (sub-deadtime bursts -> limbo), one slow string PV
    val events =
      (0 until 120).map { i => // every 2s for 4min, big moves
        RawSample("E2E:fast.VAL", i * 2 * S, (i * 10.0).toString, (i * 10.0).toString)
      } ++ Seq(
        RawSample("E2E:mode.VAL", 0, "Idle", "Idle"),
        RawSample("E2E:mode.VAL", 100 * S, "Running", "Running"))

    val cfg = Map(
      "E2E:fast.VAL" -> PvConfig("double", 5 * S, 0.5),
      "E2E:mode.VAL" -> PvConfig("string", 1 * S, 0.0))

    // T2 downsampler: fast PV reduced ~3x (emit + limbo per ~6s), mode kept
    val archived = Downsampler.replayBatch(events.toDS(), cfg).collect().toVector
    val fast = archived.filter(_.pvname == "E2E:fast.VAL").sortBy(_.tsUs)
    assert(fast.size < 90 && fast.size > 30, s"got ${fast.size}")
    assert(archived.count(_.pvname == "E2E:mode.VAL") == 2)

    // store: normalize + partitioned write
    val dir = Files.createTempDirectory("graft_e2e").toString
    val raw = archived.toDF()
      .select(col("pvname"), col("tsUs"), col("value"), col("cvalue"))
    SampleStore.write(SampleStore.normalize(raw, runWidth), dir)

    // query through the facade with the latest-value cache unioned in
    val samples = SampleStore.read(sp, dir)
    val cache = Seq(("E2E:fast.VAL", 300 * S, "9999.0")).toDF("pvname", "tsUs", "value")
    val archive = new Archive(samples.select(col("pvname"), col("tsUs"), col("value")), Some(cache))
    val got = archive.getData("E2E:fast.VAL", 60 * S, 301 * S, withCurrent = Some(true), nowUs = 300 * S)
      .collect().map(r => (r.getAs[Long]("tsUs"), r.getAs[String]("value")))
    // one point before tmin, all archived in range, then the cache row last
    assert(got.head._1 < 60 * S)
    assert(got.last == ((300 * S, "9999.0")))
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    val inRange = fast.filter(s => s.tsUs >= 60 * S && s.tsUs < 238 * S).map(_.tsUs)
    assert(inRange.forall(ts => got.exists(_._1 == ts)))

    // export: fixed-width rows parse back to the same timestamps
    val lines = Export.asciiRows(
      archive.getData("E2E:fast.VAL", 60 * S, 120 * S)
        .withColumn("dvalue", col("value").cast("double")),
      "tsUs", "dvalue").as[String].collect()
    assert(lines.nonEmpty)
    lines.foreach { l =>
      assert(l.matches("""\d+\.\d{6} +[\d.e+-]+ \d{8} \d{6}"""), l)
    }
  }
}
