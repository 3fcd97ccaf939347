package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * Codecs: one REAL pure-JVM decoder per modality lives in [[Codecs]] —
  * BMP/PPM images, WAV PCM16 audio, Y4M raw video — detected by magic
  * bytes. Compressed formats (JPEG/PNG/MP3/H.264) would need native
  * libraries this environment doesn't ship; payloads that aren't a
  * recognized format fall back to the clearly-marked deterministic
  * [[StubCodec]] so synthetic testdata keeps flowing through the same
  * operator shapes.
  *
  * Scale shape: every operator is `mapPartitions` (no per-row JNI/codec
  * setup — one codec instance per partition, amortized), binary payloads
  * never shuffle except for the explicit `repartition` the caller asks for,
  * and feature extraction emits fixed-width float arrays that downstream
  * [[Similarity]] ops consume.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      durationMs: Long)

  case class DecodedImage(media_id: Long, width: Int, height: Int, pixels: Array[Float])

  case class MediaFeature(media_id: Long, kind: String, feature: Array[Float])

  case class VideoFrame(media_id: Long, frameIdx: Int, tsMs: Long, feature: Array[Float])

  /** STUB codec — deterministic fake in place of a real decoder.
    * `decodeImage` "decodes" payload bytes into a WxH luma plane by cycling
    * the payload; a real implementation would call an image library here.
    */
  object StubCodec {
    // ??? real codec goes here — deterministic fake for tests/plumbing:
    def decodeImage(payload: Array[Byte], w: Int, h: Int): Array[Float] = {
      val n = math.max(w * h, 1)
      val out = new Array[Float](n)
      if (payload.isEmpty) return out
      var i = 0
      while (i < n) {
        out(i) = (java.lang.Byte.toUnsignedInt(payload(i % payload.length)) / 255.0f)
        i += 1
      }
      out
    }

    /** Fake fixed-width feature: k-bin histogram of the payload bytes. */
    def feature(payload: Array[Byte], bins: Int = 16): Array[Float] = {
      val out = new Array[Float](bins)
      payload.foreach { b => out(java.lang.Byte.toUnsignedInt(b) * bins / 256) += 1.0f }
      if (payload.nonEmpty) { var i = 0; while (i < bins) { out(i) /= payload.length; i += 1 } }
      out
    }
  }

  /** Decode image rows to pixel planes, one codec pass per partition.
    * BMP/PPM payloads decode for real (dimensions come from the FILE, which
    * wins over row metadata); other payloads fall back to [[StubCodec]]
    * with the metadata geometry.
    */
  def decodeImages(ds: Dataset[MediaRow]): Dataset[DecodedImage] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.kind == "image").mapPartitions { it =>
      // per-partition codec init would go here (amortized over the batch)
      it.map { m =>
        Codecs.decodeBmp(m.payload).orElse(Codecs.decodePpm(m.payload)) match {
          case Some(p) => DecodedImage(m.media_id, p.width, p.height, p.pixels)
          case None => DecodedImage(m.media_id, m.width, m.height,
            StubCodec.decodeImage(m.payload, m.width, m.height))
        }
      }
    }
  }

  case class DecodedAudio(media_id: Long, sampleRate: Int, channels: Int, samples: Array[Float])

  /** Decode audio rows to mono PCM float waveforms. WAV PCM16 payloads
    * decode for real; anything else is skipped (no fake waveform — a wrong
    * sample rate would poison downstream resampling).
    */
  def decodeAudio(ds: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { m =>
        Codecs.decodeWav(m.payload).map(p =>
          DecodedAudio(m.media_id, p.sampleRate, p.channels, p.samples))
      }
    }
  }

  /** Fixed-width feature per media row (any kind). */
  def extractFeatures(ds: Dataset[MediaRow], bins: Int = 16): Dataset[MediaFeature] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(it => it.map(m => MediaFeature(m.media_id, m.kind, StubCodec.feature(m.payload, bins))))
  }

  /** Perceptual difference hash (dHash) over decoded luma planes: sample a
    * `(hashW+1) × hashH` grid with the same nearest-neighbor geometry as
    * [[resize]] and set bit `y·hashW + x` when the left sample is STRICTLY
    * brighter than its right neighbor. Near-identical images land within a
    * few Hamming bits of each other regardless of byte-level encoding — the
    * image-side near-dup key that md5 of the payload can't give. Bucket the
    * 64-bit signatures exactly like [[Dedup.simhashDedup]] buckets text
    * simhashes (prefix bits + Hamming verify) for corpus-scale image dedup.
    *
    * Map-only per image; only comparisons, so no float-quantization
    * subtleties — any monotone decode (including [[StubCodec]]'s byte
    * cycling) yields an engine-reproducible signature.
    */
  def dhash(ds: Dataset[DecodedImage], hashW: Int = 8, hashH: Int = 8): DataFrame = {
    require(hashW >= 1 && hashH >= 1 && hashW.toLong * hashH <= 64,
      s"dhash grid must fit 64 bits, got ${hashW}x$hashH")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(it => it.map { img =>
      val w = img.width
      val h = img.height
      val px = img.pixels
      var sig = 0L
      if (w > 0 && h > 0 && px.length >= w * h) {
        var y = 0
        while (y < hashH) {
          val sy = math.min(h - 1, y * h / hashH)
          var x = 0
          while (x < hashW) {
            val sx1 = math.min(w - 1, x * w / (hashW + 1))
            val sx2 = math.min(w - 1, (x + 1) * w / (hashW + 1))
            if (px(sy * w + sx1) > px(sy * w + sx2)) sig |= 1L << (y * hashW + x)
            x += 1
          }
          y += 1
        }
      }
      (img.media_id, sig)
    }).toDF("media_id", "dhash")
  }

  /** Resize decoded planes with nearest-neighbor sampling — the real
    * geometry/batching logic; a production codec would swap in a proper
    * filter kernel. Deterministic, mapPartitions-batched like the rest.
    */
  def resize(ds: Dataset[DecodedImage], outW: Int, outH: Int): Dataset[DecodedImage] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(it => it.map { img =>
      val out = new Array[Float](outW * outH)
      var y = 0
      while (y < outH) {
        val sy = math.min(img.height - 1, y * img.height / math.max(outH, 1))
        var x = 0
        while (x < outW) {
          val sx = math.min(img.width - 1, x * img.width / math.max(outW, 1))
          out(y * outW + x) = img.pixels(sy * img.width + sx)
          x += 1
        }
        y += 1
      }
      DecodedImage(img.media_id, outW, outH, out)
    })
  }

  /** Sample every `everyMs` milliseconds of each video into frame features —
    * the `explode`-shaped op of the pack (one input row → many frames).
    * Y4M payloads decode for real: the sampled timestamp maps to a frame
    * index via the container's frame rate and the feature is a luma
    * histogram of THAT frame. Other payloads use the stub sampler.
    */
  def sampleFrames(ds: Dataset[MediaRow], everyMs: Long, bins: Int = 16): Dataset[VideoFrame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.kind == "video").flatMap { m =>
      Codecs.decodeY4m(m.payload) match {
        case Some(v) =>
          val durationMs = v.lumas.length.toLong * 1000L * v.frameRateDen / math.max(v.frameRateNum, 1)
          val n = math.max(1, (durationMs / math.max(everyMs, 1)).toInt)
          (0 until n).iterator.map { i =>
            val tsMs = i * everyMs
            val frameIdx = math.min(
              (tsMs * v.frameRateNum / (1000L * v.frameRateDen)).toInt, v.lumas.length - 1)
            VideoFrame(m.media_id, i, tsMs, lumaHistogram(v.lumas(frameIdx), bins))
          }
        case None =>
          val n = math.max(1, (m.durationMs / math.max(everyMs, 1)).toInt)
          (0 until n).iterator.map { i =>
            val tsMs = i * everyMs
            val window = m.payload.drop((i * 7) % math.max(m.payload.length, 1))
            VideoFrame(m.media_id, i, tsMs, StubCodec.feature(window, bins))
          }
      }
    }
  }

  /** Fixed-width histogram of a [0,1] luma plane (normalized to sum 1). */
  private[operators] def lumaHistogram(plane: Array[Float], bins: Int): Array[Float] = {
    val out = new Array[Float](bins)
    plane.foreach { v =>
      val b = math.min((v * bins).toInt, bins - 1)
      out(math.max(b, 0)) += 1.0f
    }
    if (plane.nonEmpty) { var i = 0; while (i < bins) { out(i) /= plane.length; i += 1 } }
    out
  }

  /** Metadata-level stats (pure built-ins; no decode). */
  def mediaStats(df: DataFrame): DataFrame =
    df.groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("payload"))).as("total_bytes"),
        round(avg(length(col("payload"))), 3).as("avg_bytes"))

  case class AudioStats(media_id: Long, sample_rate: Int, n_samples: Long,
      rms_db: Double, peak: Double, silence_ratio: Double, clip_ratio: Double)

  /** Waveform-level audio quality row per decoded clip — the audio-side
    * quality gate next to the text pack's [[TextAnalysis.qualityScore]]:
    * overall RMS loudness in dBFS, absolute peak, the fraction of
    * `frameMs`-wide frames whose RMS sits below `silenceDb` (silence ratio
    * — trims dead air and dead mics from a training corpus), and the
    * fraction of samples at/over full scale (clipping ratio — flags
    * distorted takes). Per-row bounded arithmetic in the decode layer
    * (same [[decodeAudio]] `mapPartitions` contract); everything downstream
    * is a plain DataFrame.
    */
  def audioStats(ds: Dataset[DecodedAudio], frameMs: Int = 20,
      silenceDb: Double = -40.0): DataFrame = {
    require(frameMs > 0, s"frameMs must be positive, got $frameMs")
    val spark = ds.sparkSession
    import spark.implicits._
    val silenceAmp = math.pow(10.0, silenceDb / 20.0)
    ds.mapPartitions { it =>
      it.map { a =>
        val s = a.samples
        val n = s.length
        var sumSq = 0.0; var peak = 0.0; var clipped = 0L
        var i = 0
        while (i < n) {
          val v = s(i).toDouble
          sumSq += v * v
          val av = math.abs(v)
          if (av > peak) peak = av
          if (av >= 0.999) clipped += 1
          i += 1
        }
        val frameLen = math.max(1, a.sampleRate * frameMs / 1000)
        var silent = 0L; var frames = 0L
        var off = 0
        while (off < n) {
          val end = math.min(off + frameLen, n)
          var fs = 0.0; var j = off
          while (j < end) { fs += s(j).toDouble * s(j).toDouble; j += 1 }
          if (math.sqrt(fs / (end - off)) < silenceAmp) silent += 1
          frames += 1
          off = end
        }
        val rmsDb =
          if (n == 0 || sumSq == 0.0) -120.0
          else math.max(-120.0, 20.0 * math.log10(math.sqrt(sumSq / n)))
        AudioStats(a.media_id, a.sampleRate, n.toLong,
          BigDecimal(rmsDb).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(peak).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          if (frames == 0) 0.0
          else BigDecimal(silent.toDouble / frames)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          if (n == 0) 0.0
          else BigDecimal(clipped.toDouble / n)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toDF()
  }
}
