package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (builder-prompt extension): image/audio/video
  * as opaque `binary` columns plus typed metadata structs.
  *
  * All three modalities are REAL formats decoded by pure-JVM parsers
  * ([[MediaCodec]]: binary PPM images, PCM-16 WAV audio, RIFF/AVI video
  * containers) — synthesis writes conformant files and feature extraction /
  * frame sampling parse them back, so the schema, batched partition
  * processing, and feature shape run against genuine decode work. Payloads
  * no parser recognizes fall back to a deterministic byte-histogram feature
  * so the pipeline is total. (Compressed codecs inside containers — H.264
  * etc. — are out of scope for a pure-JVM engine; frame payloads are
  * surfaced as bytes for a downstream decoder.)
  */
object Multimodal {

  /** Canonical multimodal schema: id + media bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  private def mix(id: Long, salt: Long): Long = {
    // splitmix64 finalizer — deterministic pseudo-noise per (id, salt)
    var z = id + salt * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic PPM image for an id: small RGB raster whose pixels derive
    * from splitmix64 noise.
    */
  private[operators] def makeImage(id: Long): (Array[Byte], Int, Int) = {
    val w = 16 + (mix(id, 1) & 15).toInt
    val h = 16 + (mix(id, 2) & 15).toInt
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < rgb.length) {
      rgb(i) = (mix(id, 100 + i) & 0xff).toByte
      i += 1
    }
    (MediaCodec.encodePpm(MediaCodec.PpmImage(w, h, rgb)), w, h)
  }

  /** Deterministic AVI video for an id: small RGB frames of splitmix64
    * noise in a real RIFF/AVI container (uncompressed 00db profile).
    */
  private[operators] def makeVideo(id: Long): (Array[Byte], Int, Int, Int) = {
    val w = 8 + (mix(id, 5) & 7).toInt
    val h = 8 + (mix(id, 6) & 7).toInt
    val nFrames = 2 + (mix(id, 4) & 15).toInt
    val frames = (0 until nFrames).map { f =>
      Array.tabulate[Byte](w * h * 3)(i => (mix(id, 3000 + f * 100000 + i) & 0xff).toByte)
    }
    (MediaCodec.encodeAvi(MediaCodec.AviVideo(w, h, 40000, frames)), w, h, nFrames)
  }

  /** Deterministic mono PCM-16 WAV for an id. */
  private[operators] def makeAudio(id: Long): (Array[Byte], Int, Int) = {
    val sr = 16000
    val n = 256 + (mix(id, 3) & 255).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((mix(id, 1000 + i) & 0xffff) - 32768).toShort
      i += 1
    }
    (MediaCodec.encodeWav(MediaCodec.WavAudio(sr, 1, samples)), sr, n)
  }

  /** Build a deterministic synthetic media table from any id column — used
    * by tests/battery and as the reference shape for real ingestion. Image
    * rows carry real PPM bytes, audio rows real WAV bytes, video rows real
    * AVI containers — all decodable by [[MediaCodec]].
    */
  def syntheticMedia(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("media_id"))
    val rdd = ids.rdd.mapPartitions(_.map { r =>
      val id = r.getLong(0)
      (math.floorMod(id, 3L).toInt: @unchecked) match {
        case 0 => // image
          val (bytes, w, h) = makeImage(id)
          Row(id, "image", bytes, Row(w, h, 3, null, null))
        case 1 => // audio
          val (bytes, sr, n) = makeAudio(id)
          Row(id, "audio", bytes, Row(null, null, 1, sr, null))
        case 2 => // video: real AVI container, metadata mirrors the payload
          val (bytes, w, h, nFrames) = makeVideo(id)
          Row(id, "video", bytes, Row(w, h, 3, null, nFrames))
      }
    })
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Documented fallback for undecodable payloads: deterministic 8-dim byte
    * histogram (what the round-1 stub computed for everything).
    */
  private def byteHistogramFeatures(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xff) / 255.0
      i += 1
    }
    out.map(x => math.round(x * 1e6) / 1e6)
  }

  private def round6(x: Double): Double = math.round(x * 1e6) / 1e6

  /** Real image features from decoded PPM pixels:
    * [meanR, meanG, meanB, meanLuma, stdLuma, width, height, channels].
    */
  private def imageFeatures(img: MediaCodec.PpmImage): Array[Double] = {
    val n = img.width * img.height
    var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
    var i = 0
    while (i < n) {
      val r = (img.rgb(3 * i) & 0xff) / 255.0
      val g = (img.rgb(3 * i + 1) & 0xff) / 255.0
      val b = (img.rgb(3 * i + 2) & 0xff) / 255.0
      val l = 0.299 * r + 0.587 * g + 0.114 * b
      sr += r; sg += g; sb += b; sl += l; sl2 += l * l
      i += 1
    }
    val meanL = sl / n
    Array(round6(sr / n), round6(sg / n), round6(sb / n), round6(meanL),
      round6(math.sqrt(math.max(0, sl2 / n - meanL * meanL))),
      img.width.toDouble, img.height.toDouble, 3.0)
  }

  /** Real audio features from decoded PCM samples:
    * [mean, rms, zeroCrossRate, maxAbs, sampleRate, nSamples, channels, 0].
    */
  private def audioFeatures(a: MediaCodec.WavAudio): Array[Double] = {
    val n = a.samples.length
    var sum = 0.0; var sum2 = 0.0; var maxAbs = 0.0; var zc = 0
    var i = 0
    while (i < n) {
      val s = a.samples(i) / 32768.0
      sum += s; sum2 += s * s
      if (math.abs(s) > maxAbs) maxAbs = math.abs(s)
      if (i > 0 && ((a.samples(i) >= 0) != (a.samples(i - 1) >= 0))) zc += 1
      i += 1
    }
    Array(round6(sum / n), round6(math.sqrt(sum2 / n)),
      if (n > 1) round6(zc.toDouble / (n - 1)) else 0.0,
      round6(maxAbs), a.sampleRate.toDouble, n.toDouble, a.channels.toDouble, 0.0)
  }

  /** Real video features from decoded AVI frames:
    * [width, height, nFrames, fps, meanFrameByte, stdFrameByte,
    * meanFrameBytes, 1.0].
    */
  private def videoFeatures(v: MediaCodec.AviVideo): Array[Double] = {
    var sum = 0.0; var sum2 = 0.0; var n = 0L; var totalBytes = 0L
    v.frames.foreach { f =>
      totalBytes += f.length
      var i = 0
      while (i < f.length) {
        val x = (f(i) & 0xff) / 255.0
        sum += x; sum2 += x * x; n += 1; i += 1
      }
    }
    val mean = if (n > 0) sum / n else 0.0
    val fps = if (v.microSecPerFrame > 0) 1e6 / v.microSecPerFrame else 0.0
    Array(v.width.toDouble, v.height.toDouble, v.frames.length.toDouble,
      round6(fps), round6(mean),
      round6(math.sqrt(math.max(0, (if (n > 0) sum2 / n else 0.0) - mean * mean))),
      if (v.frames.nonEmpty) round6(totalBytes.toDouble / v.frames.length) else 0.0, 1.0)
  }

  /** Decode-dispatch: real parser by payload magic, stub histogram otherwise. */
  private[graft] def decodeFeatures(bytes: Array[Byte]): Array[Double] =
    MediaCodec.decodePpm(bytes).map(imageFeatures)
      .orElse(MediaCodec.decodeWav(bytes).map(audioFeatures))
      .orElse(MediaCodec.decodeAvi(bytes).map(videoFeatures))
      .getOrElse(byteHistogramFeatures(bytes))

  /** Feature-extract over media rows in partition-sized batches. Returns
    * (media_id, media_type, features array<double>). The mapPartitions shape
    * mirrors what a heavier decoder needs: per-partition init (model load)
    * then streamed rows; the scan projects only the three consumed columns
    * before the RDD pruning barrier.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val projected = media.select(col("media_id"), col("media_type"), col("bytes"))
    val rdd = projected.rdd.mapPartitions { it =>
      // per-partition decoder init would happen here (setup/teardown bundle)
      it.map { r =>
        val feats = decodeFeatures(r.getAs[Array[Byte]](2))
        Row(r.getLong(0), r.getString(1), feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("features", ArrayType(DoubleType)))))
  }

  /** Perceptual difference hash (dHash) of a decoded image: luma plane →
    * 9×8 box-downsample → 64 bits, bit (gx, gy) set iff cell (gx, gy) is
    * brighter than its right neighbor. Near-identical images (small noise,
    * re-encodes, minor crops) land within a few bits of Hamming distance;
    * pair detection is then the SAME block-probing engine text SimHash uses
    * ([[Dedup.hammingPairs64]]).
    *
    * Fully integer: luma is `299r + 587g + 114b` (no division), box means
    * compare as cross-multiplied rationals (`sumA·cntB > sumB·cntA`) — the
    * hash is bit-reproducible on any platform, so incremental re-runs and
    * task retries always agree. Works for any image ≥ 1×1 (boxes are
    * index-mapped, never empty).
    */
  private[graft] def dHash64(img: MediaCodec.PpmImage): Long = {
    val w = img.width; val h = img.height
    val Gw = 9; val Gh = 8
    val sums = new Array[Long](Gw * Gh)
    val counts = new Array[Long](Gw * Gh)
    var gy = 0
    while (gy < Gh) {
      val y0 = gy * h / Gh
      val y1 = math.max(y0 + 1, (gy + 1) * h / Gh)
      var gx = 0
      while (gx < Gw) {
        val x0 = gx * w / Gw
        val x1 = math.max(x0 + 1, (gx + 1) * w / Gw)
        var s = 0L; var c = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val p = 3 * (y * w + x)
            s += 299L * (img.rgb(p) & 0xff) + 587L * (img.rgb(p + 1) & 0xff) +
              114L * (img.rgb(p + 2) & 0xff)
            c += 1
            x += 1
          }
          y += 1
        }
        sums(gy * Gw + gx) = s
        counts(gy * Gw + gx) = math.max(c, 1L)
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    var bit = 0
    gy = 0
    while (gy < Gh) {
      var gx = 0
      while (gx < Gw - 1) {
        val a = gy * Gw + gx
        val b = a + 1
        // exact rational compare: meanA > meanB  ⇔  sumA·cntB > sumB·cntA
        if (sums(a) * counts(b) > sums(b) * counts(a)) hash |= 1L << bit
        bit += 1
        gx += 1
      }
      gy += 1
    }
    hash
  }
  /** dHash signatures for the image rows of a media table:
    * (media_id, dhash). Undecodable image payloads are dropped, same policy
    * as [[sampleFrames]]. Pair with [[Dedup.hammingPairs64]] for near-dup
    * pairs, or group on the raw hash for exact perceptual buckets.
    */
  def imageDHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    val projected = media.filter(col("media_type") === "image")
      .select(col("media_id"), col("bytes"))
    val rdd = projected.rdd.mapPartitions { it =>
      it.flatMap { r =>
        MediaCodec.decodePpm(r.getAs[Array[Byte]](1))
          .map(img => Row(r.getLong(0), dHash64(img)))
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType))))
  }

  /** Deterministic small perturbation of a PPM payload (re-encode with
    * `nPixels` single-channel ±delta tweaks seeded by `salt`) — the test /
    * battery generator for "same image, slightly different bytes" near-dup
    * rows. Non-PPM payloads pass through unchanged.
    */
  private[graft] def perturbPpm(bytes: Array[Byte], nPixels: Int, delta: Int,
      salt: Long): Array[Byte] =
    MediaCodec.decodePpm(bytes).map { img =>
      val rgb = img.rgb.clone()
      var i = 0
      while (i < nPixels) {
        val pos = math.floorMod(mix(salt, 7000 + i), rgb.length.toLong).toInt
        val v = (rgb(pos) & 0xff) + (if ((mix(salt, 8000 + i) & 1L) == 0L) delta else -delta)
        rgb(pos) = math.max(0, math.min(255, v)).toByte
        i += 1
      }
      MediaCodec.encodePpm(MediaCodec.PpmImage(img.width, img.height, rgb))
    }.getOrElse(bytes)

  /** Frame sampling plan for video rows: every `stride`-th frame index from
    * the metadata — pure expression, no decode needed to *plan* the work.
    */
  /** Integer box-filter downscale of a PPM payload by `factor`: each
    * output channel is the FLOOR of the mean of its factor×factor input
    * block (dimensions truncate to multiples of factor — the standard
    * crop-to-grid contract; an image smaller than one block yields None).
    * Exact-integer law pinned by the spec and the battery row:
    * sumOut·k² ≤ sumIn(cropped) < (sumOut + nOutChannels)·k² with
    * k² = factor² — the floor loses strictly less than one unit per
    * output channel. All arithmetic integral, so resized payloads are
    * byte-reproducible across runs, executors, and platforms — the
    * property multimodal training plumbing needs from a preprocessing
    * stage.
    */
  private[graft] def resizePpm(img: MediaCodec.PpmImage, factor: Int)
      : Option[MediaCodec.PpmImage] = {
    require(factor >= 1, s"factor must be positive: $factor")
    val w2 = img.width / factor; val h2 = img.height / factor
    if (w2 == 0 || h2 == 0) None
    else {
      val k2 = factor.toLong * factor
      val out = new Array[Byte](w2 * h2 * 3)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          var c = 0
          while (c < 3) {
            var s = 0L
            var dy = 0
            while (dy < factor) {
              var dx = 0
              while (dx < factor) {
                s += (img.rgb(((y * factor + dy) * img.width +
                  (x * factor + dx)) * 3 + c) & 0xff)
                dx += 1
              }
              dy += 1
            }
            out((y * w2 + x) * 3 + c) = (s / k2).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      Some(MediaCodec.PpmImage(w2, h2, out))
    }
  }

  /** Distributed image resize: every decodable image row re-encoded at
    * 1/factor scale, with the exact-integer audit columns the
    * [[resizePpm]] floor-sum law needs — (media_id, w_in, h_in, w_out,
    * h_out, sum_in_cropped, sum_out, resized_bytes). Same mapPartitions
    * batch shape as [[extractFeatures]]; non-images and undecodable
    * payloads are dropped (census upstream if totals must reconcile).
    */
  def resizeImages(spark: SparkSession, media: DataFrame, factor: Int)
      : DataFrame = {
    val projected = media.filter(col("media_type") === "image")
      .select(col("media_id"), col("bytes"))
    val rdd = projected.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        MediaCodec.decodePpm(r.getAs[Array[Byte]](1)).iterator.flatMap {
          img =>
            resizePpm(img, factor).map { small =>
              val cw = small.width * factor; val ch = small.height * factor
              var sumIn = 0L
              var y = 0
              while (y < ch) {
                var i = (y * img.width) * 3
                val end = i + cw * 3
                while (i < end) { sumIn += (img.rgb(i) & 0xff); i += 1 }
                y += 1
              }
              var sumOut = 0L
              var j = 0
              while (j < small.rgb.length) {
                sumOut += (small.rgb(j) & 0xff); j += 1
              }
              Row(id, img.width, img.height, small.width, small.height,
                sumIn, sumOut, MediaCodec.encodePpm(small))
            }
        }
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType),
      StructField("w_in", IntegerType), StructField("h_in", IntegerType),
      StructField("w_out", IntegerType), StructField("h_out", IntegerType),
      StructField("sum_in_cropped", LongType),
      StructField("sum_out", LongType),
      StructField("resized_bytes", BinaryType))))
  }

  def sampleFrameIndices(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_idx"))

  /** REAL frame extraction: decode each video container and emit every
    * `stride`-th frame's payload — (media_id, frame_idx, frame_bytes).
    * Undecodable rows are dropped (count them upstream via
    * [[sampleFrameIndices]] if totals must reconcile). Same mapPartitions
    * batch shape as [[extractFeatures]].
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    val projected = media.filter(col("media_type") === "video")
      .select(col("media_id"), col("bytes"))
    val rdd = projected.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        MediaCodec.decodeAvi(r.getAs[Array[Byte]](1)).iterator.flatMap { v =>
          v.frames.iterator.zipWithIndex.collect {
            case (f, i) if i % stride == 0 => Row(id, i, f)
          }
        }
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_bytes", BinaryType))))
  }
}
