package graft

import graft.operators.{MediaCodec, Multimodal, ScaleOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkTestBase {

  private def media() =
    Multimodal.syntheticMedia(spark,
      Tables.embeddings(spark, "/root/testdata/sf0.001").limit(30), "vec_id")

  test("synthetic media conforms to the canonical multimodal schema") {
    val m = media()
    val s = m.schema
    assert(s("media_id").dataType == LongType)
    assert(s("media_type").dataType == StringType)
    assert(s("bytes").dataType == BinaryType)
    assert(s("meta").dataType.isInstanceOf[StructType])
    val types = m.select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types.subsetOf(Set("image", "audio", "video")))
    // metadata within the documented bounds (images 16-31 px, videos 8-15)
    val bounds = m.agg(min(col("meta.width")), max(col("meta.width")),
      min(col("meta.n_frames"))).first()
    assert(bounds.getInt(0) >= 8 && bounds.getInt(2) >= 1)
  }

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(spark, media())
      .collect().map(r => (r.getLong(0), r.getSeq[Double](2))).sortBy(_._1).toSeq
    val f2 = Multimodal.extractFeatures(spark, media())
      .collect().map(r => (r.getLong(0), r.getSeq[Double](2))).sortBy(_._1).toSeq
    assert(f1 == f2)
    assert(f1.forall(_._2.size == 8))
  }

  test("PPM codec round-trips and image features match hand-computed values") {
    import graft.operators.MediaCodec
    // 2x1 image: pure red pixel + pure white pixel
    val rgb = Array[Byte](255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte)
    val bytes = MediaCodec.encodePpm(MediaCodec.PpmImage(2, 1, rgb))
    assert(new String(bytes.take(2)) == "P6")
    val img = MediaCodec.decodePpm(bytes).get
    assert(img.width == 2 && img.height == 1 && img.rgb.toSeq == rgb.toSeq)
    // corrupted payloads are rejected, not mis-parsed
    assert(MediaCodec.decodePpm(bytes.dropRight(1)).isEmpty)
    assert(MediaCodec.decodePpm("P5\n1 1\n255\nx".getBytes).isEmpty)
    // adversarial header dims: w*h*3 overflowing Int must reject, not crash
    // or wrap to an accepted empty image
    assert(MediaCodec.decodePpm("P6\n65536 65536\n255\nxxx".getBytes).isEmpty)
    assert(MediaCodec.decodePpm("P6\n46341 46341\n255\nxxx".getBytes).isEmpty)
    // features: meanR = (1+1)/2 = 1.0, meanG = meanB = 0.5,
    // luma(red)=0.299, luma(white)=1.0 -> meanLuma=0.6495
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "image", bytes,
          org.apache.spark.sql.Row(2, 1, 3, null, null)))),
      Multimodal.mediaSchema)
    val f = Multimodal.extractFeatures(spark, media).collect().head.getSeq[Double](2)
    assert(f(0) == 1.0 && f(1) == 0.5 && f(2) == 0.5)
    assert(math.abs(f(3) - 0.6495) < 1e-6)
    assert(f(5) == 2.0 && f(6) == 1.0 && f(7) == 3.0)
  }

  test("WAV codec round-trips and audio features match hand-computed values") {
    import graft.operators.MediaCodec
    // alternating full-scale square wave: rms=1 (almost), zcr=1
    val samples = Array[Short](16384, -16384, 16384, -16384)
    val bytes = MediaCodec.encodeWav(MediaCodec.WavAudio(8000, 1, samples))
    assert(new String(bytes.take(4)) == "RIFF")
    val wav = MediaCodec.decodeWav(bytes).get
    assert(wav.sampleRate == 8000 && wav.channels == 1 && wav.samples.toSeq == samples.toSeq)
    assert(MediaCodec.decodeWav(bytes.take(20)).isEmpty)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "audio", bytes,
          org.apache.spark.sql.Row(null, null, 1, 8000, null)))),
      Multimodal.mediaSchema)
    val f = Multimodal.extractFeatures(spark, media).collect().head.getSeq[Double](2)
    assert(f(0) == 0.0 && f(2) == 1.0) // mean 0, every step crosses zero
    assert(math.abs(f(1) - 0.5) < 1e-6) // rms of +-16384/32768
    assert(f(4) == 8000.0 && f(5) == 4.0)
  }

  test("synthetic image/audio payloads are real decodable formats") {
    import graft.operators.MediaCodec
    val rows = media().collect()
    val images = rows.filter(_.getString(1) == "image")
    val audios = rows.filter(_.getString(1) == "audio")
    assert(images.nonEmpty && audios.nonEmpty)
    images.foreach { r =>
      val img = MediaCodec.decodePpm(r.getAs[Array[Byte]](2))
      assert(img.isDefined, s"image payload for id ${r.getLong(0)} not decodable")
      val meta = r.getStruct(3)
      assert(img.get.width == meta.getInt(0) && img.get.height == meta.getInt(1))
    }
    audios.foreach { r =>
      val wav = MediaCodec.decodeWav(r.getAs[Array[Byte]](2))
      assert(wav.isDefined, s"audio payload for id ${r.getLong(0)} not decodable")
      assert(wav.get.sampleRate == r.getStruct(3).getInt(3))
    }
  }

  test("frame sampling respects stride and n_frames") {
    val m = media()
    val sampled = Multimodal.sampleFrameIndices(m, 10)
    val joined = sampled.join(m, "media_id")
      .select(col("media_id"), col("frame_idx"), col("meta.n_frames").as("nf"))
      .collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getInt(1) < r.getInt(2) && r.getInt(1) % 10 == 0))
  }

  test("video payloads are real AVI containers; extraction agrees with the index plan") {
    val m = media()
    val videos = m.filter(col("media_type") === "video").collect()
    assert(videos.nonEmpty)
    videos.foreach { r =>
      val avi = MediaCodec.decodeAvi(r.getAs[Array[Byte]](2))
      assert(avi.isDefined, s"video payload for id ${r.getLong(0)} not decodable")
      val meta = r.getStruct(3)
      assert(avi.get.width == meta.getInt(0) && avi.get.height == meta.getInt(1) &&
        avi.get.frames.length == meta.getInt(4))
      // every frame carries the full uncompressed raster
      assert(avi.get.frames.forall(_.length == avi.get.width * avi.get.height * 3))
    }
    // decoded extraction emits exactly the rows the metadata plan predicts
    val planned = Multimodal.sampleFrameIndices(m, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val extracted = Multimodal.sampleFrames(spark, m, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(extracted == planned, s"plan/extract divergence: ${planned.diff(extracted)}")
    // determinism: re-extraction yields byte-identical frames
    val once = Multimodal.sampleFrames(spark, m, 3).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getAs[Array[Byte]](2).toSeq)).toMap
    val twice = Multimodal.sampleFrames(spark, m, 3).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getAs[Array[Byte]](2).toSeq)).toMap
    assert(once == twice)
  }

  test("resize: floor-sum law, dims, uniform invariance, byte determinism") {
    import graft.operators.{MediaCodec, Multimodal}
    val media = Multimodal.syntheticMedia(spark,
      Tables.embeddings(spark, "/root/testdata/sf0.001"), "vec_id")
    val out = Multimodal.resizeImages(spark, media, factor = 2).collect()
    assert(out.nonEmpty, "no image row resized")
    out.foreach { r =>
      val (wIn, hIn, wOut, hOut) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      val (sumIn, sumOut) = (r.getLong(5), r.getLong(6))
      assert(wOut == wIn / 2 && hOut == hIn / 2)
      // the exact floor-sum law: floor loses < 1 per output channel
      assert(sumOut * 4 <= sumIn && sumIn < (sumOut + 3L * wOut * hOut) * 4,
        s"floor-sum law broken for media ${r.getLong(0)}")
      // the resized payload is a real decodable PPM with the stated dims
      val img = MediaCodec.decodePpm(r.getAs[Array[Byte]](7)).get
      assert(img.width == wOut && img.height == hOut)
    }
    // byte determinism: a second run must produce identical payloads
    val again = Multimodal.resizeImages(spark, media, factor = 2).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](7).toSeq).toMap
    out.foreach { r =>
      assert(again(r.getLong(0)) == r.getAs[Array[Byte]](7).toSeq,
        "resize bytes differ across runs: not reproducible")
    }
    // uniform image stays uniform at the same color (exact mean of equal
    // values), and a sub-block image yields None
    val uni = MediaCodec.PpmImage(4, 4, Array.fill(4 * 4 * 3)(77.toByte))
    val small = Multimodal.resizePpm(uni, 2).get
    assert(small.rgb.forall(_ == 77.toByte), "uniform image changed color")
    assert(Multimodal.resizePpm(MediaCodec.PpmImage(1, 1,
      Array.fill(3)(0.toByte)), 2).isEmpty, "sub-block image must drop")
    // odd dims crop to the block grid: 5x3 at k=2 -> 2x1
    val odd = MediaCodec.PpmImage(5, 3,
      Array.tabulate(5 * 3 * 3)(i => (i % 251).toByte))
    val cropped = Multimodal.resizePpm(odd, 2).get
    assert(cropped.width == 2 && cropped.height == 1)
  }

  test("dHash: deterministic, perturbation-stable within the battery budget, discriminating") {
    val imgs = media().filter(col("media_type") === "image")
    val hashes = Multimodal.imageDHashes(spark, imgs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hashes.nonEmpty)
    // deterministic re-hash
    val again = Multimodal.imageDHashes(spark, imgs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hashes == again)
    // the d89 battery contract: a 6-pixel ±24 perturbation stays within
    // Hamming 3 of the original for every synthetic image here, while
    // DIFFERENT images (independent noise) sit far away
    val rows = imgs.select("media_id", "bytes").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    rows.foreach { case (id, bytes) =>
      val p = Multimodal.perturbPpm(bytes, 6, 24, id)
      assert(!java.util.Arrays.equals(p, bytes), s"perturbation was a no-op for $id")
      val hp = Multimodal.dHash64(MediaCodec.decodePpm(p).get)
      assert(ham(hashes(id), hp) <= 3,
        s"perturbed $id drifted ${ham(hashes(id), hp)} bits")
    }
    val ids = rows.map(_._1)
    for (a <- ids; b <- ids if a < b)
      assert(ham(hashes(a), hashes(b)) > 3, s"distinct images $a,$b too close")
  }

  test("dHash edge shapes: tiny images hash without crashing; undecodable rows drop") {
    // 1x1: no gradient anywhere → hash 0; 2x2 works via index-mapped boxes
    val one = MediaCodec.PpmImage(1, 1, Array[Byte](10, 20, 30))
    assert(Multimodal.dHash64(one) == 0L)
    val two = MediaCodec.PpmImage(2, 2,
      Array.tabulate[Byte](12)(i => (i * 20).toByte))
    Multimodal.dHash64(two) // must not throw
    val s = spark
    import s.implicits._
    val bad = Seq((99L, "image", "not a ppm".getBytes, null))
      .toDF("media_id", "media_type", "bytes", "meta")
    assert(Multimodal.imageDHashes(spark, bad).count() == 0)
  }

  test("shufflePartitionsFor sizes by target bytes with a parallelism floor") {
    val n = ScaleOps.shufflePartitionsFor(spark, 100L << 30) // 100 GiB
    assert(n == 800) // 128 MiB target
    assert(ScaleOps.shufflePartitionsFor(spark, 1L) == spark.sparkContext.defaultParallelism)
  }
}
