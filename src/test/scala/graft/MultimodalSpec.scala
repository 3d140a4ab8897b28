package graft

import graft.operators.{Multimodal, ScaleOps}
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
    // metadata within the documented bounds
    val bounds = m.agg(min(col("meta.width")), max(col("meta.width")),
      min(col("meta.n_frames"))).first()
    assert(bounds.getInt(0) >= 16 && bounds.getInt(2) >= 1)
  }

  test("stubbed feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(spark, media())
      .collect().map(r => (r.getLong(0), r.getSeq[Double](2))).sortBy(_._1).toSeq
    val f2 = Multimodal.extractFeatures(spark, media())
      .collect().map(r => (r.getLong(0), r.getSeq[Double](2))).sortBy(_._1).toSeq
    assert(f1 == f2)
    assert(f1.forall(_._2.size == 8))
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

  test("shufflePartitionsFor sizes by target bytes with a parallelism floor") {
    val n = ScaleOps.shufflePartitionsFor(spark, 100L << 30) // 100 GiB
    assert(n == 800) // 128 MiB target
    assert(ScaleOps.shufflePartitionsFor(spark, 1L) == spark.sparkContext.defaultParallelism)
  }
}
