package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-engineering operators for training-data export.
  */
object Features {

  /** Hashing-trick term-frequency vectorizer: every token maps to one of
    * 16^prefixLen feature buckets via its md5 prefix, yielding the sparse
    * triples (id, feature, tf) — the fixed-width, vocabulary-free document
    * representation large-scale training exports use (no global vocab
    * build, no dictionary to ship, collisions bounded by the bucket
    * count).
    *
    * The bucket id IS the md5 hex prefix (a string key): md5 renders
    * identically in every engine, so feature assignment is bit-portable
    * with no hex-to-integer parsing — the same determinism convention as
    * the engine's md5 sampling gates. Map-side only until the final
    * (id, feature) count — one shuffle, bounded by output size.
    */
  def hashingVectorize(df: DataFrame, idCol: String, textCol: String,
                       prefixLen: Int = 3): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8,
      s"prefixLen must be in [1, 8]: $prefixLen")
    df.select(col(idCol).as("id"),
        graft.functions.TextFunctions.tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"), explode(col("__toks")).as("__tok"))
      .select(col("id"), substring(md5(col("__tok")), 1, prefixLen).as("feature"))
      .groupBy(col("id"), col("feature"))
      .agg(count(lit(1)).as("tf"))
  }
}
