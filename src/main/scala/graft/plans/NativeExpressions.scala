package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Input-type contracts shared by the native expressions: every expression
  * declares `ExpectsInputTypes` so a wrong-typed argument (reachable through
  * the registered SQL functions, e.g. `graft_cosine(array<int>, ...)`) is an
  * ANALYSIS error instead of an unchecked unsafe-buffer read returning
  * silent garbage.
  */
private[plans] object NativeInputTypes {
  type AbstractType = ColumnBridge.AbstractType
  val stringArray: AbstractType = ArrayType(StringType)
  val longArray: AbstractType = ArrayType(LongType)
  val numericArray: AbstractType =
    ColumnBridge.typeCollection(ArrayType(DoubleType), ArrayType(FloatType))
}

/** Native Catalyst expressions for the dedup/similarity hot loops.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`) are
  * interpreted per element with array re-allocation per step — fine for the
  * oracle-checked scalar metrics, but a 64-slot vote array rebuilt per token
  * makes SimHash/MinHash/cosine the bench bottleneck. These expressions do
  * the same math as one tight JVM loop over the unsafe array data (the
  * preference order from the design brief: native Expression > UDF > HOF
  * chain for hot paths).
  *
  * Execution modes: the two hottest (MinHashShingleSigExpr,
  * JaroWinklerExpr) implement real `doGenCode` — a single static call
  * into [[ExprKernels]], the SAME body `nullSafeEval` runs, so the modes
  * cannot drift — which keeps their projections inside one whole-stage
  * region. Measured at 30× (NOTES, round 6): the boundary conversion is
  * flat (kernel loop dominates at this scale); kept because it is
  * drift-free by construction and removes the eval boundary for larger
  * scales. The remaining expressions stay `CodegenFallback`: none is a
  * bench bottleneck, and eval-mode keeps them short. Deterministic: same
  * xxhash64 core Spark's `xxhash64` uses.
  */
object NativeExpressions {
  def minHashSignature(set: Column, numHashes: Int, seed: Long = 42L): Column =
    ColumnBridge.column(
      MinHashSignatureExpr(ColumnBridge.expression(set), numHashes, seed))

  def simHash64(tokens: Column, seed: Long = 42L): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens), seed))

  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarityExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def lshBucket(vec: Column, bits: Int, seed: Long = 42L): Column =
    ColumnBridge.column(LshBucketExpr(ColumnBridge.expression(vec), bits, seed))

  /** MinHash signature over word `shingleSize`-grams of a token array —
    * WITHOUT materializing shingle strings: each token is hashed once and a
    * shingle's identity is the hash-fold of its window (min over a multiset
    * equals min over the set, so no dedup pass is needed either).
    */
  def minHashShingleSignature(tokens: Column, shingleSize: Int, numHashes: Int,
      seed: Long = 42L): Column =
    ColumnBridge.column(MinHashShingleSigExpr(
      ColumnBridge.expression(tokens), shingleSize, numHashes, seed))

  /** LSH band bucket keys from a MinHash signature: bucket b = hash-fold of
    * slots [b*r, (b+1)*r) seeded by b. Returns array<long> of length `bands`
    * (pair with posexplode for (band, bucket) join keys).
    */
  def bandBuckets(signature: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(BandBucketsExpr(
      ColumnBridge.expression(signature), bands, rowsPerBand))

  /** Unordered id pairs (id1 < id2) from an array<long> — candidate
    * expansion within an LSH bucket, one tight loop.
    */
  def idPairs(ids: Column): Column =
    ColumnBridge.column(IdPairsExpr(ColumnBridge.expression(ids)))

  /** Pair expansion with inline Hamming verification over an
    * array<struct<id:long, fp:long>> block bucket: emits only pairs with
    * popcount(fp1 ^ fp2) <= maxHamming. Carrying the 8-byte fingerprint
    * through the bucket makes the verify step join-free.
    */
  def hammingPairs(members: Column, maxHamming: Int): Column =
    ColumnBridge.column(HammingPairsExpr(ColumnBridge.expression(members), maxHamming))

  /** Exact fixed-point money SUM (see [[FixedPointSum]]): same value as
    * `CAST(SUM(CAST(x AS DECIMAL(18,scale))) AS ...)` on primitive-long
    * 128-bit accumulation instead of Spark's byte-array DECIMAL(28) path.
    */
  def moneySum(x: Column, scale: Int): Column =
    ColumnBridge.column(
      FixedPointSum(ColumnBridge.expression(x), scale).toAggregateExpression())

  /** Index of the nearest centroid (squared Euclidean, ties -> lowest index)
    * — the IVF cell-assignment hot loop, join-free (centroids ride along as
    * a plan constant, the broadcast-small-model pattern).
    */
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroidExpr(ColumnBridge.expression(vec), centroids))

  /** Native language-ID: token-count votes per lexicon, first strictly
    * greatest wins (exact semantics of TextFunctions.langId's fold and the
    * DuckDB oracle CASE).
    */
  def langIdOver(tokens: Column, lexicons: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(tokens), lexicons))

  /** Bloom-filter membership over a 64-bit hash column. The filter ships
    * as a Spark Broadcast so the deserialized object is cached once per
    * executor JVM (see [[BloomMightContainExpr]]).
    */
  def bloomMightContain(hash64: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    ColumnBridge.column(BloomMightContainExpr(
      ColumnBridge.expression(hash64), sc.broadcast(bloom)))
  }

  /** Distinct word n-grams (space-joined) of a token array, one native
    * pass — see [[WordNgramsExpr]].
    */
  def wordNgrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordNgramsExpr(ColumnBridge.expression(tokens), n))

  /** ALL word n-grams in document order, duplicates kept — the language-model
    * formulation (every occurrence counts), vs [[wordNgrams]]'s distinct
    * set-of-shingles formulation (the dedup/decontamination one).
    */
  def wordNgramsAll(tokens: Column, n: Int): Column =
    ColumnBridge.column(
      WordNgramsExpr(ColumnBridge.expression(tokens), n, distinct = false))

  /** Overlapping token-window chunks — see [[TokenChunksExpr]]. */
  def tokenChunks(tokens: Column, chunkSize: Int, stride: Int): Column =
    ColumnBridge.column(TokenChunksExpr(ColumnBridge.expression(tokens), chunkSize, stride))

  /** Shannon entropy of a string's code-point distribution — see
    * [[CharEntropyExpr]].
    */
  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(text)))

  /** Jaro–Winkler similarity, DuckDB-bit-identical — see
    * [[JaroWinklerExpr]].
    */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Tokens NOT covered by any n-token window starting at one of `starts`
    * — see [[MaskSpansExpr]].
    */
  def maskSpans(tokens: Column, starts: Column, n: Int): Column =
    ColumnBridge.column(MaskSpansExpr(
      ColumnBridge.expression(tokens), ColumnBridge.expression(starts), n))

  /** Single-pass repetition counters over a token array — see
    * [[RepetitionStatsExpr]].
    */
  def repetitionStats(tokens: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(tokens)))

  /** Z-order (Morton) key over integer dimensions — see [[InterleaveBitsExpr]]. */
  def zorderKey(dims: Seq[Column], bitsPerDim: Int = 21): Column =
    ColumnBridge.column(
      InterleaveBitsExpr(dims.map(ColumnBridge.expression), bitsPerDim))

  /** Read element i of a numeric array column as double (float or double). */
  private[plans] def numAt(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  private[plans] def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** MinHash signature: per element one string hash, then `numHashes` long
  * re-mixes; slot j = min over elements of xxh64(h(e), j). Matches the
  * column-function formulation in spirit (graft.functions.Hashing) with a
  * single pass.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int, seed: Long)
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(NativeInputTypes.stringArray)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), seed)
      var j = 0
      while (j < numHashes) {
        val m = XXH64.hashLong(h, j)
        if (m < out(j)) out(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

/** 64-bit SimHash over an array<string>: one hash per token; each bit of the
  * hash votes ±1; output = sign bits.
  */
case class SimHash64Expr(child: Expression, seed: Long)
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(NativeInputTypes.stringArray)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), seed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Jaro–Winkler similarity — the classic record-linkage string
  * comparator, matching DuckDB's `jaro_winkler_similarity` BIT FOR BIT
  * (verified empirically over 417,343 real candidate pairs at sf0.1):
  * Winkler prefix bonus only when jaro > 0.7 (the boost threshold),
  * prefix capped at 4, scale 0.1. The double expression SHAPES are
  * load-bearing for oracle hash equality — jaro must be computed as
  * (m/len1 + m/len2 + (m−t)/m) / 3 and the bonus as j + l·0.1·(1−j),
  * left-to-right; re-associating either would drift the last ulp on
  * some pair and flip a threshold or a ROUND. Chars are UTF-16 code
  * units, equal to DuckDB's byte-wise walk on ASCII corpora.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] =
    Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.jaroWinkler(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  // real codegen (one static call into the SAME kernel eval uses): keeps
  // the blocked-pair projection fused in one whole-stage region instead
  // of crossing a CodegenFallback eval boundary per candidate pair
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.ExprKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity of two numeric arrays, accumulated left-to-right in
  * doubles — the same operation order as the `aggregate`-based formulation
  * and the DuckDB oracle, so round(6) results are unchanged.
  *
  * Implements `doGenCode` (not CodegenFallback): the scoring scan of an ANN
  * query stays inside one WholeStageCodegen span with the filter/projection
  * around it.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] =
    Seq(NativeInputTypes.numericArray, NativeInputTypes.numericArray)
  override def dataType: DataType = DoubleType
  // length mismatch (a corrupt/truncated embedding) yields NULL, never a
  // plausible-looking score over the common prefix
  override def nullable: Boolean = true
  private lazy val lf = NativeExpressions.isFloatArray(left)
  private lazy val rf = NativeExpressions.isFloatArray(right)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = NativeExpressions.numAt(x, i, lf)
      val yi = NativeExpressions.numAt(y, i, rf)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) dot / denom else 0.0
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val lGet = if (lf) "getFloat" else "getDouble"
    val rGet = if (rf) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val den = ctx.freshName("den")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.$lGet($i);
         |    double $yi = (double) $b.$rGet($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  ${ev.value} = $den > 0 ? $dot / $den : 0.0;
         |}
         |""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarityExpr =
    copy(left = l, right = r)
}

/** Dot product with full codegen (see [[CosineSimilarityExpr]]). */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] =
    Seq(NativeInputTypes.numericArray, NativeInputTypes.numericArray)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // see CosineSimilarityExpr
  private lazy val lf = NativeExpressions.isFloatArray(left)
  private lazy val rf = NativeExpressions.isFloatArray(right)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += NativeExpressions.numAt(x, i, lf) * NativeExpressions.numAt(y, i, rf)
      i += 1
    }
    dot
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val lGet = if (lf) "getFloat" else "getDouble"
    val rGet = if (rf) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |  ${ev.value} = $dot;
         |}
         |""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}

/** MinHash over hashed word shingles in one pass (see
  * [[NativeExpressions.minHashShingleSignature]]). Documents shorter than
  * `shingleSize` contribute a single whole-document shingle, matching
  * TextFunctions.wordShingles' fallback.
  */
case class MinHashShingleSigExpr(child: Expression, shingleSize: Int, numHashes: Int, seed: Long)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(NativeInputTypes.stringArray)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ExprKernels.minHashShingleSig(
      input.asInstanceOf[ArrayData], shingleSize, numHashes, seed)
  // real codegen (one static call into the SAME kernel eval uses): the
  // signature projection stays inside the scan's whole-stage region
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.ExprKernels.minHashShingleSig($c, $shingleSize, $numHashes, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): MinHashShingleSigExpr =
    copy(child = newChild)
}

/** LSH band buckets from a signature array (see
  * [[NativeExpressions.bandBuckets]]).
  */
case class BandBucketsExpr(child: Expression, bands: Int, rowsPerBand: Int)
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(bands > 0 && rowsPerBand > 0,
    s"bandBuckets needs bands > 0 and rowsPerBand > 0 (got $bands, $rowsPerBand)")
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(NativeInputTypes.longArray)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    if (sig.numElements() < bands * rowsPerBand)
      throw new IllegalArgumentException(
        s"signature has ${sig.numElements()} slots but bands=$bands x rowsPerBand=$rowsPerBand " +
          s"needs ${bands * rowsPerBand} — unsafe reads past the array are not performed")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashLong(b.toLong, 9001L)
      var r = 0
      while (r < rowsPerBand) {
        h = XXH64.hashLong(sig.getLong(b * rowsPerBand + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): BandBucketsExpr =
    copy(child = newChild)
}

/** In-bucket candidate pair expansion: all {min,max} pairs of distinct ids. */
case class IdPairsExpr(child: Expression)
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(NativeInputTypes.longArray)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id1", LongType, nullable = false),
      StructField("id2", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // n*(n-1)/2 overflows Int at n >= 46342 — fail with a clear message
    // instead of NegativeArraySizeException (callers cap bucket sizes;
    // this guards direct API use)
    val pairCount = n.toLong * (n - 1) / 2
    require(pairCount <= Int.MaxValue,
      s"idPairs over $n ids would expand to $pairCount pairs; cap the bucket first")
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = arr.getLong(i); i += 1 }
    val out = new Array[Any](pairCount.toInt)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = ids(i); val b = ids(j)
        out(k) = InternalRow(math.min(a, b), math.max(a, b))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): IdPairsExpr =
    copy(child = newChild)
}

/** In-block pair expansion + Hamming verification in one loop: input is the
  * collected (id, fingerprint) members of one 16-bit-block bucket; output
  * pairs (min id, max id, hamming) with hamming <= maxHamming. Fingerprints
  * never need a join-back — they travel with the bucket (8 bytes/doc).
  */
case class HammingPairsExpr(child: Expression, maxHamming: Int)
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("fp", LongType, nullable = false)))))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id1", LongType, nullable = false),
      StructField("id2", LongType, nullable = false),
      StructField("hamming", IntegerType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val pairCount = n.toLong * (n - 1) / 2
    require(pairCount <= Int.MaxValue,
      s"hammingPairs over $n members would expand to $pairCount pairs; cap the block first")
    val ids = new Array[Long](n)
    val fps = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0); fps(i) = row.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val h = java.lang.Long.bitCount(fps(i) ^ fps(j))
        if (h <= maxHamming) {
          val a = ids(i); val b = ids(j)
          out += InternalRow(math.min(a, b), math.max(a, b), h)
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(newChild: Expression): HammingPairsExpr =
    copy(child = newChild)
}

/** IVF cell assignment: argmin over centroids of squared Euclidean distance
  * to the input vector (float or double array). Dimensions beyond the
  * shorter of (vector, centroid) are ignored — same contract as the
  * driver-side probe loop, so assignment and probing can never disagree on
  * a malformed row.
  */
case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(centroids.nonEmpty, "nearestCentroid needs at least one centroid")
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(NativeInputTypes.numericArray)
  override def dataType: DataType = IntegerType
  private lazy val isFloat = NativeExpressions.isFloatArray(child)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(cen.length, len)
      var d = 0.0
      var i = 0
      while (i < n) {
        val x = NativeExpressions.numAt(arr, i, isFloat) - cen(i)
        d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

/** Lexicon-vote language ID over a (lowercased) token array. */
case class LangIdExpr(child: Expression, lexicons: Seq[(String, Seq[String])])
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(NativeInputTypes.stringArray)
  override def dataType: DataType = StringType
  @transient private lazy val names =
    lexicons.map(l => org.apache.spark.unsafe.types.UTF8String.fromString(l._1)).toArray
  @transient private lazy val sets = lexicons.map { case (_, ws) =>
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    ws.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }.toArray
  @transient private lazy val und = org.apache.spark.unsafe.types.UTF8String.fromString("und")
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var l = 0
      while (l < sets.length) { if (sets(l).contains(t)) counts(l) += 1; l += 1 }
      i += 1
    }
    // first strictly-greatest in lexicon order (the fold semantics)
    var best = und
    var bs = 0
    var l = 0
    while (l < counts.length) {
      if (counts(l) > bs) { bs = counts(l); best = names(l) }
      l += 1
    }
    best
  }
  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket: plane p's component for dimension i is the
  * sign of xxh64(xxh64(p, seed), i) — regenerated identically on any
  * executor, no stored model.
  */
case class LshBucketExpr(child: Expression, bits: Int, seed: Long)
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(bits <= 63)
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(NativeInputTypes.numericArray)
  override def dataType: DataType = LongType
  private lazy val isFloat = NativeExpressions.isFloatArray(child)
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < bits) {
      val planeSeed = XXH64.hashLong(p.toLong, seed)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val sign = if ((XXH64.hashLong(i.toLong, planeSeed) & 1L) == 1L) 1.0 else -1.0
        proj += sign * NativeExpressions.numAt(v, i, isFloat)
        i += 1
      }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

/** Bloom-filter membership probe for a LongType hash column, full codegen:
  * the probe is one virtual call inside the surrounding WholeStageCodegen
  * span, so a bloom-prefiltered scan stays a single map-only stage. The
  * filter rides as a Spark Broadcast, NOT as plan-constant bytes: every
  * task deserializes the plan (and would re-parse embedded bytes), while
  * `broadcast.value` is fetched and cached once per executor JVM — the
  * difference between per-task and per-executor cost for a corpus-scale
  * filter of hundreds of MB.
  *
  * False positives are by construction fine (callers verify positives
  * exactly); false negatives are impossible, so a `false` here is a proof
  * of absence from the corpus the filter was built on.
  */
case class BloomMightContainExpr(child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  def mightContain(h: Long): Boolean = bloom.value.mightContainLong(h)
  override def nullSafeEval(h: Any): Any = mightContain(h.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContainExpr].getName)
    defineCodeGen(ctx, ev, h => s"$ref.mightContain($h)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

/** Word n-grams of a token array as space-joined strings. `distinct = true`
  * (the decontamination gram generator) emits each gram once via one hash
  * set; `distinct = false` (the language-model formulation) emits every
  * occurrence in document order. One pass either way; replaces an
  * interpreted transform/sequence/slice/concat_ws/array_distinct HOF chain
  * (each step re-allocating per window). Short docs (< n tokens) collapse
  * to the whole doc as a single gram, exactly like the column formulation
  * in TextFunctions.wordShingles.
  */
case class WordNgramsExpr(child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(n >= 1, s"n must be positive: $n")
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(NativeInputTypes.stringArray)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val sep = UTF8String.fromString(" ")
    if (m < n) {
      val whole = new Array[UTF8String](m)
      var i = 0
      while (i < m) { whole(i) = arr.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(sep, whole: _*)))
    } else if (distinct) {
      val out = new java.util.LinkedHashSet[UTF8String]
      val window = new Array[UTF8String](n)
      var i = 0
      while (i <= m - n) {
        var j = 0
        while (j < n) { window(j) = arr.getUTF8String(i + j); j += 1 }
        out.add(UTF8String.concatWs(sep, window: _*))
        i += 1
      }
      new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
    } else {
      val out = new Array[Any](m - n + 1)
      val window = new Array[UTF8String](n)
      var i = 0
      while (i <= m - n) {
        var j = 0
        while (j < n) { window(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, window: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

/** Overlapping token-window chunks (space-joined) — the RAG / context-window
  * pre-processing step. Chunk k covers tokens [k*stride, k*stride+chunkSize)
  * clamped to the doc; trailing windows that would only repeat the previous
  * chunk's overlap (start + overlap >= n) are not emitted. Empty/short docs
  * yield exactly one chunk (possibly ""). One pass, no interpreted HOFs.
  */
case class TokenChunksExpr(child: Expression, chunkSize: Int, stride: Int)
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
    s"need 1 <= stride <= chunkSize: chunkSize=$chunkSize stride=$stride")
  private def overlap: Int = chunkSize - stride
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(NativeInputTypes.stringArray)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sep = UTF8String.fromString(" ")
    val count = if (n > overlap) 1 + (n - overlap - 1) / stride else 1
    val out = new Array[Any](count)
    var k = 0
    while (k < count) {
      val start = k * stride
      val end = math.min(start + chunkSize, n)
      val window = new Array[UTF8String](math.max(end - start, 0))
      var i = start
      while (i < end) { window(i - start) = arr.getUTF8String(i); i += 1 }
      out(k) = UTF8String.concatWs(sep, window: _*)
      k += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): TokenChunksExpr =
    copy(child = newChild)
}

/** Shannon entropy (nats) of a string's code-point frequency distribution —
  * the cheapest "is this natural text or noise/binary spill" quality signal
  * (garbage has near-uniform bytes → high entropy; template spam repeats a
  * few chars → low). One map-side pass: count code points into a hash map,
  * then sum `-(c/n) ln(c/n)` over keys in SORTED code-point order so the
  * result is deterministic across partitionings and JVMs (a hash-order sum
  * would reorder float additions). Empty/blank input → 0.0.
  */
case class CharEntropyExpr(child: Expression)
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Int, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var e = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      e -= p * math.log(p)
    }
    e
  }
  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

/** Span-mask rebuild for substring-level dedup
  * ([[graft.operators.Dedup.maskDuplicatedSpans]]): keep every token whose
  * index is NOT covered by any window `[s, s + n - 1]`, `s` in `starts`.
  * The HOF formulation (`filter(toks, (x,i) -> !exists(starts, ...))`) is
  * interpreted and O(tokens × starts) per row; this sorts a copy of the
  * (collect_set-unordered) starts once and sweeps both sequences with a
  * two-pointer pass — O(tokens + starts log starts), one tight loop.
  * Equivalence with the HOF formulation is pinned by spec.
  */
case class MaskSpansExpr(left: Expression, right: Expression, n: Int)
  extends BinaryExpression with CodegenFallback with ExpectsInputTypes {
  require(n >= 1, s"n must be positive: $n")
  override def inputTypes: Seq[NativeInputTypes.AbstractType] =
    Seq(NativeInputTypes.stringArray, NativeInputTypes.longArray)
  // kept elements COPY the input's, so element nullability must propagate —
  // claiming containsNull=false over a nullable-element input would let
  // downstream codegen skip null checks and misread
  override def dataType: DataType = ArrayType(StringType,
    containsNull = left.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })
  override def nullSafeEval(toksAny: Any, startsAny: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val toks = toksAny.asInstanceOf[ArrayData]
    val startsArr = startsAny.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val k = startsArr.numElements()
    if (k == 0) return toks.copy()
    // NULL start positions are skipped, not dereferenced: internal callers
    // (maskDuplicatedSpans' collect_set) never produce them, but the SQL
    // surface graft_mask_spans(toks, array(1L, NULL), n) would otherwise
    // NPE on getLong. A null start masks nothing — the only sane reading.
    val starts = new Array[Long](k)
    var kk = 0
    var j = 0
    while (j < k) {
      if (!startsArr.isNullAt(j)) { starts(kk) = startsArr.getLong(j); kk += 1 }
      j += 1
    }
    if (kk == 0) return toks.copy()
    java.util.Arrays.sort(starts, 0, kk)
    val kept = new java.util.ArrayList[UTF8String](m)
    var p = 0
    var i = 0
    while (i < m) {
      // windows ending before i can never cover i (starts ascend)
      while (p < kk && starts(p) + n - 1 < i) p += 1
      if (!(p < kk && starts(p) <= i)) kept.add(toks.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(kept.toArray(new Array[AnyRef](kept.size())))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaskSpansExpr =
    copy(left = newLeft, right = newRight)
}

/** Repetition counters for Gopher-style quality filtering (the repetition
  * family of rules: "fraction of duplicate words" and "fraction of bigram
  * occurrences taken by the most common bigram"), computed in ONE pass over
  * the token array instead of an explode + two shuffled aggregations per
  * document. Returns struct<n_tokens, n_distinct, top_bigram> (ints; the
  * fractions are derived in the query layer from these exact counters so
  * both engines divide identical integers).
  *
  * Map-only by construction: the whole per-document tally lives in two
  * small hash maps sized by the document, so the operator scales with
  * corpus bytes, never with corpus cardinality.
  */
case class RepetitionStatsExpr(child: Expression)
  extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(NativeInputTypes.stringArray)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false)))
  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val words = new java.util.HashSet[UTF8String](math.max(n * 2, 4))
    val bigrams = new java.util.HashMap[UTF8String, Int](math.max(n * 2, 4))
    val sep = UTF8String.fromString(" ")
    var top = 0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      words.add(tok)
      if (prev != null) {
        val bg = UTF8String.concatWs(sep, prev, tok)
        val c = bigrams.merge(bg, 1, (a, b) => a + b)
        if (c > top) top = c
      }
      prev = tok
      i += 1
    }
    InternalRow(n, words.size, top)
  }
  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

/** Z-order (Morton) key: interleaves the low `bitsPerDim` bits of each
  * dimension (dim k's bit i lands at output bit `i * nDims + k`) into one
  * long, so lexicographic order on the key is Z-curve order over the
  * dimension space. Range-partitioning + sorting by this key clusters rows
  * so every output file's min/max footer stats form a tight box on EVERY
  * dimension — multi-column range predicates then prune row groups on any
  * dim combination, where a single-column sort helps only its leading
  * column (the data-layout half of the 100 TB pruning story; the query
  * half is predicate pushdown, pinned in PlanAuditSpec).
  *
  * Values are masked to `bitsPerDim` bits (documents' caller contract:
  * dims must fit, or collisions merely weaken clustering — never
  * correctness, since the key is only a layout/grouping value). The oracle
  * reproduces the same key with explicit shift/mask arithmetic, so the
  * masking and bit placement are cross-engine-pinned, not just spec'd.
  */
case class InterleaveBitsExpr(children: Seq[Expression], bitsPerDim: Int)
  extends Expression with CodegenFallback with ExpectsInputTypes {
  require(children.nonEmpty, "zorderKey needs at least one dimension")
  require(bitsPerDim > 0 && children.size * bitsPerDim <= 63,
    s"${children.size} dims x $bitsPerDim bits must fit a positive long")
  override def inputTypes: Seq[NativeInputTypes.AbstractType] =
    Seq.fill(children.size)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val n = children.size
    val mask = (1L << bitsPerDim) - 1
    var z = 0L
    var dim = 0
    while (dim < n) {
      val v = children(dim).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long] & mask
      var i = 0
      while (i < bitsPerDim) {
        z |= ((x >>> i) & 1L) << (i * n + dim)
        i += 1
      }
      dim += 1
    }
    z
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBitsExpr =
    copy(children = newChildren)
}
