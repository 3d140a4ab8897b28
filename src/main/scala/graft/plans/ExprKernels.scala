package graft.plans

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static JVM kernels for the two hottest native expressions — ONE
  * definition each, called from BOTH execution modes: `nullSafeEval`
  * (interpreted) and the Janino code `doGenCode` emits (whole-stage
  * codegen). Scala top-level objects compile with static forwarders, so
  * generated Java calls `graft.plans.ExprKernels.method(...)` directly.
  *
  * Moving the loops here (rather than inlining Java source strings into
  * doGenCode) keeps the semantics provably identical across modes — the
  * codegen path cannot drift from the eval path because there is only
  * one body — and keeps the generated method tiny (a single static
  * call), which is what lets the surrounding operators stay fused in
  * one whole-stage region instead of breaking at a CodegenFallback
  * eval-mode boundary.
  */
object ExprKernels {

  /** MinHash signature over word shingles of a token array — see
    * [[NativeExpressions.minHashShingleSignature]] for the contract
    * (hash-fold shingle identity, min over multiset, empty-doc
    * signature mirroring wordShingles' empty-shingle fallback).
    */
  def minHashShingleSig(input: ArrayData, shingleSize: Int, numHashes: Int,
      seed: Long): ArrayData = {
    val n = input.numElements()
    if (n == 0) {
      // wordShingles' fallback gives an EMPTY doc one empty shingle; mirror
      // that (a real signature, not a sentinel) so empty docs still collapse
      // together and pair as exact duplicates
      val sh = XXH64.hashUTF8String(UTF8String.EMPTY_UTF8, seed)
      val out = new Array[Long](numHashes)
      var j = 0
      while (j < numHashes) { out(j) = XXH64.hashLong(sh, j); j += 1 }
      return new GenericArrayData(out)
    }
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = XXH64.hashUTF8String(input.getUTF8String(i), seed); i += 1
    }
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val windows = math.max(n - shingleSize + 1, 1)
    var w = 0
    while (w < windows) {
      var sh = th(w)
      var k = 1
      while (k < shingleSize && w + k < n) {
        sh = XXH64.hashLong(th(w + k), sh); k += 1
      }
      var j = 0
      while (j < numHashes) {
        val m = XXH64.hashLong(sh, j)
        if (m < out(j)) out(j) = m
        j += 1
      }
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Jaro–Winkler similarity — see [[JaroWinklerExpr]] for the bit-equality
    * contract with DuckDB (expression shapes are load-bearing; do not
    * re-associate).
    */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val j = jaro(s1, s2)
    if (j <= 0.7) j
    else {
      var l = 0
      val cap = math.min(4, math.min(s1.length, s2.length))
      while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1 - j)
    }
  }

  private def jaro(s1: String, s2: String): Double = {
    if (s1.isEmpty || s2.isEmpty) return 0.0
    if (s1 == s2) return 1.0
    val md = math.max(s1.length, s2.length) / 2 - 1
    val m1 = new Array[Boolean](s1.length)
    val m2 = new Array[Boolean](s2.length)
    var m = 0
    var i = 0
    while (i < s1.length) {
      val lo = math.max(0, i - md)
      val hi = math.min(s2.length, i + md + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < s1.length) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / s1.length + m.toDouble / s2.length +
      (m - t).toDouble / m) / 3
  }
}
