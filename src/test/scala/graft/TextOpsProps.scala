package graft

import graft.plans.{RepetitionStatsExpr, TokenChunksExpr, WordNgramsExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Structural laws of the native text window expressions, evaluated
  * directly against the Catalyst eval path (no session): chunking must
  * cover every token exactly once per stride step with no doc splits, and
  * n-gram generation must equal the distinct sliding windows. These are
  * the invariants the oracle queries assume when they reconstruct the same
  * windows in SQL.
  */
object TextOpsProps extends Properties("TextOps") {

  private val tokenGen: Gen[String] =
    Gen.oneOf(Gen.oneOf("a", "b", "c", "dog", "fox"), Gen.alphaLowerStr.map(_.take(4) + "x"))
  private val tokensGen: Gen[List[String]] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, tokenGen))

  private val childRef = BoundReference(0, ArrayType(StringType), nullable = true)

  private def evalArray(expr: org.apache.spark.sql.catalyst.expressions.Expression,
      tokens: Seq[String]): Seq[String] = {
    val arr = new GenericArrayData(tokens.map(t => UTF8String.fromString(t): Any).toArray)
    expr.eval(InternalRow(arr)).asInstanceOf[ArrayData]
      .toObjectArray(StringType).map(_.toString).toSeq
  }

  property("tokenChunks: exact stride windows, full coverage, no splits") =
    forAll(tokensGen, Gen.chooseNum(1, 10), Gen.chooseNum(1, 10)) { (toks, size0, stride0) =>
      val size = math.max(size0, stride0)
      val stride = math.min(size0, stride0) // 1 <= stride <= size
      val overlap = size - stride
      val n = toks.length
      val chunks = evalArray(TokenChunksExpr(childRef, size, stride), toks)
      val expectedCount = if (n > overlap) 1 + (n - overlap - 1) / stride else 1
      val shapesMatch = chunks.zipWithIndex.forall { case (c, k) =>
        c == toks.slice(k * stride, k * stride + size).mkString(" ")
      }
      val covered = n == 0 || (chunks.length - 1) * stride + size >= n
      chunks.length == expectedCount && shapesMatch && covered
    }

  property("repetitionStats: counters equal the collections-library reference") =
    forAll(tokensGen) { toks =>
      val arr = new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray)
      val row = RepetitionStatsExpr(childRef).eval(InternalRow(arr))
        .asInstanceOf[InternalRow]
      val expectedTop =
        if (toks.length < 2) 0
        else toks.sliding(2).map(_.mkString(" ")).toSeq.groupBy(identity).values.map(_.size).max
      row.getInt(0) == toks.length &&
        row.getInt(1) == toks.distinct.length &&
        row.getInt(2) == expectedTop
    }

  property("wordNgrams: distinct sliding windows; whole doc when short") =
    forAll(tokensGen, Gen.chooseNum(1, 9)) { (toks, n) =>
      val grams = evalArray(WordNgramsExpr(childRef, n), toks)
      val expected =
        if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toSet
        else Set(toks.mkString(" "))
      grams.toSet == expected && grams.distinct == grams
    }

  private val strRef = BoundReference(0, StringType, nullable = true)
  private def evalEntropy(s: String): Double =
    graft.plans.CharEntropyExpr(strRef)
      .eval(InternalRow(UTF8String.fromString(s))).asInstanceOf[Double]

  property("charEntropy: permutation-invariant, bounded by ln(k), 0 iff <= 1 distinct char") =
    forAll(Gen.alphaNumStr.map(_.take(80)), Gen.long) { (s, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(s.toList).mkString
      val e = evalEntropy(s)
      val k = s.toList.distinct.length
      math.abs(e - evalEntropy(shuffled)) < 1e-12 &&
        e >= 0.0 && e <= (if (k > 0) math.log(k.toDouble) + 1e-12 else 0.0) &&
        ((k <= 1) == (e == 0.0))
    }

  property("charEntropy: uniform string hits ln(k) exactly up to float noise") =
    forAll(Gen.chooseNum(1, 20)) { k =>
      val s = ('a' until ('a' + k).toChar).mkString
      math.abs(evalEntropy(s) - math.log(k.toDouble)) < 1e-12
    }

  property("maskSpans: equals brute-force coverage filter") =
    forAll(tokensGen, Gen.listOf(Gen.chooseNum(-2L, 70L)), Gen.chooseNum(1, 9)) {
      (toks, starts, n) =>
        val expr = graft.plans.MaskSpansExpr(
          BoundReference(0, ArrayType(StringType), nullable = true),
          BoundReference(1, ArrayType(LongType), nullable = true), n)
        val toksArr = new GenericArrayData(
          toks.map(t => UTF8String.fromString(t): Any).toArray)
        val startsArr = new GenericArrayData(starts.map(s => s: Any).toArray)
        val out = expr.eval(InternalRow(toksArr, startsArr))
          .asInstanceOf[ArrayData].toObjectArray(StringType).map(_.toString).toSeq
        val expected = toks.zipWithIndex.collect {
          case (t, i) if !starts.exists(s => i >= s && i <= s + n - 1) => t
        }
        out == expected
    }
}
