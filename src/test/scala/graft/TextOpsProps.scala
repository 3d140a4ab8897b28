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
}
