package graft.plans

import java.math.BigInteger
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Exact fixed-point SUM via 128-bit integer accumulation.
  *
  * The engine's determinism convention sums money as
  * `SUM(CAST(x AS DECIMAL(18,s)))` — exact, but Spark widens the result to
  * DECIMAL(28,s), whose >18-digit precision leaves the long-backed Decimal
  * fast path: every accumulate goes through a byte-array-backed BigDecimal
  * (measured ~50x slower than a long sum on the q01 battery entry).
  *
  * This aggregate keeps the same math exactly while staying on primitive
  * longs: each input is reduced to its unscaled long (the DECIMAL(18,s)
  * cast, identical rounding to the plain-SQL form), accumulated into a
  * two-long (hi, lo) 128-bit signed integer with an expression-level
  * carry — the same design as DuckDB's HUGEINT and ClickHouse's Int128
  * decimal sums. 128 bits cannot overflow from DECIMAL(18) inputs before
  * ~1.7e20 rows, so the 100 TB headroom argument of the decimal convention
  * is preserved (a plain long accumulator would overflow a scale-6 sum at
  * TPC-H SF~100k). All update/merge expressions are Catalyst built-ins
  * (add/bitwise/shift) — fully codegen'd inside HashAggregate; only the
  * final (hi, lo) -> Decimal conversion is an eval-mode expression, once
  * per group.
  *
  * Result type DECIMAL(38,s); SQL surface `graft_money_sum(x, s)`
  * ([[GraftExtensions]]). Same null semantics as SUM: null inputs are
  * skipped, empty/all-null groups yield NULL.
  */
case class FixedPointSum(child: Expression, scale: Int) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, scale)
  override def prettyName: String = "graft_money_sum"

  private val hi = AttributeReference("hi", LongType, nullable = false)()
  private val lo = AttributeReference("lo", LongType, nullable = false)()
  private val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, cnt)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  private def legacyAdd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY) // wrapping long add — carries handled below

  /** (hi, lo) + (vHi, vLo) in 128-bit two's complement. Carry-out of the
    * unsigned low-word add: ((a & b) | ((a | b) & ~sum)) >>> 63.
    */
  private def add128(curHi: Expression, curLo: Expression,
      vHi: Expression, vLo: Expression): (Expression, Expression) = {
    val newLo = legacyAdd(curLo, vLo)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(curLo, vLo),
        BitwiseAnd(BitwiseOr(curLo, vLo), BitwiseNot(newLo))),
      Literal(63))
    val newHi = legacyAdd(legacyAdd(curHi, vHi), carry)
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // identical rounding to SUM(CAST(x AS DECIMAL(18,s))): DOUBLE inputs go
    // through [[DoubleUnscaled]] (guarded fast path, exact-Cast fallback,
    // value-identical); anything else through the literal Cast. Overflowing
    // casts are null -> skipped, as in SUM.
    // BRANCH-FREE null skip (coalesce to adding zero) rather than
    // If(IsNull(u), keep, add): the unscale is the expensive term and
    // appears in several sub-expressions — unconditional forms let
    // codegen's common-subexpression elimination evaluate it once per row,
    // while expressions under conditional branches are re-evaluated per
    // use.
    val u = child.dataType match {
      case DoubleType => DoubleUnscaled(child, scale)
      case _ => UnscaledValue(Cast(child, DecimalType(18, scale)))
    }
    val vLo = Coalesce(Seq(u, Literal(0L)))
    val vHi = ShiftRight(vLo, Literal(63)) // sign extension
    val (newHi, newLo) = add128(hi, lo, vHi, vLo)
    Seq(
      newHi,
      newLo,
      legacyAdd(cnt, If(IsNull(u), Literal(0L), Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (newHi, newLo) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(newHi, newLo, legacyAdd(cnt.left, cnt.right))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)),
      Literal(null, dataType),
      Int128ToDecimal(hi, lo, scale))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FixedPointSum =
    copy(child = newChildren.head)
}

/** Unscaled long of `CAST(x AS DECIMAL(18, scale))` for a DOUBLE input,
  * with a guarded fast path. Spark's Cast goes through
  * `BigDecimal.valueOf(d)` — a Double.toString parse per row, the dominant
  * cost of the fixed-point sum. The fast path rounds in double space, which
  * is only valid when no rounding boundary can fall between the double's
  * TRUE value and its shortest-decimal representation (what BigDecimal
  * sees): both differ from the scaled double by at most
  * `ulp(d)*10^s/2 + ulp(d*10^s)/2`, so when the scaled value's distance to
  * the nearest half-integer exceeds that bound, nearest-integer rounding in
  * double space provably equals the HALF_UP decimal cast. Inside the window
  * (ties like 1.005, and values past 2^52) it falls back to the EXACT
  * Spark Cast path — so the expression is value-identical to
  * `UnscaledValue(Cast(x AS DECIMAL(18,s)))` on every input
  * (FixedPointSumProps pins this with adversarial tie generators).
  */
case class DoubleUnscaled(child: Expression, scale: Int)
  extends UnaryExpression with ExpectsInputTypes {
  require(scale >= 0 && scale < DoubleUnscaled.Pow10.length, s"unsupported scale $scale")
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // NaN/Inf/overflow -> null, like Cast
  override def nullSafeEval(input: Any): Any =
    DoubleUnscaled.toUnscaled(input.asInstanceOf[Double], scale)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      s"""
         |java.lang.Long boxed = graft.plans.DoubleUnscaled.toUnscaled($d, $scale);
         |${ev.isNull} = boxed == null;
         |${ev.value} = boxed == null ? 0L : boxed.longValue();
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): DoubleUnscaled =
    copy(child = newChild)
}

object DoubleUnscaled {
  private[plans] val Pow10: Array[Double] =
    Array(1.0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9)
  private val Max18 = 999999999999999999L

  /** Exact reference path: Spark's own double->decimal cast semantics. */
  private def slow(d: Double, scale: Int): java.lang.Long = {
    val dec = Decimal(d)
    if (dec.changePrecision(18, scale)) java.lang.Long.valueOf(dec.toUnscaledLong)
    else null
  }

  def toUnscaled(d: Double, scale: Int): java.lang.Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return null
    val f = Pow10(scale)
    val r = d * f
    // inside double-exact integer range, away from the tie window -> the
    // nearest integer of r equals the HALF_UP cast of the shortest repr
    if (math.abs(r) < 4.0e15) {
      val fl = math.floor(r)
      val frac = r - fl
      val eps = Math.ulp(d) * f + Math.ulp(r)
      if (math.abs(frac - 0.5) > eps) {
        val n = (if (frac > 0.5) fl + 1.0 else fl).toLong
        if (n > Max18 || n < -Max18) null else java.lang.Long.valueOf(n)
      } else slow(d, scale)
    } else slow(d, scale)
  }
}

/** (hi, lo) 128-bit signed integer -> Decimal(38, scale). Needs real codegen
  * (not CodegenFallback): an aggregate's evaluateExpression is generated in
  * contexts where the buffer lives in codegen variables with no input row
  * for a fallback `eval(input)` call (global no-key aggregation).
  */
case class Int128ToDecimal(left: Expression, right: Expression, scale: Int)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[NativeInputTypes.AbstractType] = Seq(LongType, LongType)
  override def dataType: DataType = DecimalType(38, scale)
  // MUST be nullable even though the children (buffer slots) are not:
  // toDecimal can return null on >38-digit overflow, and — the subtle part —
  // nullSafeCodeGen only DECLARES the isNull variable for nullable
  // expressions; with nullable=false the generated assignment below would
  // reference an undeclared symbol, fail Janino compilation, and silently
  // fall back to interpreted execution (defeating this class's point).
  override def nullable: Boolean = true
  override def nullSafeEval(h: Any, l: Any): Any =
    Int128ToDecimal.toDecimal(h.asInstanceOf[Long], l.asInstanceOf[Long], scale)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (h, l) => {
      s"""
         |${ev.value} = graft.plans.Int128ToDecimal.toDecimal($h, $l, $scale);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128ToDecimal =
    copy(left = newLeft, right = newRight)
}

object Int128ToDecimal {
  /** Shared by eval and generated code. Returns null only on the
    * (practically unreachable) >38-digit overflow.
    */
  def toDecimal(hi: Long, lo: Long, scale: Int): Decimal = {
    val loUnsigned = new BigInteger(1,
      java.nio.ByteBuffer.allocate(8).putLong(lo).array())
    val big = BigInteger.valueOf(hi).shiftLeft(64).add(loUnsigned)
    val d = Decimal(new java.math.BigDecimal(big, scale))
    if (d.changePrecision(38, scale)) d else null
  }
}
