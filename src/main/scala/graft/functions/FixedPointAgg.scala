package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Round-14 (VERDICT r13 item 7): the exact long-backed fixed-point
  * SUM behind `CoreQueries.dsum`/`davg`.
  *
  * The determinism mechanism those helpers implement —
  * `sum(col.cast(DECIMAL(25,6))).cast(DOUBLE)`, so partial-sum order
  * can never change the double — pays for its exactness in the
  * aggregation buffer: precision 25 input makes the sum buffer
  * precision 35, which UnsafeRow stores as a byte array, so EVERY
  * row's update deserializes a java BigDecimal, adds, and reserializes
  * (measured: q01's 600 k-row aggregate stage spent ~2 s there, ~6× a
  * long-sum's cost, across q01/q11/q25/q48/q49/q33/q31…).
  *
  * This aggregate keeps the EXACT same arithmetic on two plain longs:
  *
  *   - per row, [[ScaledLong]] produces the unscaled long of
  *     `Cast(value, DECIMAL(18, s))` via Spark's own
  *     `Decimal.changePrecision` (identical HALF_UP rounding by
  *     construction), THROWING on |value| ≥ 10^(18−s) instead of
  *     silently nulling — the narrowed per-row range is the documented
  *     trade, and q01-family magnitudes (≤ ~10⁶) sit 6 orders below
  *     the guard;
  *   - the running sum is hi·10¹⁸ + lo with |lo| < 10¹⁸ kept by a
  *     single conditional carry (|lo + v| < 2·10¹⁸ always, so one
  *     carry suffices; same for merge) — exact integer arithmetic,
  *     associative and commutative, so ANY partial-sum order yields
  *     identical words. hi overflows long only past |sum| ≈ 9.2·10³⁶
  *     in scaled units — unreachable with per-row values < 10¹⁸ and
  *     any physical row count;
  *   - [[FixedPointToDouble]] renders the final double through
  *     java.math.BigDecimal(unscaled128, s).doubleValue() — the same
  *     correctly-rounded conversion `Decimal.toDouble` performs, so
  *     the result is BIT-identical to the decimal spelling
  *     (spec-pinned in Round14OpsSpec across rounding-boundary values,
  *     negatives, sf10-range magnitudes, and partial-sum orders).
  *
  * Null semantics match SQL SUM: null rows are skipped; an all-null or
  * empty group yields null.
  */
case class FixedPointSum(child: Expression, scale: Int)
    extends DeclarativeAggregate {

  require(scale >= 0 && scale <= 17, s"scale in [0,17]: $scale")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fixed_point_sum needs a DOUBLE child, got $other")
    }

  private val W = 1000000000000000000L // 10^18: one carry normalizes

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val isEmpty =
    AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, isEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))

  /** (newHi, newLo) with |newLo| < W restored by one conditional
    * carry; `rawLo` must satisfy |rawLo| < 2·W (one buffer word plus
    * one row value, or two buffer words — both bounded). */
  private def carried(rawHi: Expression, rawLo: Expression)
      : (Expression, Expression) = {
    val carry = If(GreaterThanOrEqual(rawLo, Literal(W)), Literal(1L),
      If(LessThanOrEqual(rawLo, Literal(-W)), Literal(-1L), Literal(0L)))
    (Add(rawHi, carry), Subtract(rawLo, Multiply(carry, Literal(W))))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val v = ScaledLong(child, scale)
    val v0 = Coalesce(Seq(v, Literal(0L)))
    val (nHi, nLo) = carried(hi, Add(lo, v0))
    Seq(nHi, nLo, And(isEmpty, IsNull(v)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nHi, nLo) = carried(Add(hi.left, hi.right), Add(lo.left, lo.right))
    Seq(nHi, nLo, And(isEmpty.left, isEmpty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(isEmpty, Literal(null, DoubleType), FixedPointToDouble(hi, lo, scale))
}

/** Unscaled long of `Cast(child, DECIMAL(18, scale))` — Spark's own
  * `Decimal.changePrecision` (HALF_UP), so per-row rounding is
  * bit-identical to the decimal cast it replaces. Overflow of
  * precision 18 THROWS (the cast would return null under non-ANSI and
  * a sum would silently skip the row): exactness must fail loudly. */
case class ScaledLong(child: Expression, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"scaled_long needs DOUBLE, got $other")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scaledLong", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Long) $ref.nullSafeEval($c);")
  }

  override def nullSafeEval(input: Any): Any = {
    val d = input.asInstanceOf[Double]
    val dec = org.apache.spark.sql.types.Decimal(d)
    if (!dec.changePrecision(18, scale)) throw new ArithmeticException(
      s"fixed_point_sum(scale=$scale): |$d| exceeds DECIMAL(18,$scale) — " +
        "this value range needs the wide-decimal sum, not the " +
        "long-backed fixed-point path")
    dec.toUnscaledLong
  }

  override protected def withNewChildInternal(newChild: Expression): ScaledLong =
    copy(child = newChild)
}

/** Exact double of the 128-bit fixed-point value hi·10¹⁸ + lo at
  * `scale` — the same java.math.BigDecimal.doubleValue() conversion
  * `Decimal.toDouble` ends in, evaluated once per output group. */
case class FixedPointToDouble(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fixed_point_to_double needs (long, long), got $other")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fixedPointToDouble", this)
    nullSafeCodeGen(ctx, ev, (h, l) =>
      s"${ev.value} = (Double) $ref.nullSafeEval($h, $l);")
  }

  override def nullSafeEval(hiAny: Any, loAny: Any): Any = {
    val hi = hiAny.asInstanceOf[Long]
    val lo = loAny.asInstanceOf[Long]
    val unscaled = java.math.BigInteger.valueOf(hi)
      .multiply(java.math.BigInteger.valueOf(1000000000000000000L))
      .add(java.math.BigInteger.valueOf(lo))
    new java.math.BigDecimal(unscaled, scale).doubleValue()
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FixedPointToDouble =
    copy(left = newLeft, right = newRight)
}

/** Round-14: the exact long-backed fixed-point spelling of
  * `sum(a.cast(DECIMAL(18,sa)) * b.cast(DECIMAL(18,sb))).cast(DOUBLE)`
  * — q49's co-moment sums (`CoreQueries.dprod`). Same mechanism and
  * equality argument as [[FixedPointSum]]: each factor is scaled by
  * Spark's own `Decimal.changePrecision` (identical HALF_UP rounding
  * to the cast), the PRODUCT of the two scaled longs IS the exact
  * unscaled value of the decimal product at scale sa+sb (decimal
  * multiplication is exact at full result scale), integer
  * accumulation in the hi·10¹⁸+lo two-word buffer is exact in any
  * partial-sum order, and the final double comes from the same
  * BigDecimal→double conversion. Per-row |product| ≥ 10¹⁸ (the
  * single-carry invariant bound — |a·b| ≥ 10^(18−sa−sb) in real
  * units) THROWS instead of widening: q49's (quantity, discount)
  * magnitude discipline sits 14 orders below the guard. */
case class FixedPointProductSum(a: Expression, b: Expression,
    scaleA: Int, scaleB: Int) extends DeclarativeAggregate {

  require(scaleA >= 0 && scaleA <= 17 && scaleB >= 0 && scaleB <= 17,
    s"scales in [0,17]: $scaleA, $scaleB")

  override def children: Seq[Expression] = Seq(a, b)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(a = newChildren(0), b = newChildren(1))
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fixed_point_product_sum needs DOUBLE children, got $other")
    }

  private val W = 1000000000000000000L // 10^18: one carry normalizes

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val isEmpty =
    AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, isEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))

  private def carried(rawHi: Expression, rawLo: Expression)
      : (Expression, Expression) = {
    val carry = If(GreaterThanOrEqual(rawLo, Literal(W)), Literal(1L),
      If(LessThanOrEqual(rawLo, Literal(-W)), Literal(-1L), Literal(0L)))
    (Add(rawHi, carry), Subtract(rawLo, Multiply(carry, Literal(W))))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val v = ScaledProduct(a, b, scaleA, scaleB)
    val v0 = Coalesce(Seq(v, Literal(0L)))
    val (nHi, nLo) = carried(hi, Add(lo, v0))
    Seq(nHi, nLo, And(isEmpty, IsNull(v)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val (nHi, nLo) = carried(Add(hi.left, hi.right), Add(lo.left, lo.right))
    Seq(nHi, nLo, And(isEmpty.left, isEmpty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(isEmpty, Literal(null, DoubleType),
      FixedPointToDouble(hi, lo, scaleA + scaleB))
}

/** Exact unscaled long (scale sa+sb) of
  * `Cast(a, DECIMAL(18,sa)) * Cast(b, DECIMAL(18,sb))` — each factor
  * scaled via Spark's `Decimal.changePrecision` (bit-identical HALF_UP
  * per-factor rounding to the casts), the product computed in exact
  * long arithmetic. Throws on factor overflow of DECIMAL(18) or on a
  * product ≥ 10¹⁸ (the fixed-point buffer's single-carry bound):
  * exactness must fail loudly, never silently null or wrap. */
case class ScaledProduct(a: Expression, b: Expression,
    scaleA: Int, scaleB: Int) extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"scaled_product needs DOUBLE children, got $other")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scaledProduct", this)
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = (Long) $ref.nullSafeEval($x, $y);")
  }

  private def scaled(d: Double, scale: Int): Long = {
    val dec = org.apache.spark.sql.types.Decimal(d)
    if (!dec.changePrecision(18, scale)) throw new ArithmeticException(
      s"fixed_point_product_sum(scale=$scale): |$d| exceeds " +
        "DECIMAL(18,scale) — this value range needs the wide-decimal " +
        "sum, not the long-backed fixed-point path")
    dec.toUnscaledLong
  }

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val pa = scaled(aAny.asInstanceOf[Double], scaleA)
    val pb = scaled(bAny.asInstanceOf[Double], scaleB)
    val prod = try Math.multiplyExact(pa, pb)
    catch { case _: ArithmeticException => throw new ArithmeticException(
      s"fixed_point_product_sum: |$pa * $pb| overflows long — this " +
        "value range needs the wide-decimal sum") }
    val lim = 1000000000000000000L // 10^18: the accumulator's carry bound
    if (prod >= lim || prod <= -lim) throw new ArithmeticException(
      s"fixed_point_product_sum: |$prod| >= 10^18 breaks the " +
        "single-carry accumulator bound — this value range needs the " +
        "wide-decimal sum")
    prod
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScaledProduct =
    copy(a = newLeft, b = newRight)
}
