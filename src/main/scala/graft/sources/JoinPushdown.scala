package graft.sources

import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
import org.apache.spark.sql.connector.util.V2ExpressionSQLBuilder
import org.apache.spark.sql.types._

/** Compiles a Spark V2 `Expression`/`Predicate` tree to remote dialect
  * SQL — the join-condition counterpart of `Dialect.compileFilter`
  * (which covers the v1 `sources.Filter` algebra used by scan filter
  * pushdown). Spark's `V2ExpressionSQLBuilder` renders the ANSI
  * structure; this subclass owns the two dialect-sensitive leaves:
  * identifier quoting and literal rendering. `build` THROWS on
  * anything it cannot render faithfully — the caller treats any
  * exception as "do not push".
  */
private[sources] class V2PredicateSQL(dialect: Dialect)
  extends V2ExpressionSQLBuilder {

  override protected def visitNamedReference(ref: NamedReference): String = {
    // post-aliasing join references are single-part; anything else is
    // a structure we did not plan for — refuse rather than guess
    if (ref.fieldNames.length != 1)
      throw new IllegalArgumentException(s"nested reference $ref")
    dialect.quote(ref.fieldNames.head)
  }

  override protected def visitLiteral(l: Literal[_]): String = {
    val v = l.value()
    if (v == null) return "NULL"
    l.dataType() match {
      case DateType =>
        dialect.dateLiteral(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Number].longValue))
      case TimestampType =>
        // Instant semantics: same JVM-default-zone convention as the v1
        // filter path (Dialect.literal on Timestamp/Instant) and the
        // Literalizer write path — NOT UTC, or the pushed join condition
        // would disagree with pushed scan filters on a non-UTC JVM.
        dialect.timestampLiteral(
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .toJavaTimestamp(v.asInstanceOf[Number].longValue).toLocalDateTime)
      case TimestampNTZType =>
        // Wall-clock semantics: micros ARE the local date-time, no zone.
        dialect.timestampLiteral(
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .microsToLocalDateTime(v.asInstanceOf[Number].longValue))
      case _: DecimalType =>
        v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.toPlainString
      case _ =>
        dialect.literal(v).getOrElse(throw new IllegalArgumentException(
          s"no literal rendering for $v (${l.dataType()})"))
    }
  }
}

/** Scalar-function-capable filter compiler — the v2-Predicate half of
  * scan filter pushdown. Used ONLY for predicate trees the v1 `Filter`
  * algebra cannot express (scalar function calls like
  * `CHAR_LENGTH(c) > 10`): v1-expressible predicates keep the
  * battle-tested `Dialect.compileFilter` path, and a predicate that
  * path DECLINED is never retried here, so per-dialect exclusion rules
  * keep holding. Functions render through the dialect's explicit
  * whitelist ([[Dialect.scalarFn]]); everything outside it — casts,
  * null-safe equality, UDFs, aggregates — THROWS, and the caller
  * treats any exception as "do not push" (the predicate stays
  * Spark-side, which is always correct).
  */
private[sources] class ScalarPredicateSQL(
    dialect: Dialect, rename: String => Option[String])
  extends V2PredicateSQL(dialect) {

  import org.apache.spark.sql.connector.expressions.Expression

  /** Pushed filters are Exact (Spark never re-checks): refuse the one
    * comparison whose default ANSI rendering
    * (`IS NOT DISTINCT FROM`-style) several backends reject — the v1
    * path compiles null-safe equality with dialect knowledge, so a
    * `<=>` reaching THIS builder means an OR/fn combination we have
    * not verified per-dialect. */
  private def containsNullSafeEq(e: Expression): Boolean = e match {
    case g: org.apache.spark.sql.connector.expressions.GeneralScalarExpression
        if g.name == "<=>" => true
    case _ => e.children().exists(containsNullSafeEq)
  }

  override def build(e: Expression): String = {
    if (containsNullSafeEq(e))
      throw new IllegalArgumentException("null-safe equality stays Spark-side")
    super.build(e)
  }

  override protected def visitNamedReference(
      ref: org.apache.spark.sql.connector.expressions.NamedReference): String = {
    if (ref.fieldNames.length != 1)
      throw new IllegalArgumentException(s"nested reference $ref")
    val renamed = rename(ref.fieldNames.head).getOrElse(
      throw new IllegalArgumentException(
        s"column ${ref.fieldNames.head} does not exist remotely"))
    dialect.quote(renamed)
  }

  override protected def visitSQLFunction(
      fn: String, inputs: Array[String]): String =
    dialect.scalarFn(fn, inputs.toSeq).getOrElse(
      throw new IllegalArgumentException(
        s"scalar function $fn is not in the ${dialect.name} pushdown whitelist"))

  /** Cast semantics (overflow, truncation, string formats) differ per
    * engine — a mis-pushed cast silently changes rows. Never push. */
  override protected def visitCast(expr: String,
      exprType: org.apache.spark.sql.types.DataType,
      targetType: org.apache.spark.sql.types.DataType): String =
    throw new IllegalArgumentException("cast pushdown unsupported")

  override protected def visitUserDefinedScalarFunction(
      funcName: String, canonicalName: String, inputs: Array[String]): String =
    throw new IllegalArgumentException(s"UDF $funcName cannot push")

  override protected def visitAggregateFunction(
      funcName: String, isDistinct: Boolean, inputs: Array[String]): String =
    throw new IllegalArgumentException("aggregate in a filter cannot push")
}
