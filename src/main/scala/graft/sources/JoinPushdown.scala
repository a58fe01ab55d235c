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
