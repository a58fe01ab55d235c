package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.2's UDF/UDAF/UDTF row): the sanctioned
  * Spark extension point for custom aggregation is
  * `Aggregator[IN, BUF, OUT]` registered through `functions.udaf` —
  * Catalyst plans it as a regular partial+final aggregate pair, so
  * map-side combine and AQE work unchanged.
  *
  * GCD is chosen as the gate aggregate deliberately: it is
  * commutative + associative over exact integers, so the result is
  * IDENTICAL under any partitioning, merge order, retry, or AQE
  * replan — the determinism bar every cross-row operator in this repo
  * must clear (a float UDAF would need the decimal-image discipline
  * instead). */
object GcdAggregator extends Aggregator[Long, Long, Long] {
  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long =
    if (b == 0L) math.abs(a) else gcd(b, a % b)
  override def zero: Long = 0L // gcd(0, x) = x: the fold identity
  override def reduce(buf: Long, x: Long): Long = gcd(buf, x)
  override def merge(a: Long, b: Long): Long = gcd(a, b)
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
