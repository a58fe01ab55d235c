package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-LAYOUT operators: keys that decide how rows are arranged in
  * files so later scans can skip most of them.
  *
  * Z-ordering (bit-interleaved multi-dimensional clustering — the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`): sorting by
  * the interleaved key places rows close in EVERY dimension close in
  * the file order, so per-file min/max statistics become selective
  * for predicates on ANY of the participating columns — a plain sort
  * gives that for its leading column only. At 100 TB the layout job
  * is `repartitionByRange(zorderKey(...))` + `sortWithinPartitions`
  * at WRITE time (one planned exchange owned by the writer, exactly
  * like [[SampleOps.epochShuffle]]); every subsequent scan pays less.
  *
  * The key is pure per-row integer arithmetic — engine-independent
  * and SQL-replayable bit-for-bit, like every layout decision here.
  */
object LayoutOps {

  /** Interleave the low `bits` bits of two non-negative bucket
    * columns: x occupies even bit positions, y odd — the classic
    * Morton / Z-curve code. Both inputs must already be bucketed into
    * [0, 2^bits); compose with modulo or range bucketing upstream. */
  def zorderKey(bx: Column, by: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftright(bx, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(by, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }
}
