package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are laid end-to-end
  * in id order and the token stream is cut into fixed-size context
  * windows ("concat-and-chunk" — the packing strategy most pretraining
  * pipelines use, because it wastes zero tokens to padding). Each
  * document is assigned its global token offset and the range of
  * context windows it spans.
  *
  * The global offset is an exclusive prefix sum over a total order —
  * the one genuinely sequential step in a data pipeline — computed with
  * the classic two-phase distributed scan:
  *
  *   1. bucket rows by a DETERMINISTIC function of the id
  *      (`pid = (id - min) div stride`) — NOT `repartitionByRange`,
  *      whose boundaries come from seeded sampling and can differ
  *      between the two passes below, silently mis-keying the base
  *      offsets;
  *   2. per-bucket TOTALS (numPartitions rows, not data) are collected,
  *      cumulated on the driver, and shipped back as a broadcast
  *      base-offset map (the same "tiny model rides the plan" idiom as
  *      k-means centroids in [[VectorOps]]);
  *   3. per-bucket LOCAL running sums in a single `mapPartitions` pass
  *      (justified imperative per-partition logic: a running
  *      accumulator has no declarative spelling that avoids a
  *      single-task global window); buckets are contiguous under the
  *      (pid, id) sort, so the accumulator resets on bucket change and
  *      stays correct even when several buckets share a physical
  *      partition.
  *
  * At 100 TB this is one shuffle plus two aggregate-light passes; the
  * driver never sees more rows than there are buckets. The naive
  * `Window.orderBy(id)` spelling funnels the whole corpus through ONE
  * task — the scale-killer this operator exists to avoid.
  */
object PackingOps {

  /** @param df          input
    * @param idCol       total-order key (unique)
    * @param weight      per-row token count (any integral expression)
    * @param chunkTokens context-window size in tokens
    * @param parts       id-range buckets (default: shuffle partitions)
    * @return (id, n_tok, start_tok, chunk_first, chunk_last) — the
    *         global token offset and the inclusive window range each
    *         document spans
    */
  def packChunks(df: DataFrame, idCol: String, weight: Column,
      chunkTokens: Long, parts: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val nParts = if (parts > 0) parts
      else spark.sessionState.conf.numShufflePartitions
    val base = df
      .select(col(idCol).cast("long").as("id"), weight.cast("long").as("n"))
    val boundRow = base.agg(min("id"), max("id")).collect().head
    if (boundRow.isNullAt(0)) {
      // empty input: empty output with the right schema
      return base.select(col("id"), col("n").as("n_tok"),
        col("n").as("start_tok"), col("n").as("chunk_first"),
        col("n").as("chunk_last")).limit(0)
    }
    val lo = boundRow.getLong(0)
    val stride = math.max(1L, (boundRow.getLong(1) - lo) / nParts + 1)
    val withPid = base.withColumn("pid",
      expr(s"CAST((id - $lo) DIV $stride AS INT)"))
    // pass 1 of the scan: per-bucket totals (map-side combined -> tiny)
    // cumulated on the driver. Deliberately driver-side: the result is
    // O(buckets), never O(rows).
    val totals = withPid.groupBy("pid").agg(sum("n").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val bases = {
      var acc = 0L
      totals.map { case (pid, t) => val b = acc; acc += t; (pid, b) }.toMap
    }
    // pass 2: local running sums; (pid, id) sort makes buckets
    // contiguous, so the accumulator resets per bucket and the result
    // is deterministic under any pid -> physical-partition mapping
    val local = withPid.select(col("pid"), col("id"), col("n"))
      .repartition(nParts, col("pid"))
      .sortWithinPartitions("pid", "id")
      .as[(Int, Long, Long)]
      .mapPartitions { it =>
        var cur = Int.MinValue
        var acc = 0L
        it.map { case (pid, id, n) =>
          if (pid != cur) { cur = pid; acc = 0L }
          val start = acc; acc += n; (pid, id, n, start)
        }
      }.toDF("pid", "id", "n_tok", "local_start")
    local
      .select(col("id"),
        col("n_tok"),
        (element_at(typedlit(bases), col("pid")) + col("local_start"))
          .as("start_tok"))
      .withColumn("chunk_first", expr(s"start_tok div $chunkTokens"))
      .withColumn("chunk_last",
        expr(s"(start_tok + n_tok - 1) div $chunkTokens"))
  }
}
