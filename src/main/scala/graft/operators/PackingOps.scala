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
  *   1. range-partition by id and sort within partitions (one shuffle);
  *   2. per-partition LOCAL running sums in a single `mapPartitions`
  *      pass (justified imperative per-partition logic: a running
  *      accumulator has no declarative spelling that avoids a
  *      single-task global window);
  *   3. per-partition TOTALS — numPartitions rows, not data — are
  *      collected, cumulated on the driver, and shipped back as a
  *      broadcast base-offset map (the same "tiny model rides the
  *      plan" idiom as k-means centroids in [[VectorOps]]).
  *
  * At 100 TB this is one shuffle plus two linear passes; the driver
  * never sees more rows than there are partitions. The naive
  * `Window.orderBy(id)` spelling funnels the whole corpus through ONE
  * task — the scale-killer this operator exists to avoid.
  */
object PackingOps {

  /** @param df          input
    * @param idCol       total-order key (unique)
    * @param weight      per-row token count (any integral expression)
    * @param chunkTokens context-window size in tokens
    * @param parts       range partitions (default: shuffle partitions)
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
    val ranged = df
      .select(col(idCol).cast("long").as("id"), weight.cast("long").as("n"))
      .repartitionByRange(nParts, col("id"))
      .sortWithinPartitions("id")
      .select(spark_partition_id().as("pid"), col("id"), col("n"))
      .as[(Int, Long, Long)]
    // pass 1 of the scan: per-partition totals (numPartitions rows) ->
    // exclusive cumsum on the driver. Deliberately driver-side: the
    // result is O(partitions), never O(rows).
    val totals = ranged.groupBy("pid").agg(sum("n").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val bases = {
      var acc = 0L
      totals.map { case (pid, t) => val b = acc; acc += t; (pid, b) }.toMap
    }
    // pass 2: local running sums; iterator order inside a partition is
    // the sortWithinPartitions order, so the accumulator is exact and
    // deterministic under task retry
    val local = ranged.mapPartitions { it =>
      var acc = 0L
      it.map { case (pid, id, n) =>
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
