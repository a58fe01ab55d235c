package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus — the BM25 + rank-fusion pair a
  * RAG / data-curation stack runs next to the embedding ANN path
  * (VectorOps): BM25 finds the keyword matches dense retrieval misses,
  * and reciprocal-rank fusion merges the two lists without score
  * calibration.
  *
  * Scale shape (the inverted-index join, not a cross product):
  *   - the corpus is tokenized ONCE and immediately filtered to the
  *     query batch's vocabulary — a per-row broadcast-literal screen,
  *     so the posting aggregates only ever see matching postings
  *     (query vocab · avg posting length rows, never corpus · terms);
  *   - tf is a map-side-combined groupBy on (doc, term); df is a
  *     window over the SAME posting set (one corpus scan total — a
  *     groupBy-and-rejoin spelling would re-derive the posting subtree
  *     and read the corpus twice);
  *   - query terms ride a broadcast — the corpus never shuffles on
  *     anything but the pruned posting key;
  *   - per-query ranking runs on TopKPerKey (bounded heaps, no
  *     window sort over the corpus).
  *
  * Determinism: BM25 here uses the RATIO idf (N - df + 0.5)/(df + 0.5)
  * — the ln-free monotone variant, the same deliberate choice as
  * LmOps' probability-scale scoring (p22) — and folds per-document
  * term contributions in SORTED term order, so every score is a fixed
  * sequence of IEEE operations any ANSI engine replays bit-for-bit.
  * Ties break by doc id. */
object RetrievalOps {

  /** BM25 top-k per query. `queries` is the query batch (id, text) —
    * in production a small table; here it rides the plan as literals.
    * Returns (qid, doc_id, score, rank), rank 1 = best. */
  def bm25TopK(docsDf: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    val queryTerms = queries.flatMap { case (qid, q) =>
      q.split(" ").filter(_.nonEmpty).distinct.map(t => (qid, t))
    }
    val vocab = queryTerms.map(_._2).distinct

    val base = docsDf.select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("dl", size(col("__toks")))
    // corpus-wide stats: one O(1)-row aggregate, broadcast back
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl"))
    // postings, pruned to the query vocabulary BEFORE any shuffle
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(vocab: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency per term as a WINDOW over the posting set —
    // not a groupBy-then-self-join, which would RE-DERIVE the posting
    // subtree (Spark re-aliases attributes when a DataFrame appears
    // twice in one plan, defeating exchange reuse) and scan the corpus
    // twice. The window shuffles only the pruned postings on term —
    // the inherent retrieval cost — and the corpus is read ONCE.
    val withDf = postings.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    val qt = docsDf.sparkSession.createDataFrame(queryTerms)
      .toDF("qid", "term")

    val scored = withDf
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("tfw",
        (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .withColumn("contrib", col("idf") * col("tfw"))

    // fold contributions in sorted term order: a fixed IEEE operation
    // sequence (groupBy SUM over doubles is accumulation-order-
    // nondeterministic across partitions/retries — unacceptable for a
    // reproducible ranking, let alone an exact oracle)
    val perDoc = scored.groupBy(col("qid"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("contrib")))),
        lit(0.0),
        (acc, x) => acc + x.getField("contrib")).as("score"))

    val top = graft.plans.TopK.perKey(perDoc,
      keys = Seq(col("qid")),
      order = Seq(col("score").desc, col("doc_id").asc), k = k)
    // rank the k·|queries| survivors — the window never sees the corpus
    top.withColumn("rank", row_number().over(
      Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("doc_id").asc)))
  }

  /** Query-independent quality ranking: top-k docs by
    * [[TextOps.qualityScore]] (desc, id asc) with rank — the "static
    * prior" list rank fusion merges with per-query retrieval. Bounded:
    * orderBy+limit plans as TakeOrdered (per-partition heaps). */
  def qualityTopK(docsDf: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val scoredDocs = docsDf.select(col(idCol).cast("long").as("doc_id"),
      TextOps.qualityScore(col(textCol)).as("q"))
    scoredDocs.orderBy(col("q").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("q").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("rank"))
  }

  /** Reciprocal-rank fusion of two per-query rank lists (Cormack et
    * al.'s RRF): fused(d) = Σ_lists 1/(kRrf + rank_list(d)), absent
    * docs contribute 0. Needs no score calibration — only ranks —
    * which is why it is the standard way to merge lexical and dense
    * retrieval. Both inputs are top-k lists (k·|queries| rows), so
    * the join and re-rank run on bounded data regardless of corpus
    * size. Returns (qid, doc_id, fused, rank). */
  def rrfFuse(listA: DataFrame, listB: DataFrame,
      kRrf: Int = 60, topK: Int = 10): DataFrame = {
    val a = listA.select(col("qid"), col("doc_id"), col("rank").as("rank_a"))
    val b = listB.select(col("qid"), col("doc_id"), col("rank").as("rank_b"))
    val fused = a.join(b, Seq("qid", "doc_id"), "full_outer")
      .withColumn("fused",
        coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("rank_a").cast("double")),
          lit(0.0)) +
        coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("rank_b").cast("double")),
          lit(0.0)))
    val top = graft.plans.TopK.perKey(fused,
      keys = Seq(col("qid")),
      order = Seq(col("fused").desc, col("doc_id").asc), k = topK)
    top.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("fused").desc, col("doc_id").asc)))
      .select(col("qid"), col("doc_id"), col("rank_a"), col("rank_b"),
        col("fused"), col("rank"))
  }
}
