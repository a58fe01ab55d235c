package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for crawl curation. Production corpus
  * pipelines score SOURCES, not just documents: a host's position in
  * the web link graph (Common-Crawl-style host-level ranks) feeds the
  * same admission decisions as the per-document quality classifier —
  * a doc from a well-linked host earns a prior the text alone can't.
  * The reference engine has no graph surface; like ClusterOps this is
  * part of the LLM-pipeline extension.
  *
  * PageRank here is INTEGER-EXACT: ranks are carried as fixed-point
  * units (default 1e9 = "1.0") and every step is Long arithmetic —
  * integer division for the per-out-edge share, (sum * dampNum) div
  * dampDen for the damping. Floating-point PageRank is not
  * reproducible across engines or even across partitionings (float
  * addition is non-associative, and the inbound sum's order depends
  * on the shuffle); integer sums are associative, so the result is
  * bit-identical on Spark, DuckDB, or a 1000-executor cluster, and a
  * task retry can never change a rank. The quantization error per
  * step is < |out-edges| units ≈ 1e-9 of total mass — noise relative
  * to the signal, but DETERMINISTIC noise.
  *
  * Scale shape (standard Pregel-as-DataFrame):
  *   - per iteration: one join of the edge list with the per-node
  *     share table (hash on src) + one groupBy(dst) sum — both
  *     shuffles move the EDGE list; the rank table is |nodes| rows.
  *     Map-side combine collapses each task's contributions to its
  *     distinct dst set before the exchange.
  *   - the share table (node, share) is |nodes| rows; for web-scale
  *     graphs both sides are edge-partitioned equi-joins, no
  *     broadcast assumption.
  *   - iterations are a fixed count (rank converges geometrically;
  *     production host ranks run 10-20 rounds). Lineage is cut per
  *     round past `checkpointEvery` so the plan stays bounded.
  *   - dangling nodes (no out-edges) simply leak their damped mass,
  *     the common simplification for relative host ordering; the
  *     redistribute-to-all variant would add one scalar aggregate
  *     per round.
  */
object GraphOps {

  /** Fixed-iteration integer PageRank over a directed edge list.
    *
    * @param edges    one row per directed edge (duplicates and self
    *                 loops are dropped)
    * @param srcCol / dstCol edge endpoint columns (any type; compared
    *                 as-is — hosts are strings, doc ids longs)
    * @param iters    fixed iteration count
    * @param unit     fixed-point scale: rank 1.0 == `unit` units
    * @param dampNum / dampDen damping factor as an exact rational
    *                 (85/100, never the double 0.85)
    * @return (node, rank_units: Long) — every node that appears as an
    *         endpoint; Σ rank_units ≤ unit (mass leaks through
    *         dangling nodes and division floors, deterministically).
    */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String, iters: Int = 3,
      unit: Long = 1000000000L, dampNum: Long = 85, dampDen: Long = 100,
      checkpointEvery: Int = 8): DataFrame =
    run(edges, srcCol, dstCol, None, iters, unit, dampNum, dampDen,
      checkpointEvery)

  /** PERSONALIZED PageRank: the teleport distribution concentrates on
    * a SEED set instead of all nodes — "rank relative to these trusted
    * hosts", the crawl-curation prior that upranks pages reachable
    * from a vetted whitelist (TrustRank-style) rather than globally
    * popular ones. Same integer-exact arithmetic: seeds carry
    * base = ((unit·(den−num)) div den) div |seeds∩nodes| and
    * init = unit div |seeds∩nodes|; non-seeds carry 0 of both, so
    * their steady-state rank is purely inherited mass. Seeds outside
    * the graph's node set are ignored (they have no edges to receive
    * or spread mass through).
    *
    * @param seeds one column (`seedCol`) of node ids */
  def personalizedPageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 3,
      unit: Long = 1000000000L, dampNum: Long = 85, dampDen: Long = 100,
      checkpointEvery: Int = 8): DataFrame =
    run(edges, srcCol, dstCol,
      Some(seeds.select(col(seedCol).as("node")).distinct()),
      iters, unit, dampNum, dampDen, checkpointEvery)

  private def run(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Option[DataFrame], iters: Int, unit: Long,
      dampNum: Long, dampDen: Long, checkpointEvery: Int): DataFrame = {
    require(iters >= 1, "pageRank: need at least one iteration")
    require(checkpointEvery >= 1,
      "pageRank: checkpointEvery must be >= 1 (0 divides by zero; " +
        "negatives silently disable lineage cutting)")
    // Round-13 (guide §2.4 / §3.3 "materialise an intermediate to
    // truncate the plan"): the edge list, out-degree table and teleport
    // prior are LOOP-STATIC, but as lazy subplans every iteration (and
    // every reference inside one iteration) re-derived them inline —
    // the p65 gate's 3-iteration plan carried 88 parquet scans and 400
    // operators, zero reuse. Eagerly checkpoint each once
    // (Checkpoints.cut — executor-local by default, reliable under
    // spark.graft.checkpoint.dir): the loop's plan then grows over
    // three flat LogicalRDD leaves, and the gate's own edge derivation
    // (a cross-join + generate) runs once instead of ~30 times.
    // Integer rank arithmetic is unchanged by materialization, so
    // results are identical.
    //
    // LIFETIME CONTRACT (round-14, ADVICE r13): these three blocks —
    // and the loop's `pinned` generation — stay persisted when this
    // method returns, because the RETURNED frame is lazy and its
    // truncated lineage READS them; unpersisting here would be fatal,
    // not slow. pageRank therefore requires its caller to sweep
    // persistent RDDs once the result is consumed — the harness does
    // it between queries (SparkEntry.resetSessionConfs); library
    // callers in long-lived sessions must sweep equivalently or run
    // with the reliable checkpoint dir (files, not storage blocks).
    val e = Checkpoints.cut(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct())
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    // teleport scope: all nodes (classic) or the in-graph seed set
    // (personalized). |scope| is the one driver-side scalar (the same
    // O(1) any aggregate action costs); base and init are floored
    // exactly like the oracle: ((unit * (den-num)) div den) div n,
    // (unit div n)
    val teleport = seeds.fold(nodes)(sd =>
      nodes.join(sd, Seq("node"), "left_semi"))
    val n = teleport.count()
    require(n > 0, seeds.fold("pageRank: empty graph")(_ =>
      "personalizedPageRank: no seed is a node of the graph"))
    val base = unit * (dampDen - dampNum) / dampDen / n
    val init = unit / n
    // (node, base, init) — constants on the teleport scope, zero off it
    val prior = Checkpoints.cut(nodes.join(
        teleport.withColumn("in_scope", lit(true)), Seq("node"), "left")
      .select(col("node"),
        when(col("in_scope"), lit(base)).otherwise(lit(0L)).as("base"),
        when(col("in_scope"), lit(init)).otherwise(lit(0L)).as("init")))

    val deg = Checkpoints.cut(
      e.groupBy(col("src")).agg(count(lit(1)).as("out_deg")))

    var ranks = prior.select(col("node"), col("init").as("rank_units"))
    var pinned: Seq[org.apache.spark.rdd.RDD[_]] = Seq.empty
    for (i <- 1 to iters) {
      // each source's per-out-edge share: rank div out_deg (exact
      // integer division — NOT a double divide-and-cast, which loses
      // bits past 2^53)
      val share = ranks.join(deg, col("node") === col("src"))
        .select(col("node").as("sh_node"),
          expr("rank_units div out_deg").as("share"))
      val inbound = e.join(share, col("src") === col("sh_node"))
        .groupBy(col("dst")).agg(sum(col("share")).as("insum"))
      var next = prior.join(inbound, col("node") === col("dst"), "left")
        .select(col("node"),
          (col("base") +
            expr(s"coalesce(insum, 0L) * ${dampNum}L div ${dampDen}L"))
            .as("rank_units"))
      if (i % checkpointEvery == 0 && i < iters) {
        val out = Checkpoints.cut(next)
        pinned.foreach(_.unpersist(false))
        pinned = org.apache.spark.sql.graftbridge.Bridge.analyzed(out) match {
          case r: org.apache.spark.sql.execution.LogicalRDD => Seq(r.rdd)
          case _ => Seq.empty
        }
        next = out
      }
      ranks = next
    }
    ranks
  }
}
