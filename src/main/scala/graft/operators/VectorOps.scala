package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity operators over an `Array[Float]` embedding column:
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane (sign-LSH) bucketed variant as the scale path.
  *
  * Dot products are `zip_with` + `aggregate` folds — sequential
  * left-to-right double accumulation, so results are bit-deterministic
  * regardless of partitioning.
  *
  * Scale notes (100 TB): brute-force top-k against a FIXED small query
  * set broadcasts the queries (one pass over the corpus, no shuffle
  * except the final per-query top-k). The LSH variant buckets both
  * sides by sign bits so candidate generation is a bucket-equi-join —
  * the same shape ANN IVF probing takes on a cluster.
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    // widen each float to double BEFORE the product (float*float would
    // round twice and drift from any double-precision reference)
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query row, brute force.
    * `queries`/`corpus`: (id, vec). The query side is broadcast. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component h_{p,d} in
    * [-0.5, 0.5): derived from xxhash64 so both sides of a join (and
    * any engine re-run) build identical planes. */
  private def planeComponent(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(1000000L)).cast("double") / 1000000.0) - 0.5

  /** Sign-LSH bucket keys: `nTables` independent tables (OR), each an
    * AND over `nPlanes` hyperplane signs — the classic OR-of-ANDs
    * construction; recall at similarity s is 1-(1-p^r)^T with
    * p = 1 - acos(s)/π. Returns array<struct<tbl, bucket>>. */
  def lshBucketKeys(vec: Column, nPlanes: Int, nTables: Int): Column =
    transform(sequence(lit(0), lit(nTables - 1)), t =>
      struct(t.as("tbl"),
        aggregate(
          transform(sequence(lit(0), lit(nPlanes - 1)), p => {
            val planeId = t * lit(nPlanes) + p
            val proj = aggregate(
              zip_with(vec, sequence(lit(0), size(vec) - 1),
                (x, d) => x.cast("double") *
                  planeComponent(0, d * lit(nPlanes * nTables) + planeId)),
              lit(0.0), (acc, x) => acc + x)
            // 2^p as the bit weight (exact in double for p < 63);
            // bits are distinct so + is |
            when(proj > 0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))
          }),
          lit(0L), (acc, x) => acc + x).as("bucket")))

  /** Near-duplicate pairs by cosine ≥ tau, LSH-bucketed: vectors only
    * compare within a (table, bucket) cell. More tables ⇒ higher
    * recall, more candidate work; more planes ⇒ smaller buckets. */
  def lshNearDupPairs(
      vecs: DataFrame, tau: Double, nPlanes: Int = 3, nTables: Int = 8,
      maxBucket: Int = 10000): DataFrame = {
    val b = vecs.select(col("id"), col("vec"),
        explode(lshBucketKeys(col("vec"), nPlanes, nTables)).as("bk"))
      .select(col("id"), col("vec"),
        col("bk.tbl").as("tbl"), col("bk.bucket").as("bucket"))
    val buckets = b.groupBy(col("tbl"), col("bucket"))
      .agg(collect_list(struct(col("id"), col("vec"))).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))
    buckets
      .select(explode(expr(
        """filter(
          |  flatten(transform(docs, (a, i) ->
          |    transform(slice(docs, i + 2, size(docs)), b ->
          |      struct(least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
          |             a.vec AS v_a, b.vec AS v_b)))),
          |  p -> p.id_a != p.id_b)""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"),
        cosine(col("p.v_a"), col("p.v_b")).as("cosine"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("cosine") >= tau)
  }

  /** Brute-force cosine pairs ≥ tau — exact baseline, O(n²). */
  def bruteForcePairs(vecs: DataFrame, tau: Double): DataFrame = {
    val a = vecs.select(col("id").as("id_a"), col("vec").as("v_a"))
    val b = vecs.select(col("id").as("id_b"), col("vec").as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= tau)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
