package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi-join — the classic remedy when one join key holds a
  * disproportionate share of the rows and AQE's runtime skew split
  * cannot apply (e.g. the skewed side feeds a co-partitioned window, or
  * the join is inside a stateful stage).
  *
  * The BIG side gets a deterministic pseudo-random salt in [0, salts)
  * derived from xxhash64 over its row struct (NOT from the join key —
  * same-key rows must spread across salts, that is the whole point);
  * the SMALL side replicates each row `salts` times. The join key
  * becomes (key, salt): the hot key's rows now land on `salts` reducers
  * instead of one. Output rows are EXACTLY the plain join's — salting
  * changes distribution, never semantics — which is how the correctness
  * gate oracles it.
  *
  * Cost model: small side grows x salts (keep it broadcast-small or
  * salts modest); big side is unchanged. Pick `salts` ≈ the skew factor
  * you need to flatten (hottest-key share x shuffle partitions).
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `key`, salted `salts`
    * ways. Column sets must be disjoint apart from `key`. */
  def saltedEquiJoin(
      big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigCols = big.columns
    val b = big.withColumn("__graft_salt",
      pmod(xxhash64(struct(bigCols.map(col): _*)), lit(salts.toLong)))
    val s = small.withColumn("__graft_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(s, Seq(key, "__graft_salt")).drop("__graft_salt")
  }
}
