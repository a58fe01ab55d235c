package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

/** SQL registration for the native expressions, so `spark.sql` users
  * get them too:
  *
  *   - session-local: `GraftFunctions.register(spark)`
  *   - cluster-wide:  `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case IntegerLiteral(i) => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> { exprs => SimHash64(exprs.head) },
    "simhash_poly" -> { exprs => SimHashPoly(exprs.head) },
    "minhash_sig" -> { exprs =>
      MinHashSig(exprs.head, intArg(exprs(1), "minhash_sig k")) },
    "minhash_bands" -> { exprs =>
      MinHashBands(exprs.head, intArg(exprs(1), "bands"),
        intArg(exprs(2), "rows")) },
    "dot_product" -> { exprs => DotProduct(exprs.head, exprs(1)) },
    "lsh_buckets" -> { exprs =>
      LshBuckets(exprs.head, intArg(exprs(1), "nPlanes"),
        intArg(exprs(2), "nTables")) },
    "shingle_set" -> { exprs =>
      ShingleSet(exprs.head, intArg(exprs(1), "n")) },
    "max_ngram_freq" -> { exprs =>
      MaxNgramFreq(exprs.head, intArg(exprs(1), "n")) })

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** `spark.sql.extensions` entry point: native SQL functions plus the
  * graft optimizer rules (range-join auto-rewrite). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    e.injectOptimizerRule(_ => new graft.plans.RangeJoinRewrite)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
