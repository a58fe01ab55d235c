package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hash/vector hot paths.
  *
  * The same operators expressed with higher-order functions
  * (`transform`/`aggregate` lambdas) pay per-element interpreted
  * Catalyst evaluation — ~100M lambda evals for MinHash over sf0.1 —
  * while these run tight JVM loops per ROW (measured 10-30x on the
  * bench). This is the (b) tier of the custom-operator preference
  * order: a scalar `Expression` before any UDF.
  *
  * Each expression implements `doGenCode` as a reference-object call
  * into its own `nullSafeEval` loop: the per-row work is O(k·m) so the
  * single boxed call is amortized, and — unlike `CodegenFallback`,
  * which re-evaluates the whole child subtree interpreted — the child
  * expressions (`split`, column reads) stay inside whole-stage codegen.
  */

private object Mix {
  /** splitmix64 finalizer — deterministic seed schedule. */
  def splitmix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def hashUtf8(s: org.apache.spark.unsafe.types.UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
}

/** MinHash signature of an array<string> shingle set: k minima of
  * per-shingle 64-bit hashes re-mixed per function index. */
case class MinHashSig(child: Expression, k: Int)
  extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(j => Mix.splitmix(0x5EED0000L + j))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val base = new Array[Long](m)
    var i = 0
    while (i < m) {
      base(i) = Mix.hashUtf8(arr.getUTF8String(i), 42L)
      i += 1
    }
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var min = Long.MaxValue
      val s = seeds(j)
      var t = 0
      while (t < m) {
        val h = XXH64.hashLong(base(t), s)
        if (h < min) min = h
        t += 1
      }
      out(j) = min
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** 64-bit SimHash of an array<string> token list: sign of the
  * per-bit ±1 sums of token hashes. */
case class SimHash64(child: Expression)
  extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($c)).longValue();")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      val h = Mix.hashUtf8(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** 62-bit SimHash over DUAL polynomial token hashes: each token is
  * hashed twice with the [[PolyFingerprint]] construction (base 31 mod
  * 2³¹-1 and base 37 mod 2147483629), each 31-bit result is finalized
  * with a murmur-style fmix32 avalanche (masked to 31 bits), and the
  * two are packed into one 62-bit value; the signature is the sign of
  * per-bit ±1 sums across the token MULTISET. Engine-independent by
  * construction — no hash-family secret — so a SQL oracle reproduces
  * it bit-for-bit (the hash-family-free variant of [[SimHash64]]).
  *
  * The finalizer is load-bearing, not cosmetic: a raw polynomial hash
  * of a short token is a SMALL number ("a" → 97), so without
  * avalanching the high bits of every common token's hash are zero,
  * every document's high signature bits collapse to 0, and hamming
  * distances shrink until banding explodes (measured at sf0.1:
  * 61,581 "near-dup" pairs raw vs 505 finalized — a 100× candidate
  * blow-up from bit bias, not real similarity). fmix32 is expressed in
  * overflow-safe BIGINT arithmetic (decomposed 16×32-bit multiplies
  * mod 2³²) so DuckDB reproduces it without 64-bit wraparound.
  * Bits 62-63 are always 0, which the 4×16-bit chunk banding
  * tolerates (those bits simply never differ). */
case class SimHashPoly(child: Expression,
    baseA: Long = 31L, modA: Long = 2147483647L,
    baseB: Long = 37L, modB: Long = 2147483629L)
  extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHashPoly", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($c)).longValue();")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private def polyHash(s: String, base: Long, mod: Long): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Token-hash memo, task-local (expressions deserialize per task, so
    * no cross-thread sharing). Natural-language token frequency is
    * Zipf-distributed — a bounded cache catches most of the mass; past
    * the cap, misses just recompute. Keys are copied: a UTF8String from
    * ArrayData is a view into a buffer Spark reuses. */
  @transient private lazy val cache =
    new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      java.lang.Long](1 << 12)
  private val cacheCap = 1 << 16

  /** fmix32 finalizer masked to 31 bits. 64-bit products are masked to
    * 2³² — bit-identical to the oracle's decomposed-multiply form. */
  private def fmix31(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x ^= x >>> 16
    x = (x * 0x85ebca6bL) & 0xFFFFFFFFL
    x ^= x >>> 13
    x = (x * 0xc2b2ae35L) & 0xFFFFFFFFL
    x ^= x >>> 16
    x & 0x7FFFFFFFL
  }

  private def tokenHash(u: org.apache.spark.unsafe.types.UTF8String): Long = {
    val hit = cache.get(u)
    if (hit != null) return hit.longValue()
    val s = u.toString
    val h = fmix31(polyHash(s, baseA, modA)) |
      (fmix31(polyHash(s, baseB, modB)) << 31)
    if (cache.size < cacheCap) cache.put(u.copy(), java.lang.Long.valueOf(h))
    h
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](62)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      val h = tokenHash(arr.getUTF8String(i))
      var b = 0
      while (b < 62) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 62) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): SimHashPoly = copy(child = c)
}

/** Dot product of two numeric arrays, each element widened to double
  * BEFORE multiplying, accumulated left-to-right — bit-identical to
  * the HOF formulation (and to a double-precision reference engine). */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotProduct", this)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ((java.lang.Double) $ref.nullSafeEval($a, $b)).doubleValue();")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"DotProduct needs array<float|double>, got $other")
  }
  private lazy val leftFloat = elemIsFloat(left)
  private lazy val rightFloat = elemIsFloat(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // silently truncating to min(len, len) would return a plausible but
    // wrong cosine for malformed embedding pairs — fail loudly instead
    if (n != y.numElements()) throw new IllegalArgumentException(
      s"DotProduct: mismatched vector lengths $n vs ${y.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Space-join the tokens whose 1-BASED positions are NOT in `cut` —
  * the native spelling of p42's reassembly tail (round 13). The HOF
  * chain it replaces — filter(zip_with(toks, sequence(1, n), struct),
  * s => !array_contains(cut, s.p)) then transform + array_join — paid
  * O(tokens·|cut|) INTERPRETED Catalyst evaluations per row (every
  * token probed the cut list linearly). One tight loop with a hash
  * probe per token produces the IDENTICAL string (same token order,
  * same single-space separator, empty string when everything is cut),
  * so md5(cleaned) is unchanged. */
case class RemovePositions(left: Expression, right: Expression)
  extends BinaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("removePositions", this)
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($t, $c);")
  }

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"RemovePositions needs (array<string>, array<int>), got $other")
    }

  override def nullSafeEval(toksAny: Any, cutAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val cut = cutAny.asInstanceOf[ArrayData]
    val nCut = cut.numElements()
    val cutSet = new java.util.HashSet[Int](math.max(16, nCut * 2))
    var i = 0
    while (i < nCut) {
      if (!cut.isNullAt(i)) cutSet.add(cut.getInt(i))
      i += 1
    }
    val n = toks.numElements()
    val sb = new java.lang.StringBuilder
    var first = true
    i = 0
    while (i < n) {
      if (!cutSet.contains(i + 1)) {
        if (!first) sb.append(' ')
        first = false
        // a null token element would have made the HOF's struct field
        // null and the joined string drop it with its separator —
        // split() never emits nulls, so fail loudly instead of
        // guessing at that corner (round-14, ADVICE r13: a DESCRIPTIVE
        // error, not the opaque NPE the raw .toString produced)
        val t = toks.getUTF8String(i)
        if (t == null) throw new IllegalStateException(
          s"RemovePositions: null token element at position ${i + 1} — " +
            "inputs are expected to come from split(), which never " +
            "emits null elements")
        sb.append(t.toString)
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemovePositions =
    copy(left = newLeft, right = newRight)
}

/** JL random ±1 projection of a numeric array to `outDim` dims — the
  * native spelling of [[graft.operators.VectorOps.randomProject]]'s
  * HOF fold (round 13: the transform/aggregate lambdas were evaluated
  * INTERPRETED per element — outDim·dim Catalyst tree walks per row,
  * measured as ~all of p73's per-row cost; this is one tight JVM loop,
  * the DotProduct treatment).
  *
  * Bit-exactness contract (the p73 oracle replays the fold): the sign
  * matrix is regenerated from the SAME integer arithmetic —
  * h1 = (i·1000003 + j·7919 + seed) mod (2³¹−1),
  * h2 = (h1² + h1) mod (2³¹−1), sign = +1 if h2 even else −1 — and the
  * accumulation is the same left-to-right IEEE double sequence
  * acc += vec[i]·sign(i,j) for i = 0..dim−1, then one division by
  * sqrt(outDim). Floats widen to double BEFORE the product, exactly
  * like the HOF's element_at(...).cast("double").
  *
  * Null ELEMENTS reproduce the fold's algebra: any null element makes
  * every output element null (acc + null = null for each j's fold). */
case class RandomProject(child: Expression, outDim: Int, seed: Long)
  extends UnaryExpression {

  require(outDim >= 1, "outDim >= 1")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("randomProject", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"RandomProject needs array<float|double>, got $other")
    }

  private lazy val elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = v.numElements()
    val sq = math.sqrt(outDim.toDouble)
    // a null element poisons every fold — emit all-null, the HOF result
    var i = 0
    while (i < m) {
      if (v.isNullAt(i)) return new GenericArrayData(
        Array.fill[Any](outDim)(null))
      i += 1
    }
    val x = new Array[Double](m)
    i = 0
    while (i < m) {
      x(i) = if (elemFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      i = 0
      while (i < m) {
        val h1 = (i.toLong * 1000003L + j.toLong * 7919L + seed) % 2147483647L
        val h2 = (h1 * h1 + h1) % 2147483647L
        val s = if (h2 % 2 == 0) 1.0 else -1.0
        acc += x(i) * s
        i += 1
      }
      out(j) = acc / sq
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): RandomProject =
    copy(child = c)
}

/** Nearest eval-set member by cosine — the scale spelling of the p56
  * semantic-decontamination screen. The first cut folded one cosine
  * COLUMN per eval vector into a single projection; at ~500 evals that
  * compiles, at ~5k (the sf10 decade stress) the expression tree and
  * its per-eval array literals blow past codegen limits and the query
  * dies at compile time. Here the whole eval matrix rides as ONE
  * reference object (k·dim floats, never inlined into generated
  * source), and one JVM loop per row computes every cosine — plan
  * stays scan → project → filter at ANY k, and the arithmetic is
  * bit-identical to the folded form: index-order double accumulation
  * for dots and norms, cos = dot/(normRow·normEval), FIRST maximum
  * wins (ties toward the smallest eval id — evals ride in ascending-id
  * order), NaN ordered largest like Spark's array_max.
  *
  * Returns struct(nearest_eval: long, max_cos: double); null on a
  * null input vector; errors loudly on a dimension mismatch. */
case class NearestEval(child: Expression, ids: Seq[Long],
    evals: Seq[Seq[Float]])
  extends UnaryExpression {

  require(ids.nonEmpty && ids.length == evals.length,
    s"${ids.length} ids vs ${evals.length} eval vectors")

  @transient private lazy val evalArr: Array[Array[Float]] =
    evals.map(_.toArray).toArray
  @transient private lazy val evalNorm: Array[Double] =
    evalArr.map { v =>
      var n2 = 0.0
      var i = 0
      while (i < v.length) { n2 += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(n2)
    }
  @transient private lazy val idArr: Array[Long] = ids.toArray

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestEval", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("nearest_eval", LongType, nullable = false),
    StructField("max_cos", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_eval needs array<float>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val row = new Array[Double](n)
    var n2 = 0.0
    var i = 0
    while (i < n) {
      row(i) = x.getFloat(i).toDouble
      n2 += row(i) * row(i)
      i += 1
    }
    val normRow = math.sqrt(n2)
    var best = Double.NegativeInfinity
    var bestIdx = 0
    var e = 0
    while (e < evalArr.length) {
      val v = evalArr(e)
      if (v.length != n) throw new IllegalArgumentException(
        s"nearest_eval: row dim $n vs eval dim ${v.length}")
      var dot = 0.0
      var j = 0
      while (j < n) { dot += row(j) * v(j).toDouble; j += 1 }
      val cos = dot / (normRow * evalNorm(e))
      // Double.compare orders NaN largest (Spark's array_max order);
      // strict > keeps the FIRST maximum = smallest eval id on ties
      if (java.lang.Double.compare(cos, best) > 0) { best = cos; bestIdx = e }
      e += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](idArr(bestIdx), best))
  }

  override protected def withNewChildInternal(newChild: Expression): NearestEval =
    copy(child = newChild)
}

/** Sign-LSH projections: one pass over the vector computing all
  * nPlanes·nTables dot products against a deterministic splitmix
  * plane matrix, returning the per-table bucket ids. */
case class LshBuckets(child: Expression, nPlanes: Int, nTables: Int)
  extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBuckets", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** plane p, dim d -> weight in [-0.5, 0.5) (same schedule as
    * VectorOps.planeMatrix so behavior is stable across impls). */
  private def weight(p: Int, d: Int): Double =
    java.lang.Math.floorMod(Mix.splitmix(p.toLong * 1000003L + d), 1000000L)
      .toDouble / 1000000.0 - 0.5

  /** Plane matrix cache, materialized on the first row (when the vector
    * dimension is known) — recomputing the splitmix schedule per row
    * costs nPlanes·nTables·dim mixes/row and dominates the banding. */
  @transient private var planeCache: Array[Array[Double]] = _
  @transient private var planeCacheDim: Int = -1
  private def planes(dim: Int): Array[Array[Double]] = {
    if (planeCacheDim != dim) {
      planeCache = Array.tabulate(nTables * nPlanes)(p =>
        Array.tabulate(dim)(weight(p, _)))
      planeCacheDim = dim
    }
    planeCache
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val w = planes(dim)
    val vec = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      vec(d) = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
      d += 1
    }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val pw = w(t * nPlanes + p)
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += vec(i) * pw(i); i += 1 }
        if (acc > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): LshBuckets = copy(child = c)
}

/** Distinct word n-gram shingles of a token array, space-joined — one
  * loop + hash set per row (the `transform`+`concat_ws` HOF spelling
  * costs ~1ms/row interpreted at 150 shingles). */
case class ShingleSet(child: Expression, n: Int)
  extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleSet", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i <= m - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size())))
  }

  override protected def withNewChildInternal(c: Expression): ShingleSet = copy(child = c)
}

/** Distinct word-n-gram HASHES (64-bit) of a token array — the
  * identity-only counterpart of [[ShingleSet]] for pipelines that
  * never need the shingle TEXT (frequency counting, set-similarity
  * verification, overlap audits). Each token is hashed once
  * (XXH64), n-gram identity is an order-sensitive splitmix combine of
  * the token hashes — no concatenated string is ever built, so the
  * hot loop allocates one long per DISTINCT shingle instead of one
  * UTF8String per window. Downstream, the 8-byte identities make the
  * frequency shuffle rows and the per-pair intersect/union loops
  * several times cheaper than string arrays (measured on p69: the
  * string spelling was the most expensive query in the suite).
  * Collisions are ~|universe|²/2⁶⁴ and deterministic. */
case class ShingleHashSet(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashSet", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hash_set needs array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    // token hashes once, then a sliding order-sensitive combine
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      th(i) = if (arr.isNullAt(i)) 0L else Mix.hashUtf8(arr.getUTF8String(i), 42L)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= m - n) {
      var h = 0L
      var k = 0
      while (k < n) { h = Mix.splitmix(h ^ th(i + k)); k += 1 }
      seen.add(java.lang.Long.valueOf(h))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ShingleHashSet =
    copy(child = c)
}

/** Apply an ORDERED BPE merge table to a symbol array: for each
  * (l, r) merge in sequence, one greedy left-to-right pass replaces
  * every adjacent (l, r) with the concatenated symbol — bit-identical
  * to chaining one `aggregate` HOF fold per merge (a just-merged
  * symbol never re-merges as the RIGHT side in the same pass, but
  * participates in later passes and later merges), which is the
  * standard Sennrich et al. 2016 semantics. One reference-object
  * expression regardless of merge count — the nMerges-nested HOF
  * spelling blows up the analyzer/codegen exactly like the folded
  * NearestEval did at ~4.9k terms (round-11), which capped usable
  * merge counts far below the documented 4096. O(nMerges · len) per
  * row, no shuffle. */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_apply needs array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // null elements are skipped (dropped symbols), like the sibling
    // expressions' isNullAt guards — getUTF8String would NPE
    val buf = new Array[String](n)
    var len = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { buf(len) = arr.getUTF8String(i).toString; len += 1 }
      i += 1
    }
    var syms = java.util.Arrays.copyOf(buf, len)
    merges.foreach { case (l, r) =>
      if (syms.length > 1) {
        val out = new Array[String](syms.length)
        var len = 0
        var j = 0
        while (j < syms.length) {
          val x = syms(j)
          if (len > 0 && out(len - 1) == l && x == r) out(len - 1) = l + r
          else { out(len) = x; len += 1 }
          j += 1
        }
        syms = java.util.Arrays.copyOf(out, len)
      }
    }
    new GenericArrayData(syms.map(s =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s): AnyRef))
  }

  override protected def withNewChildInternal(c: Expression): BpeApply =
    copy(child = c)
}

/** k seed-wise MinHash WINNING SHINGLES of a distinct-shingle string
  * array — the contained-side probe of the approximate containment
  * screen (reference: the dedup family it extends is p83's exact
  * containment join). Broder's identity: for a random hash h,
  * P(argmin over A of h ∈ B) = \|A∩B\|/\|A\| — the containment itself —
  * so k independent argmins give a Binomial(k, C) membership-match
  * count, estimating C(A,B) from k fixed-size probes instead of A's
  * full prefix. Engine-independent by construction: the base hash is
  * the 31 / 2³¹−1 polynomial over code points (the p74/p76 family)
  * computed ONCE per shingle, and seed i rehashes affinely
  * hᵢ = ((2i+1)·h + 40503·i) mod 2³¹−1 — both replayable in SQL.
  * Winner per seed is min by (hᵢ, shingle) with BINARY string
  * tie-break (UTF8String byte order = code-point order = DuckDB's
  * default collation), so an oracle reproduces winners even on hash
  * ties. Returns the k winners in seed order; empty input → empty
  * array. One JVM loop per row: O(\|A\| · k) multiplies after the
  * O(\|A\| · len) base pass — no shuffle, no UDF. */
case class ContainmentMinHash(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1 && k <= 512, s"seed count k in [1,512]: $k")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("containmentMinHash", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"containment_minhash needs array<string>, got $other")
    }

  private val Mod = 2147483647L

  private def polyHash(u: org.apache.spark.unsafe.types.UTF8String): Long = {
    val s = u.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n0 = arr.numElements()
    // skip null elements (sibling-expression convention) — getUTF8String NPEs
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n0)
    val base = new Array[Long](n0)
    var m = 0
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) {
        toks(m) = arr.getUTF8String(i)
        base(m) = polyHash(toks(m))
        m += 1
      }
      i += 1
    }
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](k)
    var s = 0
    while (s < k) {
      // (2s+1)·base + 40503·s stays far below 2⁶³ for all k ≤ 512
      // (≤ 1023·2³¹ + 40503·511 ≈ 2.2·10¹²)
      val a = 2L * s + 1L
      val b = 40503L * s
      var bi = 0
      var bh = (a * base(0) + b) % Mod
      var j = 1
      while (j < m) {
        val h = (a * base(j) + b) % Mod
        if (h < bh || (h == bh && toks(j).compareTo(toks(bi)) < 0)) {
          bh = h
          bi = j
        }
        j += 1
      }
      out(s) = toks(bi)
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): ContainmentMinHash =
    copy(child = c)
}

/** Count of array elements present in a fixed string set that rides
  * the plan (decontamination screens, stopword lists, blocklists). The
  * set is hashed ONCE per expression instance — `array_intersect`
  * against a literal re-builds the hash set on every row, which at a
  * million-shingle eval set and 100 TB of rows is the dominant cost of
  * the whole screen. Distinctness of the counted matches follows the
  * child array (pair with [[ShingleSet]], which is distinct). */
case class InSetCount(child: Expression, elements: Seq[String])
  extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("inSetCount", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Integer) $ref.nullSafeEval($c)).intValue();")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"in_set_count needs array<string>, got $other")
    }

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      math.max(16, elements.size * 2))
    elements.foreach(e =>
      s.add(org.apache.spark.unsafe.types.UTF8String.fromString(e)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    var n = 0
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    java.lang.Integer.valueOf(n)
  }

  override protected def withNewChildInternal(c: Expression): InSetCount = copy(child = c)
}

/** Sum of per-token scores from a fixed (token -> double) table that
  * rides the plan, accumulated left-to-right in document order —
  * the scoring half of a broadcast-model LM filter (unigram
  * probabilities, stopword weights, toxicity lexicons). Unknown tokens
  * score `default`. The table is hashed once per expression instance
  * (same rationale as [[InSetCount]]). */
case class TokenScoreSum(child: Expression, entries: Seq[(String, Double)],
    default: Double)
  extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenScoreSum", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Double) $ref.nullSafeEval($c)).doubleValue();")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_score_sum needs array<string>, got $other")
    }

  @transient private lazy val table: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      java.lang.Double](math.max(16, entries.size * 2))
    entries.foreach { case (k, v) =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(k),
        java.lang.Double.valueOf(v))
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    var acc = 0.0
    var i = 0
    while (i < m) {
      val v = if (arr.isNullAt(i)) null else table.get(arr.getUTF8String(i))
      acc += (if (v == null) default else v.doubleValue())
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildInternal(c: Expression): TokenScoreSum = copy(child = c)
}

/** Highest occurrence count of any word n-gram in a token array — the
  * numerator of the Gopher-style "top n-gram fraction" repetition
  * signal. One loop + hash map per ROW (the groupBy-count-max spelling
  * costs two shuffles for a per-document statistic); returns 0 when the
  * document has fewer than n tokens. */
case class MaxNgramFreq(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, "n-gram size must be >= 1")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("maxNgramFreq", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Integer) $ref.nullSafeEval($c)).intValue();")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return java.lang.Integer.valueOf(0)
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      Integer]()
    var best = 0
    var i = 0
    while (i <= m - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
      val g = org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
      val c = counts.merge(g, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    java.lang.Integer.valueOf(best)
  }

  override protected def withNewChildInternal(c: Expression): MaxNgramFreq = copy(child = c)
}

/** Fused MinHash + LSH banding: computes the k = bands*rows signature
  * minima AND hashes each band's row-slice, returning just the
  * array<long> of band hashes — the signature array is never
  * materialized and no per-band HOF/slice runs. */
case class MinHashBands(child: Expression, bands: Int, rows: Int)
  extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashBands", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val k = bands * rows
  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(j => Mix.splitmix(0x5EED0000L + j))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val base = new Array[Long](m)
    var i = 0
    while (i < m) { base(i) = Mix.hashUtf8(arr.getUTF8String(i), 42L); i += 1 }
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      var min = Long.MaxValue
      val s = seeds(j)
      var t = 0
      while (t < m) {
        val h = XXH64.hashLong(base(t), s)
        if (h < min) min = h
        t += 1
      }
      sig(j) = min
      j += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9E3779B97F4A7C15L + b
      var r = 0
      while (r < rows) { h = XXH64.hashLong(sig(b * rows + r), h); r += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
}

/** Column-API wrappers. */
/** All unordered pairs of an array<long> of ids, each normalized to
  * (least, greatest) — the LSH bucket pair expansion. The HOF spelling
  * (`flatten(transform(ids, .. transform(filter(slice(..)))))`) runs
  * interpreted per ELEMENT, which dominates candidate generation once
  * buckets hold hundreds of ids (n²/2 lambda invocations per bucket);
  * this is one tight loop per bucket. Equal ids yield no pair (matches
  * the HOF's `b != a` guard). */
case class SortedPairs(child: Expression) extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedPairs", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_pairs needs array<long>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[ArrayData].toLongArray()
    val n = ids.length
    val out = new java.util.ArrayList[Any](n * (n - 1) / 2)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = ids(i); val b = ids(j)
        if (a != b) {
          val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
          row.update(0, math.min(a, b))
          row.update(1, math.max(a, b))
          out.add(row)
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): SortedPairs =
    copy(child = newChild)
}

/** [[SortedPairs]] with the PPJoin LENGTH filter built into the
  * expansion (round-14, VERDICT r13 item 4, guide §2.3 "shuffle fewer
  * bytes"): ids are the packed (id·2²⁴ + sz·2¹² + pos) longs the exact
  * set-similarity join bands on, and a pair is emitted ONLY when
  * min(sz) ≥ max(sz)·tau − 1e-6 — the EXACT predicate the caller
  * previously applied after materializing every C(bucket,2) pair row
  * (at sf0.1 the post-filter dropped ~64 % of them). Emitting through
  * a size-sorted two-pointer makes the per-bucket work proportional to
  * the SURVIVING pairs, not the quadratic raw count, and the dropped
  * pairs never reach the candidate exchange. Output pairs and order
  * semantics match SortedPairs (least, greatest; equal ids skipped);
  * the survivor SET is bit-identical to SortedPairs + the filter, so
  * downstream results cannot change (spec-pinned). Saturated sizes
  * (4095) ride the same formula — the filter stays conservative
  * exactly as before. */
/** ONE greedy BPE step with its SIGNED adjacent-pair count delta
  * (round-14, VERDICT r13 item 5): applies `merges` to `syms` with
  * EXACTLY [[BpeApply]]'s greedy left-to-right loop and returns
  * struct(syms = the merged array, pd = the net non-zero delta
  * entries (l, r, c = freq·(count_after − count_before)); pd is
  * empty for an unchanged word). ONE application per row serves BOTH
  * consumers of a merge round — the next word-state generation and
  * the incremental count table's delta — so a round costs a single
  * scan (a separate delta expression measured as a second full
  * apply-scan per round, which at the word cache's 1–2 coalesced
  * partitions doubled the round). Because the diff reads the REAL
  * before/after arrays, any greedy-overlap outcome is handled by
  * construction, and summing per-word nets equals summing ±explodes.
  * Null symbol elements are skipped exactly as [[BpeApply]]. */
case class BpeStep(syms: Expression, freq: Expression,
    merges: Seq[(String, String)]) extends BinaryExpression {

  override def left: Expression = syms
  override def right: Expression = freq

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeStep", this)
    nullSafeCodeGen(ctx, ev, (s, f) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($s, $f);")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("syms", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("pd", ArrayType(StructType(Seq(
      StructField("l", StringType, nullable = false),
      StructField("r", StringType, nullable = false),
      StructField("c", LongType, nullable = false))), containsNull = false),
      nullable = false)))
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (syms.dataType, freq.dataType) match {
      case (ArrayType(StringType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_step needs (array<string>, long), got $other")
    }

  private def emptyPd = new GenericArrayData(Array.empty[Any])

  override def nullSafeEval(symsIn: Any, freqIn: Any): Any = {
    val arr = symsIn.asInstanceOf[ArrayData]
    val f = freqIn.asInstanceOf[Long]
    val n = arr.numElements()
    val buf = new Array[String](n)
    var len = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { buf(len) = arr.getUTF8String(i).toString; len += 1 }
      i += 1
    }
    val old = java.util.Arrays.copyOf(buf, len)
    // EXACT BpeApply greedy loop — the delta must diff precisely the
    // arrays the fold produces
    var cur = old
    var changed = false
    merges.foreach { case (l, r) =>
      if (cur.length > 1) {
        val out = new Array[String](cur.length)
        var olen = 0
        var j = 0
        while (j < cur.length) {
          val x = cur(j)
          if (olen > 0 && out(olen - 1) == l && x == r) {
            out(olen - 1) = l + r; changed = true
          } else { out(olen) = x; olen += 1 }
          j += 1
        }
        cur = java.util.Arrays.copyOf(out, olen)
      }
    }
    val symsOut = new GenericArrayData(cur.map(s =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s): AnyRef))
    val res = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    res.update(0, symsOut)
    if (!changed) { res.update(1, emptyPd); return res }
    val net = new java.util.LinkedHashMap[String, Long]()
    def add(a: Array[String], sign: Long): Unit = {
      var k = 1
      while (k < a.length) {
        // the ' ' separator cannot occur inside a symbol (symbols come
        // from regex-filtered [a-z0-9]+ words and their concatenations)
        val key = a(k - 1) + " " + a(k)
        net.merge(key, sign * f, (x, y) => x + y)
        k += 1
      }
    }
    add(old, -1L)
    add(cur, 1L)
    val out = new java.util.ArrayList[Any](net.size())
    val it = net.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue != 0L) {
        val sep = e.getKey.indexOf(' ')
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
        row.update(0, org.apache.spark.unsafe.types.UTF8String
          .fromString(e.getKey.substring(0, sep)))
        row.update(1, org.apache.spark.unsafe.types.UTF8String
          .fromString(e.getKey.substring(sep + 1)))
        row.update(2, e.getValue)
        out.add(row)
      }
    }
    res.update(1, new GenericArrayData(out.toArray))
    res
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeStep =
    copy(syms = newLeft, freq = newRight)
}

case class SortedPairsSim(child: Expression, tau: Double)
    extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedPairsSim", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_pairs_sim needs array<long>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[ArrayData].toLongArray()
    val n = ids.length
    // size-sort WITHOUT boxing: sz (12 bits) in the high bits, the
    // element index in the low 32 — one primitive Arrays.sort gives
    // (size asc, index asc); the length test only reads sizes, so any
    // size-tie order is correct
    val keyed = new Array[Long](n)
    var k = 0
    while (k < n) {
      keyed(k) = (((ids(k) >> 12) & 4095L) << 32) | k.toLong
      k += 1
    }
    java.util.Arrays.sort(keyed)
    val out = new java.util.ArrayList[Any]()
    var j = 0
    var lo = 0
    while (j < n) {
      val szJ = (keyed(j) >>> 32).toDouble
      val bound = szJ * tau - 1e-6
      // two-pointer: sizes ascend, so the i-window with
      // szI >= szJ*tau - 1e-6 only ever moves right
      while (lo < j && (keyed(lo) >>> 32).toDouble < bound) lo += 1
      val b = ids((keyed(j) & 0xFFFFFFFFL).toInt)
      var i = lo
      while (i < j) {
        val a = ids((keyed(i) & 0xFFFFFFFFL).toInt)
        if (a != b) {
          val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
          row.update(0, math.min(a, b))
          row.update(1, math.max(a, b))
          out.add(row)
        }
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): SortedPairsSim =
    copy(child = newChild)
}

/** Rolling polynomial fingerprint of a string: h = (h·base + cp) mod m
  * over unicode CODEPOINTS, left to right — the Rabin-Karp document
  * fingerprint. Engine-independent by construction (no hash-family
  * secret): any engine with modular arithmetic reproduces it, which is
  * what lets the gate oracle it exactly in SQL. `mod` < 2^31 keeps
  * h·base inside a 64-bit long. Java long arithmetic wraps silently, so
  * this stays ANSI-overflow-safe where a SQL `*` spelling would throw. */
case class PolyFingerprint(child: Expression, base: Long, mod: Long)
  extends UnaryExpression {

  require(base > 0 && mod > 1 && mod <= Int.MaxValue.toLong,
    "mod must fit in 31 bits so h*base cannot overflow a long")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("polyFingerprint", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($c)).longValue();")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"poly_fingerprint needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

/** The `nProbe` nearest centroid indices (by cosine, descending;
  * ties broken by index) for an `array<float>` vector — the IVF coarse
  * quantizer. Centroids ride the plan (k·dim doubles — the same
  * "broadcast tiny model with the closure" idiom Spark ML uses for
  * k-means centers), so assignment is per-row and shuffle-free. */
case class NearestCentroids(child: Expression,
    centroids: Seq[Seq[Double]], nProbe: Int)
  extends UnaryExpression {

  require(nProbe >= 1 && nProbe <= centroids.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids needs array<float>, got $other")
    }

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val centNorms: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val vec = new Array[Double](dim)
    var d = 0
    while (d < dim) { vec(d) = v.getFloat(d).toDouble; d += 1 }
    // cosine vs each centroid (vector norm is constant across centroids,
    // so plain dot/centNorm ranks identically)
    val scores = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val n = math.min(dim, ct.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += vec(i) * ct(i); i += 1 }
      scores(c) = if (centNorms(c) == 0) Double.NegativeInfinity
        else acc / centNorms(c)
      c += 1
    }
    // selection of top nProbe by (score desc, index asc) — k is tiny
    val out = new Array[Int](nProbe)
    val taken = new Array[Boolean](cents.length)
    var r = 0
    while (r < nProbe) {
      var best = -1
      var c2 = 0
      while (c2 < cents.length) {
        if (!taken(c2) && (best < 0 || scores(c2) > scores(best))) best = c2
        c2 += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** Bloom-filter membership over a STRING column — the screening half
  * of incremental exact dedup at 100 TB. The serialized filter
  * (`org.apache.spark.util.sketch.BloomFilter`, Spark's public sketch
  * library — the same sketch its runtime-filter joins use) rides the
  * expression and is deserialized ONCE per executor
  * (`@transient lazy`), then consulted per row with zero allocation
  * (UTF8String bytes are UTF-8, matching `putString`'s encoding).
  * Contract: NO false negatives (a fingerprint that is in the index
  * always screens true), bounded false positives (`fpp` at build) —
  * so a downstream exact confirm join sees only survivors and the
  * composed output is exact. A 1e9-fingerprint index at fpp=0.01 is a
  * ~1.2 GB broadcast vs shuffling the index per increment. */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Boolean) $ref.nullSafeEval($c)).booleanValue();")
  }

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs string, got $other")
    }

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(bloom.mightContainBinary(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes))

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

/** Unicode NFC normalization (java.text.Normalizer). Dedup
  * fingerprints over raw bytes miss visually-identical documents whose
  * only difference is composition form — "café" with a precomposed
  * U+00E9 vs "cafe" + combining U+0301 hash apart, so one re-crawl
  * survives every byte-level dedup pass. NFC is the W3C-recommended
  * canonical form; normalizing BEFORE fingerprinting makes composition
  * drift invisible, exactly like whitespace collapse makes formatting
  * drift invisible. Engine-independent (Unicode defines one NFC), so
  * a SQL oracle with its own NFC function agrees byte-for-byte.
  * Skips the (expensive) normalizer call when the string is already
  * in NFC — true for virtually all real text, so the common case is a
  * quick-check scan, not a rewrite. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Byte-level Aho–Corasick automaton over a fixed pattern list: trie +
  * BFS failure links precomputed into a dense DFA (node × 256 byte
  * transitions), with each node's merged pattern-output set. One scan
  * of the text visits each byte exactly once regardless of pattern
  * count — K `contains()` probes cost O(K·len) and a regex alternation
  * backtracks. UTF-8 byte matching equals substring matching because
  * UTF-8 is self-synchronizing for exact byte sequences. */
private[functions] final class AhoCorasick(patterns: Seq[Array[Byte]]) {
  private val (dfa, outs) = {
    val maxNodes = patterns.map(_.length).sum + 1
    val goto = Array.fill(maxNodes)(Array.fill(256)(-1))
    val out = Array.fill(maxNodes)(List.empty[Int])
    var n = 1
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { b =>
        val c = b & 0xFF
        if (goto(s)(c) < 0) { goto(s)(c) = n; n += 1 }
        s = goto(s)(c)
      }
      out(s) ::= pi
    }
    // BFS: resolve failure links and close goto into a full DFA
    val fail = new Array[Int](n)
    val q = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < 256) {
      if (goto(0)(c) < 0) goto(0)(c) = 0
      else { fail(goto(0)(c)) = 0; q.add(goto(0)(c)) }
      c += 1
    }
    while (!q.isEmpty) {
      val s = q.poll()
      out(s) = out(s) ++ out(fail(s))
      var c = 0
      while (c < 256) {
        val t = goto(s)(c)
        if (t < 0) goto(s)(c) = goto(fail(s))(c)
        else { fail(t) = goto(fail(s))(c); q.add(t) }
        c += 1
      }
    }
    (goto, out.map(_.toArray))
  }

  /** Marks `hit(i) = true` for every pattern i occurring in `bytes`. */
  def scan(bytes: Array[Byte], hit: Array[Boolean]): Unit = {
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = dfa(s)(bytes(i) & 0xFF)
      val o = outs(s)
      var j = 0
      while (j < o.length) { hit(o(j)) = true; j += 1 }
      i += 1
    }
  }
}

/** Distinct blocklist patterns occurring in a text column, in
  * pattern-list order — the multi-phrase content screen (NSFW/spam/
  * boilerplate blocklists) a training-data pipeline runs over every
  * document. Matching is a single Aho–Corasick pass per row (O(len),
  * independent of pattern count); the automaton is built once per
  * expression instance when the task closure deserializes, the same
  * "model rides the plan" idiom as [[NearestCentroids]]. Returning
  * WHICH rules fired (not a boolean) is what makes the screen
  * auditable — rule-level hit rates come free from one groupBy. */
case class MultiContains(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  require(patterns.nonEmpty, "multi_contains needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern matches everything")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiContains", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_contains needs string, got $other")
    }

  @transient private lazy val ac =
    new AhoCorasick(patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  @transient private lazy val patUtf8 =
    patterns.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val hit = new Array[Boolean](patterns.length)
    ac.scan(u.getBytes, hit)
    val b = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < hit.length) { if (hit(i)) b += patUtf8(i); i += 1 }
    new GenericArrayData(b.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): MultiContains =
    copy(child = newChild)
}

/** CONTENT-DEFINED CHUNKING over whitespace tokens: a chunk boundary
  * falls after token position p whenever the polynomial hash of the
  * `window` tokens ending at p is ≡ 0 (mod `divisor`) — so boundaries
  * are a function of local CONTENT, not position. This is the property
  * fixed-stride chunking (p61's 24-token windows) structurally lacks:
  * a single-token insertion shifts every downstream fixed chunk and
  * kills its fingerprints, while CDC boundaries re-align as soon as
  * one untouched window passes (the FastCDC/LBFS principle, applied at
  * token granularity for text dedup). Expected chunk length = divisor
  * tokens; no min/max clamp on purpose — clamps make each boundary
  * depend on the previous one (sequential state), which would break
  * both per-position parallelism and SQL replayability. Token hash =
  * the [[PolyFingerprint]] construction (base 31 mod 2³¹−1) per token;
  * window hash folds token hashes with base 1000003 in the same
  * field. Per-row, shuffle-free, O(tokens·window). */
case class CdcChunks(child: Expression, window: Int, divisor: Int)
  extends UnaryExpression {

  require(window >= 1, "window >= 1")
  require(divisor >= 1, "divisor >= 1")

  private val Mod = 2147483647L

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcChunks", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_chunks needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString
    // keep empty tokens (limit -1): bit-compatible with SQL split
    val toks = s.split(" ", -1)
    val n = toks.length
    val th = new Array[Long](n)
    var t = 0
    while (t < n) {
      val tok = toks(t)
      var h = 0L
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        h = (h * 31 + cp) % Mod
        i += Character.charCount(cp)
      }
      th(t) = h
      t += 1
    }
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = window // 1-based end position of the window
    while (p < n) {
      var acc = 0L
      var q = p - window
      while (q < p) { acc = (acc * 1000003L + th(q)) % Mod; q += 1 }
      if (acc % divisor == 0) bounds += p
      p += 1
    }
    bounds += n
    val out = new Array[Any](bounds.length)
    var start = 0
    var k = 0
    while (k < bounds.length) {
      val end = bounds(k)
      out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(
        toks.slice(start, end).mkString(" "))
      start = end
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** WINNOWING fingerprint selection (Schleimer/Wilkerson/Aiken 2003) as
  * one native pass — the production spelling of
  * `DedupOps.winnowingSelect`. Token hashes are [[CdcChunks]]'s
  * codepoint poly (·31 mod 2³¹−1), gram hashes its window fold
  * (·1000003 mod 2³¹−1) — both already SQL-replayable via the p74
  * list_reduce spelling, so the selection stays engine-reproducible
  * while replacing the HOF chain's per-gram md5 STRING building (32
  * hex chars built, compared, and shuffled per gram) with integer
  * arithmetic. Window minima tie-break RIGHTMOST (robust winnowing);
  * consecutive duplicate selections collapse (selections are
  * non-decreasing in position, so this equals a global distinct).
  *
  * Returns array<struct<pos int, fp long>>; fewer than k tokens →
  * empty array. Codegen via reference-obj like the other natives. */
case class WinnowFps(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 1 && w >= 1, "k and w must be positive")

  private val Mod = 2147483647L

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFps", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fps needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString
    val toks = s.split(" ", -1)
    val n = toks.length
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    // token poly hashes (CdcChunks spelling)
    val th = new Array[Long](n)
    var t = 0
    while (t < n) {
      val tok = toks(t)
      var h = 0L
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        h = (h * 31 + cp) % Mod
        i += Character.charCount(cp)
      }
      th(t) = h
      t += 1
    }
    // gram hashes: fold of k consecutive token hashes (p74 spelling)
    val gh = new Array[Long](nGrams)
    var p = 0
    while (p < nGrams) {
      var acc = 0L
      var q = p
      while (q < p + k) { acc = (acc * 1000003L + th(q)) % Mod; q += 1 }
      gh(p) = acc
      p += 1
    }
    // window minima, rightmost tie-break; dedup vs the last selection
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastPos = -1
    val nWin = math.max(nGrams - w + 1, 1)
    var st = 0
    while (st < nWin) {
      var bestH = Long.MaxValue
      var bestPos = -1
      var x = st
      val end = math.min(st + w, nGrams)
      while (x < end) {
        if (gh(x) <= bestH) { bestH = gh(x); bestPos = x }
        x += 1
      }
      if (bestPos != lastPos) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](bestPos + 1, bestH)) // 1-based pos, the SQL standing
        lastPos = bestPos
      }
      st += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** ALL k-token gram fingerprints of a text, one 62-bit long per
  * position (1-based position = array index + 1) — the bulk spelling
  * of [[WinnowFps]]'s hash for operators that need EVERY window
  * (p36/p42's cross-document span matching). Two independent poly
  * folds (token ·31/·37, window ·1000003/·1000033, both mod 2³¹−1)
  * pack injectively into one long (h1·M + h2 < 2⁶²), so the collision
  * odds are ~n²/2⁶² where the single 31-bit poly would collide at
  * corpus scale (birthday at ~2¹⁶ windows). Replaces the original
  * md5-hex spelling: a 32-char string built, compared, and SHUFFLED
  * per window — the fingerprint exchange rides 8-byte longs instead,
  * 4× less exchange payload at any scale. SQL-replayable via two p74
  * list_reduce folds. */
case class GramFps(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1, "k must be positive")

  private val Mod = 2147483647L

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramFps", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_fps needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString
    val toks = s.split(" ", -1)
    val n = toks.length
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val th1 = new Array[Long](n)
    val th2 = new Array[Long](n)
    var t = 0
    while (t < n) {
      val tok = toks(t)
      var h1 = 0L
      var h2 = 0L
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        h1 = (h1 * 31 + cp) % Mod
        h2 = (h2 * 37 + cp) % Mod
        i += Character.charCount(cp)
      }
      th1(t) = h1; th2(t) = h2
      t += 1
    }
    val out = new Array[Any](nGrams)
    var p = 0
    while (p < nGrams) {
      var g1 = 0L
      var g2 = 0L
      var q = p
      while (q < p + k) {
        g1 = (g1 * 1000003L + th1(q)) % Mod
        g2 = (g2 * 1000033L + th2(q)) % Mod
        q += 1
      }
      out(p) = g1 * Mod + g2
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramFps =
    copy(child = newChild)
}

/** 124-bit gram fingerprints — TWO independent 62-bit packs per
  * window (four poly families total: token ·31/·37/·41/·43, window
  * ·1000003/·1000033/·1000037/·1000039, all mod 2³¹−1). The single
  * 62-bit [[GramFps]] long hits its birthday bound at ~2³¹ windows
  * (~2e9) — fine for a screen whose false positive costs one wasted
  * verify, fatal for a DESTRUCTIVE consumer (p42 span removal cuts
  * real text on a collision). 124 bits pushes the bound to ~2⁶²
  * windows, beyond any corpus. `f1` is bit-identical to [[GramFps]]'s
  * value (same first two families), so the wide form strictly refines
  * the narrow one. Returns array<struct<f1,f2>>, 1-based position =
  * index + 1; 16 bytes/window on the exchange — still 2× less than
  * the md5-hex spelling this family replaced. */
case class GramFpsWide(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1, "k must be positive")

  private val Mod = 2147483647L

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramFpsWide", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("f1", LongType, nullable = false),
    StructField("f2", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_fps_wide needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString
    val toks = s.split(" ", -1)
    val n = toks.length
    val nGrams = n - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Any])
    val th1 = new Array[Long](n)
    val th2 = new Array[Long](n)
    val th3 = new Array[Long](n)
    val th4 = new Array[Long](n)
    var t = 0
    while (t < n) {
      val tok = toks(t)
      var h1 = 0L; var h2 = 0L; var h3 = 0L; var h4 = 0L
      var i = 0
      while (i < tok.length) {
        val cp = tok.codePointAt(i)
        h1 = (h1 * 31 + cp) % Mod
        h2 = (h2 * 37 + cp) % Mod
        h3 = (h3 * 41 + cp) % Mod
        h4 = (h4 * 43 + cp) % Mod
        i += Character.charCount(cp)
      }
      th1(t) = h1; th2(t) = h2; th3(t) = h3; th4(t) = h4
      t += 1
    }
    val out = new Array[Any](nGrams)
    var p = 0
    while (p < nGrams) {
      var g1 = 0L; var g2 = 0L; var g3 = 0L; var g4 = 0L
      var q = p
      while (q < p + k) {
        g1 = (g1 * 1000003L + th1(q)) % Mod
        g2 = (g2 * 1000033L + th2(q)) % Mod
        g3 = (g3 * 1000037L + th3(q)) % Mod
        g4 = (g4 * 1000039L + th4(q)) % Mod
        q += 1
      }
      out(p) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](g1 * Mod + g2, g3 * Mod + g4))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramFpsWide =
    copy(child = newChild)
}

object native {
  def cdc_chunks(text: Column, window: Int, divisor: Int): Column =
    Bridge.column(CdcChunks(Bridge.expression(text), window, divisor))
  def winnow_fps(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFps(Bridge.expression(text), k, w))
  def gram_fps(text: Column, k: Int): Column =
    Bridge.column(GramFps(Bridge.expression(text), k))
  def gram_fps_wide(text: Column, k: Int): Column =
    Bridge.column(GramFpsWide(Bridge.expression(text), k))
  def multi_contains(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiContains(Bridge.expression(text), patterns))
  def shingle_set(tokens: Column, n: Int): Column =
    Bridge.column(ShingleSet(Bridge.expression(tokens), n))
  def shingle_hash_set(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHashSet(Bridge.expression(tokens), n))
  def containment_minhash(shingles: Column, k: Int): Column =
    Bridge.column(ContainmentMinHash(Bridge.expression(shingles), k))
  /** One greedy BPE step with its signed pair-count delta —
    * struct(syms, pd); see [[BpeStep]]. */
  def bpe_step(syms: Column, freq: Column,
      merges: Seq[(String, String)]): Column =
    Bridge.column(BpeStep(Bridge.expression(syms),
      Bridge.expression(freq), merges))
  def bpe_apply(syms: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeApply(Bridge.expression(syms), merges))
  def max_ngram_freq(tokens: Column, n: Int): Column =
    Bridge.column(MaxNgramFreq(Bridge.expression(tokens), n))
  def in_set_count(tokens: Column, elements: Seq[String]): Column =
    Bridge.column(InSetCount(Bridge.expression(tokens), elements))
  def token_score_sum(tokens: Column, entries: Seq[(String, Double)],
      default: Double = 0.0): Column =
    Bridge.column(TokenScoreSum(Bridge.expression(tokens), entries, default))
  def minhash_bands(shingles: Column, bands: Int, rows: Int): Column =
    Bridge.column(MinHashBands(Bridge.expression(shingles), bands, rows))
  def minhash_sig(c: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), k))
  def simhash64(c: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(c)))
  def simhash_poly(c: Column): Column =
    Bridge.column(SimHashPoly(Bridge.expression(c)))
  /** Second independent polynomial family — the other 62 bits of the
    * 124-bit wide simhash (the next primes below 2³¹). */
  def simhash_poly2(c: Column): Column =
    Bridge.column(SimHashPoly(Bridge.expression(c),
      baseA = 41L, modA = 2147483587L, baseB = 43L, modB = 2147483579L))
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a), Bridge.expression(b)))
  def random_project(vec: Column, outDim: Int, seed: Long): Column =
    Bridge.column(RandomProject(Bridge.expression(vec), outDim, seed))
  def remove_positions(toks: Column, cut: Column): Column =
    Bridge.column(RemovePositions(
      Bridge.expression(toks), Bridge.expression(cut)))
  def nearest_eval(vec: Column, ids: Seq[Long],
      evals: Seq[Seq[Float]]): Column =
    Bridge.column(NearestEval(Bridge.expression(vec), ids, evals))
  def lsh_buckets(c: Column, nPlanes: Int, nTables: Int): Column =
    Bridge.column(LshBuckets(Bridge.expression(c), nPlanes, nTables))
  def nearest_centroids(c: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    Bridge.column(NearestCentroids(Bridge.expression(c), centroids, nProbe))
  def poly_fingerprint(c: Column, base: Long = 31L,
      mod: Long = Int.MaxValue.toLong): Column =
    Bridge.column(PolyFingerprint(Bridge.expression(c), base, mod))
  def sorted_pairs(c: Column): Column =
    Bridge.column(SortedPairs(Bridge.expression(c)))
  def sorted_pairs_sim(c: Column, tau: Double): Column =
    Bridge.column(SortedPairsSim(Bridge.expression(c), tau))
  /** Exact long-backed fixed-point SUM of a double column at `scale`
    * decimals — bit-identical to
    * `sum(c.cast(DECIMAL(18+,scale))).cast(DOUBLE)` (see
    * [[FixedPointSum]]); throws on per-row |value| ≥ 10^(18−scale). */
  def fixed_point_sum(c: Column, scale: Int): Column =
    Bridge.column(
      FixedPointSum(Bridge.expression(c), scale).toAggregateExpression())
  /** Exact long-backed fixed-point SUM OF PRODUCTS — bit-identical to
    * `sum(a.cast(DECIMAL(18,sa)) * b.cast(DECIMAL(18,sb))).cast(DOUBLE)`
    * (see [[FixedPointProductSum]]); throws loudly outside the
    * guarded value range. */
  def fixed_point_product_sum(a: Column, b: Column,
      scaleA: Int, scaleB: Int): Column =
    Bridge.column(FixedPointProductSum(Bridge.expression(a),
      Bridge.expression(b), scaleA, scaleB).toAggregateExpression())
  def bloom_might_contain(c: Column, bloomBytes: Array[Byte]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), bloomBytes))
  def nfc_normalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
