package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns — the one hot-path scalar where the built-in
  * higher-order functions (`zip_with` + `aggregate`) are not enough:
  * HOFs evaluate interpreted lambdas and allocate a zipped struct array
  * per row, which dominates pair-scoring joins (millions of candidate
  * pairs × 64 dims). This expression is a single fused loop (dot and both
  * norms in one pass) with `doGenCode`, so it runs inside whole-stage
  * codegen with zero allocation.
  *
  * Float parity: accumulation is index order 0..n−1, identical to the
  * HOF formulation and to the DuckDB oracle's zipped-unnest `sum()` —
  * same IEEE result bit for bit.
  *
  * Null elements inside the arrays are not expected (embedding fixtures
  * are dense); a null element reads as 0.0 like Spark's own vector ops.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  // contract: both children are array<double> (callers cast explicitly —
  // `Similarity.asDouble`); no ImplicitCastInputTypes because Spark keeps
  // AbstractDataType private[sql]
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen form of the sign-LSH band hashing
  * ([[graft.ext.Similarity.lshBandBuckets]]'s HOF formulation): for each
  * band b and bit jj, hyperplane j = b·bits+jj is dotted with the vector
  * using LCG weights w(j,i) = ((1103515245·(j·dims+i) + 12345) mod 2^31)
  * / 2^30 − 1, and the sign bits pack into a long bucket id per band.
  *
  * Why native: the HOF version materializes `bands × bits` interpreted
  * lambda evaluations per row, each allocating a zipped sequence array —
  * O(bands·bits·dims) interpreted work on every corpus row before the
  * candidate shuffle. This is one fused triple loop inside whole-stage
  * codegen, zero allocation beyond the output array.
  *
  * Parity contract: double accumulation runs in index order i=0..dims−1
  * with identical long LCG arithmetic, so buckets are bit-for-bit equal
  * to the HOF form (asserted in ExtSpec) and to the DuckDB oracle's
  * replication of the same formula. `dims` is the array length (callers
  * of the HOF form always passed the true length). */
case class SignLshBands(vec: Expression, bands: Expression,
                        bitsPerBand: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with Serializable {

  override def first: Expression = vec
  override def second: Expression = bands
  override def third: Expression = bitsPerBand
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_bands"

  override def nullSafeEval(v: Any, nb: Any, bpb: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val nBands = nb.asInstanceOf[Int]
    val bits = bpb.asInstanceOf[Int]
    val dims = x.numElements()
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var jj = 0
      while (jj < bits) {
        val j = b.toLong * bits + jj
        var s = 0.0
        var i = 0
        while (i < dims) {
          val w = ((1103515245L * (j * dims + i) + 12345L) % 2147483648L)
            .toDouble / 1073741824.0 - 1.0
          s += x.getDouble(i) * w
          i += 1
        }
        if (s > 0) bucket += (1L << jj)
        jj += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nb, bpb) => {
      val dims = ctx.freshName("dims")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val jj = ctx.freshName("jj")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $dims = $v.numElements();
         |long[] $out = new long[$nb];
         |for (int $b = 0; $b < $nb; $b++) {
         |  long $bucket = 0L;
         |  for (int $jj = 0; $jj < $bpb; $jj++) {
         |    long $j = (long) $b * $bpb + $jj;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dims; $i++) {
         |      double $w = (double) ((1103515245L * ($j * $dims + $i) + 12345L)
         |        % 2147483648L) / 1073741824.0 - 1.0;
         |      $s += $v.getDouble($i) * $w;
         |    }
         |    if ($s > 0) $bucket += (1L << $jj);
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(vec = newFirst, bands = newSecond, bitsPerBand = newThird)
}

/** Session-extension entry point: injects the engine's custom functions
  * at session build time — the deployment path for a cluster
  * (`spark.sql.extensions=graft.functions.GraftExtensions`), where every
  * session gets the functions without any runtime registration call.
  * [[VectorFunctions.register]] remains the fallback for sessions built
  * without the extension. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(VectorFunctions.CosineName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, VectorFunctions.CosineName),
      VectorFunctions.cosineBuilder))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(VectorFunctions.LshName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SignLshBands].getName, VectorFunctions.LshName),
      VectorFunctions.lshBuilder))
  }
}

object VectorFunctions {

  val CosineName = "graft_cosine_sim"

  /** Shared builder with an arity check: silently dropping extra args
    * (or throwing IndexOutOfBounds on too few) would be a wrong-result /
    * unreadable-error hazard for SQL users of the injected function. */
  private[functions] val cosineBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case exprs => throw new IllegalArgumentException(
      s"$CosineName expects exactly 2 arguments (array<double>, " +
        s"array<double>); got ${exprs.length}")
  }

  val LshName = "graft_lsh_bands"

  private[functions] val lshBuilder: Seq[Expression] => Expression = {
    case Seq(v, nb, bpb) => SignLshBands(v, nb, bpb)
    case exprs => throw new IllegalArgumentException(
      s"$LshName expects exactly 3 arguments (array<double>, bands, " +
        s"bitsPerBand); got ${exprs.length}")
  }

  /** Sessions this process has already registered into. Weak keys: the
    * set must never pin a closed SparkSession in memory. */
  private val registeredSessions: java.util.Set[SparkSession] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** True iff both graft_ names resolve to OUR builder instances in the
    * session's registry. Identity (eq), not mere existence: a foreign
    * `CREATE OR REPLACE TEMPORARY FUNCTION` squatting on a graft_ name
    * after registration must be healed exactly like a drop — name
    * existence alone would silently keep it and corrupt every
    * similarity score. Only called when the session is already latched
    * (or under the lock), so it never triggers sessionState lazy init
    * on an unseen session. */
  private def bound(spark: SparkSession): Boolean = {
    val reg = spark.sessionState.functionRegistry
    Seq(CosineName -> cosineBuilder, LshName -> lshBuilder).forall {
      case (n, b) =>
        reg.lookupFunctionBuilder(
          org.apache.spark.sql.catalyst.FunctionIdentifier(n))
          .exists(_ eq b)
    }
  }

  /** Register the expressions in the session's function registry (public
    * Catalyst API — Column-from-Expression constructors are private[sql]
    * in Spark 4, so resolution goes through `call_function` instead).
    * Idempotent; called per query build, so the normal path is a cheap
    * fast path: latched session + both names still bound to our
    * builders → return (two in-memory lookups whose only contention is
    * other microsecond set/registry ops — never the registerLock, so
    * it cannot block behind another session's first registration,
    * which may run arbitrary sessionState/extension init). Otherwise,
    * under registerLock:
    * `createOrReplaceTempFunction` both names — replacing any stale or
    * foreign squatter, never silently keeping it — and latch the
    * session only AFTER both are in place, so a concurrent caller can
    * never observe register() returning while a name is unresolvable,
    * and a registration that throws is retried on the next call instead
    * of being latched as done. Repeat registration (and its
    * replace-WARN) happens only on heal — a user DROP or foreign
    * replace of a graft_ name — so the WARN logs at most once per
    * session in the normal path. Extension-injected sessions get
    * re-bound to the identical shared builder — a no-op. */
  def register(spark: SparkSession): Unit = {
    if (registeredSessions.contains(spark) && bound(spark)) return
    // Dedicated lock, NOT the synchronizedSet's own monitor: every
    // method of a Collections.synchronizedSet synchronizes on the
    // wrapper, so holding THAT monitor across sessionState init would
    // make the fast path's contains() block behind it — the exact
    // serialization the fast path exists to avoid. Under registerLock,
    // contains()/add() only contend with each other's microsecond set
    // ops, never with a registration in flight. Visibility: the slow
    // path registers BEFORE add(), and the set's own monitor
    // (released by add, acquired by a fast-path contains) carries the
    // happens-before; the registry's own internal synchronization
    // covers bound()'s reads.
    registerLock.synchronized {
      if (!registeredSessions.contains(spark) || !bound(spark)) {
        val reg = spark.sessionState.functionRegistry
        reg.createOrReplaceTempFunction(CosineName, cosineBuilder, "internal")
        reg.createOrReplaceTempFunction(LshName, lshBuilder, "internal")
        registeredSessions.add(spark)
      }
    }
  }

  private val registerLock = new Object

  /** Column wrapper: fused codegen cosine similarity. Requires
    * [[register]] to have run on the executing session. */
  def cosineSim(a: Column, b: Column): Column =
    call_function(CosineName, a, b)

  /** Column wrapper: fused codegen sign-LSH band buckets. Requires
    * [[register]] to have run on the executing session. */
  def lshBands(vec: Column, bands: Column, bitsPerBand: Column): Column =
    call_function(LshName, vec, bands, bitsPerBand)
}
