package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Cosine similarity over two float-vector columns as a native
  * Catalyst expression with whole-stage codegen.
  *
  * This is the hot inner loop of the similarity/dedup operators: at
  * 100 TB a brute-force block can evaluate billions of pairs, so the
  * kernel must stay inside WholeStageCodegen (a Scala UDF would box
  * every element; `zip_with`+`aggregate` allocates an intermediate
  * array per pair). The generated code is a single fused loop over the
  * two ArrayData buffers, accumulating dot/norms in double — the exact
  * fold the DuckDB oracle mirrors, so results are bit-identical.
  *
  * Semantics: dot(a,b) / sqrt(norm(a)*norm(b)); null if either side is
  * null, lengths differ, or either norm is zero.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = (double) $a.getFloat($i);
         |    final double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Inner (dot) product over two float-vector columns — CosineSim's
  * un-normalized sibling, for max-inner-product retrieval where
  * magnitude carries signal. Same fused codegen loop, same sequential
  * fold as the DuckDB mirror.
  */
case class InnerProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"inner_product expects array<float> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var dot = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Deterministic random-hyperplane set shared by every sign-LSH
  * consumer (embedding near-dup, ANN buckets) AND by the DuckDB oracle
  * mirror — the planes are seeded constants (the reference seeds its
  * hasher the same way, reference src/hashtable.rs:95-96), so the
  * oracle SQL can embed the identical values and reproduce bucket
  * assignments bit-for-bit.
  */
object Planes {
  val Dim = 64
  val MaxPlanes = 128 // first 16 feed the oracle-mirrored embed dedup;
                      // 48 = 8 ANN tables × 6 bits; 64 = 8 × 8 bits
                      // (the sf0.1 adaptive width); 128 lets the
                      // second-decade scale probe run 8 × up-to-16
                      // bits, i.e. the adaptive law out to ~500k
                      // vectors (generation is row-major from one
                      // seeded stream, so growing the pool never
                      // changes earlier planes — every committed
                      // oracle keeps its exact plane literals)

  /** First `n` of the fixed seed-42 gaussian plane set. */
  val all: Array[Array[Double]] = {
    val rng = new scala.util.Random(42)
    Array.fill(MaxPlanes)(Array.fill(Dim)(rng.nextGaussian()))
  }

  def take(n: Int): Array[Array[Double]] = all.take(n)

  /** DuckDB expression for the dot of `col` against plane `p` — the
    * same sequential left-fold of float→double products the JVM kernel
    * runs, so the sign (and value) is bit-identical. Doubles are
    * rendered with Java's shortest round-trip formatting, which DuckDB
    * parses back to the same bits.
    */
  def sqlDot(col: String, p: Array[Double]): String = {
    val lits = p.map(java.lang.Double.toString).mkString("[", ", ", "]")
    s"list_sum(list_transform(generate_series(1, len($col)), " +
      s"i -> CAST($col[i] AS DOUBLE) * ($lits::DOUBLE[])[i]))"
  }

  /** DuckDB list expression mirroring `plane_project(col, k)`: each
    * element the same dot times the same 1/√k double, rounded to 6
    * decimals on both sides (list_sum's fold order can diverge from
    * the JVM's sequential fold in the last ulp).
    */
  def sqlProject(col: String, k: Int): String = {
    val scale = java.lang.Double.toString(1.0 / math.sqrt(k.toDouble))
    (0 until k).map(j => s"round(${sqlDot(col, all(j))} * $scale, 6)")
      .mkString("[", ", ", "]")
  }

  /** DuckDB expression list for the banded sign signatures of `col`
    * (mirrors `plane_sigs(col, nPlanes, bandBits)`).
    */
  def sqlBandSigs(col: String, nPlanes: Int, bandBits: Int): Seq[String] = {
    require(nPlanes % bandBits == 0 && nPlanes <= MaxPlanes)
    (0 until nPlanes / bandBits).map { b =>
      val bits = (0 until bandBits).map { r =>
        s"(CASE WHEN ${sqlDot(col, all(b * bandBits + r))} > 0 THEN ${1L << r} ELSE 0 END)"
      }
      s"CAST(${bits.mkString(" + ")} AS BIGINT)"
    }
  }
}

/** JVM kernels backing the vector expressions. */
object VectorKernels {
  /** Banded sign-LSH signatures: bit r of band b is the sign of the
    * vector's dot with plane (b·bandBits + r). One fused pass; the dot
    * is a sequential left fold matching the DuckDB mirror exactly.
    */
  def planeSigs(v: ArrayData, nPlanes: Int, bandBits: Int): ArrayData = {
    val planes = Planes.all
    val sigs = new Array[Long](nPlanes / bandBits)
    val n = v.numElements()
    var p = 0
    while (p < nPlanes) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      val m = if (n < plane.length) n else plane.length
      while (i < m) { dot += v.getFloat(i).toDouble * plane(i); i += 1 }
      if (dot > 0) sigs(p / bandBits) |= 1L << (p % bandBits)
      p += 1
    }
    new GenericArrayData(sigs)
  }

  /** Prefix cosines at each Matryoshka dimension budget in ONE fused
    * pass: because the budgets nest (8 ⊂ 16 ⊂ 32 ⊂ 64 share their
    * leading elements), a single running (dot, |a|², |b|²)
    * accumulation snapshotted at each boundary IS the per-budget
    * prefix fold — the same left-to-right adds an independent
    * `aggregate(slice(v, 1, m), ...)` would do, so every cosine is
    * bit-identical to the four-fold form while the loop touches each
    * element exactly once. Budgets must be ascending; a budget past
    * the vector length clamps (matching `slice` semantics).
    */
  def mrlCosines(a: ArrayData, b: ArrayData, dims: Array[Int]): ArrayData = {
    val out = new Array[Double](dims.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0; var k = 0
    val n = math.min(a.numElements(), b.numElements())
    while (k < dims.length) {
      val m = math.min(dims(k), n)
      while (i < m) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      out(k) = dot / math.sqrt(na * nb)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Dense projection onto the first k planes, scaled 1/√k. The dot
    * is the same sequential left fold as `Planes.sqlDot`, and the
    * scale multiplies once at the end — one double op, mirrored
    * verbatim in the oracle, so parity is bit-exact.
    */
  def planeProject(v: ArrayData, k: Int): ArrayData = {
    val planes = Planes.all
    val out = new Array[Double](k)
    val scale = 1.0 / math.sqrt(k.toDouble)
    val n = v.numElements()
    var j = 0
    while (j < k) {
      val plane = planes(j)
      var dot = 0.0
      var i = 0
      val m = if (n < plane.length) n else plane.length
      while (i < m) { dot += v.getFloat(i).toDouble * plane(i); i += 1 }
      out(j) = dot * scale
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `plane_project(vec, k)`: Gaussian random projection (the
  * Johnson-Lindenstrauss transform) onto the first `k` seeded planes,
  * scaled by 1/√k so expected pairwise distances are preserved. The
  * dense-projection counterpart of the sign-only PlaneSigs — the
  * embedding dimensionality-reduction pass a pipeline runs before
  * indexing when 64 dims of float32 are 4× more bytes than retrieval
  * quality needs. Same seeded plane pool as every LSH consumer, same
  * sequential left-fold dot as the DuckDB mirror, so the projected
  * values are bit-identical cross-engine and q_embed_project is fully
  * oracled.
  */
case class PlaneProject(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0 && k <= Planes.MaxPlanes,
    s"plane_project: k=$k must be in 1..${Planes.MaxPlanes}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"plane_project expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorKernels.planeProject(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.planeProject($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `mrl_cosines(a, b, m1, m2, ...)`: prefix cosine at each ascending
  * Matryoshka dimension budget, as one whole-stage-codegen'd kernel
  * call per pair. This is the MRL-eval hot loop (|batch| × |corpus|
  * pairs): the lambda-expression form (`zip_with` + four
  * `aggregate(slice(...))` folds) allocates intermediate arrays and
  * evaluates interpreted; this touches each element once and stays
  * inside codegen. Values are bit-identical to the per-budget folds
  * (see [[VectorKernels.mrlCosines]]).
  */
case class MrlCosines(left: Expression, right: Expression, dims: Seq[Int])
    extends BinaryExpression {
  require(dims.nonEmpty && dims == dims.sorted && dims.head > 0,
    s"mrl_cosines: budgets must be ascending positive, got $dims")

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mrl_cosines expects array<float> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.mrlCosines(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData], dims.toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.mrlCosines(" +
        s"$a, $b, new int[]{${dims.mkString(", ")}});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `plane_sigs(vec, nPlanes, bandBits)`: array of per-band sign-LSH
  * signatures (whole-stage codegen; one kernel call per row).
  */
case class PlaneSigs(child: Expression, nPlanes: Int, bandBits: Int)
    extends UnaryExpression {
  require(nPlanes % bandBits == 0 && nPlanes <= Planes.MaxPlanes,
    s"plane_sigs: nPlanes=$nPlanes must be a multiple of bandBits=$bandBits, <= ${Planes.MaxPlanes}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"plane_sigs expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorKernels.planeSigs(v.asInstanceOf[ArrayData], nPlanes, bandBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.planeSigs($c, $nPlanes, $bandBits)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorFunctions {
  /** Register `cosine_sim` in the session's function registry (the
    * Column constructor is not public API in Spark 4, so expression
    * access goes through the registry + `expr`).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "plane_sigs", exprs => PlaneSigs(exprs(0),
        FoldableArgs.intLit(exprs(1), "plane_sigs", "n_planes"),
        FoldableArgs.intLit(exprs(2), "plane_sigs", "band_bits")),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "plane_project", exprs => PlaneProject(exprs(0),
        FoldableArgs.intLit(exprs(1), "plane_project", "n_planes")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "inner_product", exprs => InnerProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mrl_cosines", exprs => MrlCosines(exprs(0), exprs(1),
        exprs.drop(2).map(FoldableArgs.intLit(_, "mrl_cosines", "dims"))),
      "built-in")
  }

  /** Cosine similarity column over two array<float> columns. */
  def cosineSim(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    expr(s"cosine_sim($a, $b)")
  }
}
