package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType}

/** Whole-operator Catalyst extension: a binned range join.
  *
  * Spark plans a non-equi interval join (`p >= lo AND p < hi`) as a
  * broadcast nested-loop join — O(|points| × |bands|), a scale-killer
  * once the band side outgrows broadcast. The standard fix (Databricks
  * RANGE_JOIN hint, Flink interval join) is binning: quantize both
  * sides by a bin width, equi-join on the bin, then re-check the exact
  * predicate. Each point lands in exactly one bin, so no dedup is
  * needed; each interval covers (hi-lo)/w + 1 bins.
  *
  * Surface: the join condition is written as the single marker
  * predicate `graft_range_join(point, lo, hi, width)`. Unrewritten it
  * evaluates the exact interval predicate (correct, nested-loop);
  * with [[BinnedRangeJoinRule]] installed the optimizer lowers the
  * join to the binned equi-join — same rows, shuffle-hash/broadcast-
  * hash plan. The marker references columns from BOTH sides, so no
  * optimizer rule can split or push it out of the join condition.
  *
  * Registration: [[RangeJoin.register]] (runtime, via
  * `spark.experimental.extraOptimizations` — appended as the final
  * optimizer batch) or [[graft.GraftExtensions]] (build-time, via
  * `SparkSessionExtensions.injectOptimizerRule`).
  */
case class RangeJoinCond(
    point: Expression, lo: Expression, hi: Expression, width: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(point, lo, hi, width)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (!children.forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckFailure(
        "graft_range_join expects (point, lo, hi, width) as DOUBLE; " +
          s"got ${children.map(_.dataType.simpleString).mkString(", ")}")
    else if (!width.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_range_join bin width must be a literal")
    else {
      // A zero/negative/NaN width would bin to ±Infinity (or crash the
      // rewritten Sequence); reject at analysis, before either plan runs.
      val w = width.eval()
      if (w == null || !java.lang.Double.isFinite(w.asInstanceOf[Double]) ||
          w.asInstanceOf[Double] <= 0.0)
        TypeCheckResult.TypeCheckFailure(
          s"graft_range_join bin width must be a finite positive literal; got $w")
      else TypeCheckResult.TypeCheckSuccess
    }

  /** Exact semantics when the rule is not installed (or after it: the
    * rewrite re-checks this same predicate natively). CodegenFallback
    * is acceptable here because the rewritten plan never contains this
    * expression — only the unrewritten nested-loop fallback does.
    */
  override def eval(input: InternalRow): Any = {
    val p = point.eval(input); val l = lo.eval(input); val h = hi.eval(input)
    p != null && l != null && h != null && {
      val pd = p.asInstanceOf[Double]
      pd >= l.asInstanceOf[Double] && pd < h.asInstanceOf[Double]
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(c(0), c(1), c(2), c(3))
}

/** Lowers Join(cond = graft_range_join(p, lo, hi, w)) to a binned
  * equi-join. Runs after the main optimizer batches, so it sees the
  * final join shape; the emitted plan is plain resolved logical
  * operators (Project/Generate/Join) that the planner turns into a
  * hash join on the bin key.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(c: RangeJoinCond), _)
        if c.point.references.subsetOf(l.outputSet) &&
          (c.lo.references ++ c.hi.references).subsetOf(r.outputSet) &&
          c.children.forall(_.dataType == DoubleType) && c.width.foldable =>
      rewrite(j, pointSide = l, bandSide = r, c, pointOnLeft = true)
    case j @ Join(l, r, Inner, Some(c: RangeJoinCond), _)
        if c.point.references.subsetOf(r.outputSet) &&
          (c.lo.references ++ c.hi.references).subsetOf(l.outputSet) &&
          c.children.forall(_.dataType == DoubleType) && c.width.foldable =>
      rewrite(j, pointSide = r, bandSide = l, c, pointOnLeft = false)
  }

  private def rewrite(j: Join, pointSide: LogicalPlan, bandSide: LogicalPlan,
      c: RangeJoinCond, pointOnLeft: Boolean): LogicalPlan = {
    val w = Literal(c.width.eval().asInstanceOf[Double], DoubleType)
    // point side: one bin per row
    val binP = Alias(Floor(Divide(c.point, w)), "graft_bin_p")()
    val pointPlan = Project(pointSide.output :+ binP, pointSide)
    // band side: explode the covered bin range ((hi-lo)/w + 1 rows).
    // Sequence throws when start > stop with step +1, so an empty or
    // null interval (lo > hi, or either bound null — the exact marker
    // predicate matches nothing for both) must short-circuit to zero
    // bins, not crash the rewritten plan.
    val seq = Sequence(Floor(Divide(c.lo, w)), Floor(Divide(c.hi, w)),
      Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))
    val noBins = Literal.create(Array.empty[Long],
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))
    val guarded = If(LessThanOrEqual(c.lo, c.hi), seq, noBins)
    val binB = AttributeReference("graft_bin_b", LongType, nullable = false)()
    val bandPlan = Generate(Explode(guarded), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binB),
      child = bandSide)
    // equi-join on the bin + exact interval re-check
    val cond = And(EqualTo(binP.toAttribute, binB),
      And(GreaterThanOrEqual(c.point, c.lo), LessThan(c.point, c.hi)))
    val joined =
      if (pointOnLeft) Join(pointPlan, bandPlan, Inner, Some(cond), JoinHint.NONE)
      else Join(bandPlan, pointPlan, Inner, Some(cond), JoinHint.NONE)
    Project(j.output, joined)
  }
}

object RangeJoin {
  /** Register the marker function and install the rewrite rule on an
    * existing session (idempotent). `extraOptimizations` is the
    * sanctioned runtime hook — the rule runs as the optimizer's final
    * user batch.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_range_join",
      exprs => RangeJoinCond(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
    if (!spark.experimental.extraOptimizations.contains(BinnedRangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BinnedRangeJoinRule
  }
}
