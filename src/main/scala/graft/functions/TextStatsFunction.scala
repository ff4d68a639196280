package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token statistics: (n_tokens, n_stop, char_sum).
  *
  * Same motivation as graft.functions.GraftHash: the declarative
  * `size(filter(...))` + `aggregate(...)` composition evaluates
  * interpreted per element (and pays a multi-second first-use
  * class-generation spike); this kernel is one static call per
  * document inside WholeStageCodegen.
  */
object GraftText {
  /** English function words — the signal for quality scoring and the
    * language-ID heuristic (keep in sync with TextOps.stopwords).
    */
  val Stopwords: Array[String] = Array("the", "a", "of", "and", "to", "in", "is")

  private val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    Stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def stats(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    var stop = 0L
    var chars = 0L
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (stopSet.contains(t)) stop += 1
      chars += t.numChars()
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, stop, chars))
  }
}

case class TextStats(child: Expression)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("char_sum", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    GraftText.stats(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftText.stats($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object TextFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_stats", exprs => TextStats(exprs.head), "built-in")
}
