package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.IntegerType

/** Parse-time validation for literal INT arguments of registered
  * kernel functions (`gram_digests`, `span_corrupt`, `plane_sigs`,
  * `plane_project`, `mrl_cosines`): these parameters are baked into
  * the generated code, so they must be foldable at registration time.
  * A bare `eval().asInstanceOf[Int]` turns a non-literal or NULL
  * argument into an opaque NullPointerException/ClassCastException;
  * this helper raises Spark's standard NON_FOLDABLE_ARGUMENT
  * AnalysisException naming the function and parameter instead. A
  * foldable argument that EVALUATES to NULL (e.g. CAST(NULL AS INT))
  * is a different failure — the argument folds fine, its value is
  * just unusable — so it gets INVALID_PARAMETER_VALUE.NULL rather
  * than a mislabeled non-foldable report.
  */
object FoldableArgs {
  def intLit(e: Expression, funcName: String, paramName: String): Int = {
    if (!e.foldable || e.dataType != IntegerType)
      throw new AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$funcName`",
          "paramName" -> s"`$paramName`",
          "paramType" -> "\"INT\""))
    e.eval() match {
      case i: java.lang.Integer => i.intValue()
      case null => throw new AnalysisException(
        errorClass = "INVALID_PARAMETER_VALUE.NULL",
        messageParameters = Map(
          "functionName" -> s"`$funcName`",
          "parameter" -> s"`$paramName`"))
      case _ => throw new AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$funcName`",
          "paramName" -> s"`$paramName`",
          "paramType" -> "\"INT\""))
    }
  }
}
