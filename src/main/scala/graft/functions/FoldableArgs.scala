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
  * AnalysisException naming the function and parameter instead.
  */
object FoldableArgs {
  def intLit(e: Expression, funcName: String, paramName: String): Int = {
    val v = if (e.foldable && e.dataType == IntegerType) e.eval() else null
    v match {
      case i: java.lang.Integer => i.intValue()
      case _ => throw new AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$funcName`",
          "paramName" -> s"`$paramName`",
          "paramType" -> "\"INT\""))
    }
  }
}
