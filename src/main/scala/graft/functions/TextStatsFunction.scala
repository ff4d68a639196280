package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
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

  private val Space = UTF8String.fromString(" ")

  /** Single-pass Gopher repetition statistics:
    * (n_lines, d_lines, line_chars, d_line_chars, n_big, max_c2, n_5,
    * d_5) — byte-identical to the declarative composition it replaced
    * (array_distinct + sort_array + runtime folds over materialized
    * gram arrays), whose higher-order functions evaluate interpreted
    * per element; this is one static call per document inside
    * WholeStageCodegen. max_c2 (the longest equal-run of the SORTED
    * bigram array) is computed as the max bigram multiplicity — the
    * same number without the sort.
    */
  def repetition(lines: ArrayData, words: ArrayData): InternalRow = {
    val nLines = lines.numElements()
    val seenLines = new java.util.HashSet[UTF8String]()
    var dLines = 0L; var lineChars = 0L; var dLineChars = 0L
    var i = 0
    while (i < nLines) {
      val l = lines.getUTF8String(i)
      val c = l.numChars()
      lineChars += c
      if (seenLines.add(l)) { dLines += 1; dLineChars += c }
      i += 1
    }
    val n = words.numElements()
    val nBig = if (n >= 2) (n - 1).toLong else 0L
    var maxC2 = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[UTF8String, Integer]()
      var j = 0
      while (j < n - 1) {
        val bg = UTF8String.concat(
          words.getUTF8String(j), Space, words.getUTF8String(j + 1))
        val c = counts.merge(bg, Integer.valueOf(1),
          (a: Integer, b: Integer) => Integer.valueOf(a + b))
        if (c > maxC2) maxC2 = c.toLong
        j += 1
      }
    }
    val n5 = if (n >= 5) (n - 4).toLong else 0L
    var d5 = 0L
    if (n >= 5) {
      val seen5 = new java.util.HashSet[UTF8String]()
      var j = 0
      while (j < n - 4) {
        val g = UTF8String.concat(
          words.getUTF8String(j), Space, words.getUTF8String(j + 1), Space,
          words.getUTF8String(j + 2), Space, words.getUTF8String(j + 3),
          Space, words.getUTF8String(j + 4))
        if (seen5.add(g)) d5 += 1
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](
      nLines.toLong, dLines, lineChars, dLineChars, nBig, maxC2, n5, d5))
  }

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** T5 span corruption (q_span_corruption) as ONE per-document pass:
    * position p masks iff the first 4 hex chars of
    * md5("docId:p:sc42") mod 1000 < maskPm (byte-identical to the
    * declarative hashBucket/DuckDB construction — the first two
    * digest bytes ARE those 4 hex chars), contiguous masked runs
    * collapse to one densely-numbered sentinel in the input, the
    * target lists each sentinel + its hidden tokens. Replaces a
    * token-level posexplode + doc_id window + ordered collect_list
    * rebuild: the per-token exchange is gone — text never shuffles.
    */
  // Output assembly collects UTF8String pieces and concatenates their
  // RAW BYTES (UTF8String.concat) — never round-trips through
  // java.lang.String, whose UTF-8 decode would lossy-replace invalid
  // byte sequences and silently diverge from the byte-level
  // declarative path this kernel replaced (and from the DuckDB
  // oracle). Same for the gram digests below: md5 folds each token's
  // raw bytes directly.
  def spanCorrupt(docId: Long, words: ArrayData, maskPm: Int): InternalRow = {
    val md = Md5.get()
    val n = words.numElements()
    val in = new java.util.ArrayList[UTF8String]
    val tgt = new java.util.ArrayList[UTF8String]
    var runId = 0
    var prevMasked = false
    var i = 0
    while (i < n) {
      md.reset()
      md.update((docId.toString + ":" + i.toString + ":sc42")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val dig = md.digest()
      val bucket = (((dig(0) & 0xff) << 8) | (dig(1) & 0xff)) % 1000
      val tok = words.getUTF8String(i)
      if (bucket < maskPm) {
        if (!prevMasked) {
          val sent = UTF8String.fromString("<extra_id_" + runId + ">")
          runId += 1
          if (!in.isEmpty) in.add(Space)
          in.add(sent)
          if (!tgt.isEmpty) tgt.add(Space)
          tgt.add(sent)
        }
        tgt.add(Space)
        tgt.add(tok)
        prevMasked = true
      } else {
        if (!in.isEmpty) in.add(Space)
        in.add(tok)
        prevMasked = false
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.concat(in.toArray(new Array[UTF8String](in.size)): _*),
      UTF8String.concat(tgt.toArray(new Array[UTF8String](tgt.size)): _*)))
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** DISTINCT md5-hex digests of the document's n-token windows
    * (q_ngram_novelty's map side) in one pass: replaces an
    * interpreted transform(sequence, i -> md5(concat_ws(slice))) plus
    * a DataFrame-level distinct — emitting the per-document set here
    * makes (doc_id, gh) unique by construction, so the distinct's
    * hash exchange disappears from the plan entirely.
    */
  def gramDigests(tokens: ArrayData, n: Int): ArrayData = {
    val md = Md5.get()
    val total = tokens.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (total >= n) {
      var i = 0
      while (i + n <= total) {
        md.reset()
        var j = 0
        while (j < n) {
          if (j > 0) md.update(' '.toByte)
          md.update(tokens.getUTF8String(i + j).getBytes)
          j += 1
        }
        val dig = md.digest()
        val hex = new Array[Char](32)
        var k = 0
        while (k < 16) {
          hex(2 * k) = HexDigits((dig(k) >> 4) & 0xf)
          hex(2 * k + 1) = HexDigits(dig(k) & 0xf)
          k += 1
        }
        out.add(UTF8String.fromString(new String(hex)))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[Any]])
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

case class RepetitionStats(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"repetition_stats expects (array<string>, array<string>), got $other")
    }
  override def dataType: DataType = StructType(Seq(
    "n_lines", "d_lines", "line_chars", "d_line_chars",
    "n_big", "max_c2", "n_5", "d_5")
    .map(StructField(_, LongType, nullable = false)))
  override def nullSafeEval(l: Any, w: Any): Any =
    GraftText.repetition(l.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, w) => s"graft.functions.GraftText.repetition($l, $w)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

case class SpanCorrupt(left: Expression, right: Expression, maskPm: Int)
    extends BinaryExpression {
  override def prettyName: String = "span_corrupt"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"span_corrupt expects (bigint, array<string>), got $other")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("input", StringType, nullable = false),
    StructField("target", StringType, nullable = false)))
  override def nullSafeEval(id: Any, w: Any): Any =
    GraftText.spanCorrupt(id.asInstanceOf[Long],
      w.asInstanceOf[ArrayData], maskPm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (id, w) => s"graft.functions.GraftText.spanCorrupt($id, $w, $maskPm)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight, maskPm)
}

case class GramDigests(child: Expression, n: Int)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftText.gramDigests(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftText.gramDigests($c, $n)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c, n)
}

object TextFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_stats", exprs => TextStats(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_digests",
      exprs => GramDigests(exprs.head,
        FoldableArgs.intLit(exprs(1), "gram_digests", "n")), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "repetition_stats",
      exprs => RepetitionStats(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "span_corrupt",
      exprs => SpanCorrupt(exprs.head, exprs(1),
        FoldableArgs.intLit(exprs(2), "span_corrupt", "mask_pm")), "built-in")
  }
}
