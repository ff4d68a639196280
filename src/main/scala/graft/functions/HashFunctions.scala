package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Single-pass hash kernels over token/shingle arrays.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`)
  * evaluate interpreted with per-element boxing — measurably slow for
  * signature computation (64 lanes × every token). These kernels do
  * the whole document in one JVM call over primitive arrays, and the
  * expressions codegen to a static call, so the surrounding operators
  * stay inside WholeStageCodegen. Seeded xxHash64 follows the
  * reference's seeded-hasher design (reference `src/hashtable.rs:65-80,
  * 95-96`).
  */
object GraftHash {
  private final val Seed = 42L

  /** 64-bit SimHash: per-token xxHash64, ±1 bit votes, packed sign. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val s = tokens.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Distinct 3-token shingles in one pass (LinkedHashSet preserves
    * first-seen order, matching the declarative
    * transform+array_distinct composition). Short docs collapse to a
    * single whole-text shingle.
    */
  def shingles3(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    if (n < 3) {
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        if (i > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i).toString)
        i += 1
      }
      out.add(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
    } else {
      var i = 0
      while (i + 2 < n) {
        out.add(org.apache.spark.unsafe.types.UTF8String.concatWs(
          org.apache.spark.unsafe.types.UTF8String.fromString(" "),
          tokens.getUTF8String(i), tokens.getUTF8String(i + 1),
          tokens.getUTF8String(i + 2)))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Polynomial rolling hash (Rabin-Karp style) over UTF-8 bytes:
    * h = Σ b_i · B^(n-1-i) mod 2^64, B = 1000000007. One pass,
    * order-sensitive (unlike a bag-of-tokens hash) — the classic
    * document-fingerprint primitive.
    */
  def rollingFp(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000000007L + (bytes(i) & 0xFF)
      i += 1
    }
    h
  }

  /** k-lane MinHash signature: per-shingle base hash, k cheap
    * re-hashes, running minima. One pass over the shingle set.
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
      var j = 0
      while (j < k) {
        val h = XXH64.hashLong(base, j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

private[functions] trait StringArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} expects array<string>, got ${other.simpleString}")
  }
}

case class RollingFp(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fp expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    GraftHash.rollingFp(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.rollingFp($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class Shingles3(child: Expression)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftHash.shingles3(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.shingles3($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class SimHash64(child: Expression)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    GraftHash.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Seeded xxHash64 of a long key — the reference's hasher takes a
  * per-index random seed (reference src/hashtable.rs:65-80, 95-96);
  * Spark's builtin `xxhash64` pins seed 42, so this surfaces the seed.
  */
case class Xxh64Seeded(child: Expression, seed: Long) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"xxh64_seeded expects bigint, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    XXH64.hashLong(v.asInstanceOf[Long], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($c, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftHash.minhashSig(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.minhashSig($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HashFunctions {
  /** Register `simhash64` and `minhash16` for use via `expr(...)`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash16", exprs => MinHashSig(exprs.head, 16), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles3", exprs => Shingles3(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fp", exprs => RollingFp(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "xxh64_seeded", exprs => Xxh64Seeded(exprs(0),
        exprs(1).eval().asInstanceOf[Number].longValue), "built-in")
  }
}
