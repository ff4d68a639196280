package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016, the
  * GPT-2/Llama tokenizer construction) — the one tokenizer-side
  * operator a training-data engine owes the pipeline beyond token
  * counting: learn the first `Merges` merge rules from the corpus.
  *
  * The scale design is the same one that makes BPE training feasible
  * anywhere: the merge loop never touches the corpus. The ONLY
  * corpus-wide pass is the initial word-frequency aggregate
  * (map-side combined, shuffling (word, count) pairs); every
  * iteration after that operates on the WORD-FREQUENCY table, whose
  * size is the corpus VOCABULARY — bounded in the millions at any
  * corpus scale, and independent of token count. Per iteration: one
  * thin (left, right, Σcount) pair aggregate over the vocabulary, a
  * single-row driver collect of the argmax pair (deterministic
  * tiebreak: count desc, then left, then right), and a per-row
  * left-to-right merge fold applied to the symbol arrays (a
  * higher-order `aggregate` over arrays that average a handful of
  * symbols — no UDF, no corpus shuffle). `localCheckpoint` truncates
  * the 8-deep lambda lineage, the standard iterative-algorithm
  * pattern (same as the connected-components fixpoint).
  *
  * Rows-only by contract (an iterative argmax loop is not
  * SQL-expressible); BpeSpec replays the identical algorithm over the
  * collected word counts in plain Scala and pins every merge row —
  * step, pair, and count — plus the greedy left-to-right merge-pass
  * semantics on adversarial symbol runs ("aaa" + (a,a) → [aa, a]).
  */
object Bpe {

  /** Number of merge rules to learn. Real tokenizers run 30k-100k
    * merges; each is the same bounded iteration, so the count is a
    * budget knob, not a scale limit.
    */
  val Merges = 8

  /** The one corpus-wide pass: whitespace word frequencies. */
  private[graft] def wordFreq(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** One greedy left-to-right merge pass over a symbol array: adjacent
    * (l, r) becomes the fused symbol; a freshly fused symbol never
    * re-merges with the element that follows in the same pass
    * ("aaa" + (a,a) → [aa, a] — the standard BPE pass semantics).
    */
  private def mergePass(syms: org.apache.spark.sql.Column, l: String,
      r: String): org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_merges" -> ((s, d) => {
      var words = wordFreq(s, d)
        .select(split(col("w"), "").as("syms"), col("cnt"))
        .localCheckpoint()
      val merges = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, Long)]
      var step = 1
      var exhausted = false
      while (step <= Merges && !exhausted) {
        val top = words.filter(size(col("syms")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(syms[i-1] AS l, syms[i] AS r))")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("pair_count"))
          .orderBy(col("pair_count").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, c) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((step.toLong, l, r, c))
          words = words
            .withColumn("syms", mergePass(col("syms"), l, r))
            .localCheckpoint()
          step += 1
        }
      }
      s.createDataFrame(merges.toSeq)
        .toDF("step", "left", "right", "pair_count")
        .orderBy(col("step"))
    })
  )

  val oracle: Map[String, String] = Map.empty
}
