package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** REJECTION-SAMPLING FINE-TUNING data assembly — the sample → grade →
  * select → train loop (Zelikman et al. 2022 STaR; Gulcehre et al.
  * 2023 ReST; Dong et al. 2023 RAFT; Llama-2's rejection-sampling
  * stage): draw a pool of candidate responses per task, keep the ones
  * a verifiable grader accepts, de-duplicate by final answer so one
  * mode doesn't flood the update, budget to the top-M, and emit the
  * survivors as SFT training rows. This is the missing link between
  * the RLVR grading family ([[Sft.verifyRewardsOf]] and the pass@k /
  * best-of-n estimators) and the SFT assembly chain — the operator a
  * post-training run executes BETWEEN them every iteration.
  *
  *  - `q_rft_select` — the selection law over the shared deterministic
  *    sample pool ([[Sft.samplePool]], independent `:rft` salt): per
  *    sample, the pass verdict (micro reward ≥ the measured
  *    [[Sft.PassThresholdMicro]] — the pass@k convention, every branch
  *    live at every SF), the final-answer decile (the
  *    q_self_consistency stand-in for a parsed answer), the per-answer
  *    dedup rank (best reward per distinct answer survives — RAFT's
  *    diversity rule: measured 191/197/1064 duplicate-answer samples
  *    collapse at sf0.001/0.01/0.1), the kept flag, and the kept-set
  *    rank. ALL-INTEGER after the pool's one IEEE quantization.
  *  - `q_rft_dataset` — the training-set assembly: kept samples
  *    budgeted to [[RftTopM]] per task (the cap MEASURED binding both
  *    ways at every SF: 3/4/37 tasks truncate, under-full tasks
  *    coexist), joined back to their document text, and published as
  *    SFT-ready rows with token accounting and a composed render
  *    fingerprint (md5 of the exact training string — the NIAH
  *    fingerprint discipline, so the oracle hash-checks the rendered
  *    bytes without shipping them).
  *
  * Scale shape at 100 TB: selection is two THIN exchanges — the pool's
  * (lang, source) task key (shared by the pool cut and the kept-rank
  * window) plus one (task, answer) key for the dedup rank — over
  * id-width rows; text dies at the quality kernel's scan projection
  * and never enters any exchange (plan-pinned). The dataset step
  * BROADCASTS the kept set (≤ M per task) into the documents scan, so
  * text again never shuffles; the render dies into its fingerprint in
  * the same projection. Semantic analog in the reference: the
  * insert-if-accepted discipline of `query.rs:3-5` re-read as a data
  * loop — only graded-in rows reach the next table.
  */
object Rft {

  /** Per-task survivor budget (RAFT's top-M). 3 is MEASURED to bind
    * both ways at every SF against [[Sft.SamplePoolK]] = 16 pools:
    * some tasks truncate (3/4/37 at sf0.001/0.01/0.1), some publish
    * fewer than M (min kept 0/0/1).
    */
  val RftTopM = 3L

  /** The selection law over ANY pool carrying (lang, source, doc_id,
    * samp, s6i) — exposed so the spec can drive designed pools (a
    * duplicate-answer collapse, an all-fail task, a truncating task)
    * through the exact production path.
    */
  private[graft] def selectOf(pool: DataFrame): DataFrame = {
    val task = Window.partitionBy(col("lang"), col("source"))
    val ans = Window.partitionBy(col("lang"), col("source"), col("answer"))
    pool
      .withColumn("passed", col("s6i") >= Sft.PassThresholdMicro)
      .withColumn("answer", expr("s6i div 100000"))
      .withColumn("arank", row_number().over(
        ans.orderBy(col("s6i").desc, col("doc_id"))).cast("long"))
      .withColumn("kept", col("passed") && col("arank") === 1L)
      .withColumn("keep_rank",
        when(col("kept"), row_number().over(
          task.orderBy(col("kept").desc, col("s6i").desc, col("doc_id")))
          .cast("long")).otherwise(0L))
      .select(col("lang"), col("source"), col("doc_id"), col("samp"),
        col("s6i").as("reward_micro"), col("answer"), col("passed"),
        col("arank"), col("kept"), col("keep_rank"))
  }

  /** The dataset assembly over a select table and its document text —
    * exposed for the spec's designed-corpus drive. The kept side is
    * tiny (≤ M rows per task) and broadcasts; text never shuffles.
    */
  private[graft] def datasetOf(sel: DataFrame, docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .join(broadcast(sel
        .filter(col("kept") && col("keep_rank") <= RftTopM)
        .select(col("lang"), col("source"), col("keep_rank"),
          col("doc_id"), col("reward_micro"), col("answer"))), "doc_id")
      .select(col("lang"), col("source"), col("keep_rank"), col("doc_id"),
        col("reward_micro"), col("answer"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        md5(concat(lit("<|rft|> "), col("lang"), lit("/"), col("source"),
          lit(" rank "), col("keep_rank").cast("string"),
          lit(" reward "), col("reward_micro").cast("string"),
          lit("\n"), col("text")).cast("binary")).as("render_fp"))
      .orderBy(col("lang"), col("source"), col("keep_rank"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The selection law: pass, answer-dedup, keep-rank. All-integer
    // over the shared pool; two thin exchanges, text-free.
    "q_rft_select" -> ((s, d) =>
      selectOf(Sft.samplePool(s, d, ":rft"))
        .orderBy(col("lang"), col("source"), col("samp"))),

    // The SFT-ready survivor set: top-M per task, token accounting,
    // and the exact rendered-bytes fingerprint. Kept set broadcasts;
    // text never shuffles.
    "q_rft_dataset" -> ((s, d) =>
      datasetOf(selectOf(Sft.samplePool(s, d, ":rft")),
        Tables.documents(s, d)))
  )

  /** The selection CTE chain over [[Sft.poolSql]] (mirrors
    * [[selectOf]]). Margin-stripped; concatenate, don't
    * re-interpolate.
    */
  private lazy val selectSql: String =
    s"""sel AS (
       |  SELECT lang, source, doc_id, samp, s6i,
       |    s6i >= ${Sft.PassThresholdMicro} AS passed,
       |    s6i // 100000 AS answer,
       |    CAST(row_number() OVER (PARTITION BY lang, source,
       |      s6i // 100000 ORDER BY s6i DESC, doc_id) AS BIGINT) AS arank
       |  FROM pool),
       |rk AS (
       |  SELECT lang, source, doc_id, samp, s6i AS reward_micro, answer,
       |    passed, arank, passed AND arank = 1 AS kept,
       |    CASE WHEN passed AND arank = 1 THEN
       |      CAST(row_number() OVER (PARTITION BY lang, source
       |        ORDER BY (passed AND arank = 1) DESC, s6i DESC, doc_id)
       |        AS BIGINT)
       |    ELSE 0 END AS keep_rank
       |  FROM sel)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_rft_select" ->
      (s"WITH ${Sft.poolSql(":rft")},\n$selectSql\n" +
        """SELECT lang, source, doc_id, samp, reward_micro, answer,
          |  passed, arank, kept, keep_rank
          |FROM rk ORDER BY lang, source, samp""".stripMargin),
    "q_rft_dataset" ->
      (s"WITH ${Sft.poolSql(":rft")},\n$selectSql\n" +
        s"""SELECT rk.lang, rk.source, rk.keep_rank, rk.doc_id,
           |  rk.reward_micro, rk.answer,
           |  CAST(len(string_split(doc.text, ' ')) AS BIGINT) AS n_tok,
           |  md5('<|rft|> ' || rk.lang || '/' || rk.source
           |    || ' rank ' || CAST(rk.keep_rank AS VARCHAR)
           |    || ' reward ' || CAST(rk.reward_micro AS VARCHAR)
           |    || chr(10) || doc.text) AS render_fp
           |FROM rk JOIN documents doc USING (doc_id)
           |WHERE rk.kept AND rk.keep_rank <= $RftTopM
           |ORDER BY rk.lang, rk.source, rk.keep_rank""".stripMargin)
  )
}
