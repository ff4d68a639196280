package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LENGTH-BUCKETED BATCH CONSTRUCTION — the dynamic-batching step
  * every sequence trainer runs between packing/filtering and the
  * optimizer (the bucketing idiom of fairseq/tensor2tensor: group
  * sequences of similar length so a batch pads to its BUCKET ceiling,
  * not the corpus maximum). Complements the packing family: packing
  * concatenates documents into fixed windows (q_seq_pack), bucketing
  * batches VARIABLE-length rows with bounded padding — the two
  * strategies a data pipeline must offer, and the waste accounting
  * that justifies choosing one.
  *
  *  - `q_batch_bucketize` — the batch table. bucket_len = the
  *    smallest power-of-two ceiling (16..2048, else-clamped) of the
  *    document's token count; batches fill in deterministic doc_id
  *    order within (bucket, shard) to rows_per_batch =
  *    [[BatchTokenBudget]] div bucket_len; published per batch:
  *    membership span, exact real/padded token accounting and the
  *    per-mille padding waste. ALL-INTEGER.
  *  - `q_batch_plan` — the bucket-level readout: per bucket, docs,
  *    batches, aggregate waste, and the savings against the NAIVE
  *    counterfactual (padding every row to the corpus's largest live
  *    bucket ceiling — the pad-to-max strategy bucketing replaces).
  *
  * Liveness measured at every SF: 4 buckets live; full and partial
  * batches coexist (153/13 · 150/10 · 1541/15 at sf0.001/0.01/0.1);
  * per-batch waste spans 51–485 pm.
  *
  * Scale shape at 100 TB: the batch law is (bucket, shard)-LOCAL —
  * [[BatchShards]] is the parallelism knob (set ≈ executor count on a
  * real cluster; batches never cross shards, so no global coordination
  * exists to bottleneck). One THIN exchange on (bucket_len, shard)
  * shared by the ranking window and the batch aggregate; text dies at
  * the scan projection (n_tok only). The plan readout adds one
  * 8-cell bucket aggregate and a broadcast 1-row corpus-max. Semantic
  * analog in the reference: the fixed-capacity slot law of
  * `hashtable.rs:139-141` (capacity div item-size), re-read as a
  * batch-capacity rule.
  */
object Batching {

  /** Tokens a batch may hold: rows_per_batch = max(1, budget div
    * bucket_len) — a row whose bucket exceeds the budget forms its
    * own batch, the oversize rule every bucketing batcher carries.
    * 256 is measured to keep full AND partial batches live at every
    * SF against the corpus's 10–100-token documents.
    */
  val BatchTokenBudget = 256L

  /** Batch locality: batches form within (bucket, doc_id mod shards).
    * The parallelism knob at scale — 4 keeps every (bucket, shard)
    * cell populated at the smallest test SF.
    */
  val BatchShards = 4L

  /** Power-of-two bucket ceilings. The CASE chain (not log2) keeps
    * the law total and identical in both engines; lengths past the
    * last boundary clamp into the 2048 bucket.
    */
  val BucketCeilings: Seq[Long] = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L)

  private def bucketOf(nTok: Column): Column =
    BucketCeilings.foldRight(lit(2048L): Column) { (b, acc) =>
      when(nTok <= b, lit(b)).otherwise(acc)
    }

  private[graft] val bucketCaseSql: String =
    "CASE " + BucketCeilings.map(b =>
      s"WHEN n_tok <= $b THEN $b").mkString(" ") + " ELSE 2048 END"

  /** The batch law over ANY (doc_id, text) table — exposed so the
    * spec can drive designed lengths (each boundary, the 2048 clamp,
    * the exact rows_per_batch truncation) through the production
    * path.
    */
  private[graft] def batchesOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("shard", col("doc_id") % BatchShards)
      .withColumn("bucket_len", bucketOf(col("n_tok")))
      .withColumn("batch_seq",
        expr(s"(row_number() OVER (PARTITION BY bucket_len, shard" +
          s" ORDER BY doc_id) - 1)" +
          s" div greatest(1L, $BatchTokenBudget div bucket_len)")
          .cast("long"))
      .groupBy(col("bucket_len"), col("shard"), col("batch_seq"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(col("n_tok")).as("real_tokens"))
      .withColumn("padded_tokens", col("n_rows") * col("bucket_len"))
      .withColumn("waste_pm",
        lit(1000L) - expr("real_tokens * 1000 div padded_tokens"))
      .orderBy(col("bucket_len"), col("shard"), col("batch_seq"))

  /** The bucket-level readout over a batch table — exposed for the
    * spec's designed-corpus drive.
    */
  private[graft] def planOf(batches: DataFrame): DataFrame = {
    val perBucket = batches
      .groupBy(col("bucket_len"))
      .agg(sum(col("n_rows")).as("n_docs"),
        count(lit(1)).as("n_batches"),
        sum(col("real_tokens")).as("real_tokens"),
        sum(col("padded_tokens")).as("padded_tokens"))
    val maxB = perBucket.agg(max(col("bucket_len")).as("max_bucket"))
    perBucket.crossJoin(broadcast(maxB))
      .select(col("bucket_len"), col("n_docs"), col("n_batches"),
        col("real_tokens"), col("padded_tokens"),
        (lit(1000L) - expr("real_tokens * 1000 div padded_tokens"))
          .as("waste_pm"),
        (col("n_docs") * col("max_bucket")).as("naive_padded"),
        (lit(1000L) - expr(
          "padded_tokens * 1000 div (n_docs * max_bucket)"))
          .as("savings_pm"))
      .orderBy(col("bucket_len"))
  }

  /** Epoch cap for [[epochPlanOf]]: Muennighoff et al. 2023 ("Scaling
    * Data-Constrained Language Models") measure that repeating data
    * up to ~4 epochs costs little vs fresh tokens and decays fast
    * beyond — the standard repetition budget.
    */
  val MaxEpochs = 4L

  /** Token budget multiple: the plan allocates budget = 2× the corpus
    * token mass (a data-constrained run: less unique data than the
    * compute-optimal token count). 2 is measured to keep all three
    * grant branches live at every SF (10 full / 1 partial / 9 starved
    * sources).
    */
  val EpochBudgetX = 2L

  /** QUALITY-FIRST EPOCH ALLOCATION — the data-constrained scaling
    * plan: given a token budget exceeding the unique corpus, grant
    * epochs source-by-source in QUALITY order (mean micro reward
    * rank), each source capped at [[MaxEpochs]] epochs, until the
    * budget exhausts — exact integer water-filling via one prefix
    * sum. The marginal source gets a partial grant; sources past the
    * boundary publish starved rows (the accounting a mixture review
    * starts from). Exposed over ANY (source, mean_pm, n_tok) cell
    * table for the spec's designed boundary drives.
    *
    * The rank/prefix windows span |sources| rows — metadata-sized,
    * single-partition by construction; the corpus contributes only
    * the two map-combined aggregates feeding the cells.
    */
  private[graft] def epochPlanOf(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.orderBy(col("mean_pm").desc, col("source"))
    val wCum = Window.orderBy(col("q_rank"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val total = cells.agg(sum(col("n_tok")).as("tot"))
    cells
      .withColumn("q_rank", row_number().over(wRank).cast("long"))
      .withColumn("max_grant", lit(MaxEpochs) * col("n_tok"))
      .withColumn("cum_before",
        coalesce(sum(col("max_grant")).over(wCum), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("budget", lit(EpochBudgetX) * col("tot"))
      .withColumn("granted", greatest(lit(0L),
        least(col("max_grant"), col("budget") - col("cum_before"))))
      .select(col("source"), col("q_rank"), col("mean_pm"), col("n_tok"),
        col("max_grant"), col("cum_before"), col("budget"), col("granted"),
        expr("granted * 1000 div n_tok").as("epochs_mpm"),
        (col("granted") === 0L).as("starved"))
      .orderBy(col("q_rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The batch table: power-of-two buckets, shard-local fill in
    // doc order, exact padding accounting. One thin exchange.
    "q_batch_bucketize" -> ((s, d) =>
      batchesOf(Tables.documents(s, d))),

    // The bucket readout with the pad-to-max counterfactual the
    // operator exists to beat.
    "q_batch_plan" -> ((s, d) =>
      planOf(batchesOf(Tables.documents(s, d)))),

    // The data-constrained epoch plan: two map-combined corpus
    // aggregates (quality cells + token mass) feed a metadata-sized
    // water-filling pass.
    "q_epoch_plan" -> ((s, d) => {
      val sc = Sft.microScored(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("s6i")).as("tot_s"))
        .withColumn("mean_pm", expr("tot_s * 1000 div (n * 1000000)"))
      val tk = Tables.documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .groupBy(col("source")).agg(sum(col("nt")).as("n_tok"))
      epochPlanOf(sc.join(tk, "source")
        .select(col("source"), col("mean_pm"), col("n_tok")))
    })
  )

  /** The batch CTE chain (mirrors [[batchesOf]]). Margin-stripped;
    * concatenate, don't re-interpolate.
    */
  private lazy val batchSql: String =
    s"""bd AS (
       |  SELECT doc_id, n_tok, doc_id % $BatchShards AS shard,
       |    $bucketCaseSql AS bucket_len
       |  FROM (SELECT doc_id,
       |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |        FROM documents) t),
       |br AS (
       |  SELECT *, (row_number() OVER (PARTITION BY bucket_len, shard
       |      ORDER BY doc_id) - 1)
       |    // greatest(1, $BatchTokenBudget // bucket_len) AS batch_seq
       |  FROM bd),
       |bb AS (
       |  SELECT bucket_len, shard, CAST(batch_seq AS BIGINT) AS batch_seq,
       |    count(*) AS n_rows, min(doc_id) AS first_doc,
       |    max(doc_id) AS last_doc,
       |    CAST(sum(n_tok) AS BIGINT) AS real_tokens,
       |    count(*) * bucket_len AS padded_tokens
       |  FROM br GROUP BY bucket_len, shard, batch_seq)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_batch_bucketize" ->
      (s"WITH $batchSql\n" +
        """SELECT bucket_len, shard, batch_seq, n_rows, first_doc,
          |  last_doc, real_tokens, padded_tokens,
          |  1000 - real_tokens * 1000 // padded_tokens AS waste_pm
          |FROM bb ORDER BY bucket_len, shard, batch_seq""".stripMargin),
    "q_batch_plan" ->
      (s"WITH $batchSql,\n" +
        """pb AS (
          |  SELECT bucket_len, CAST(sum(n_rows) AS BIGINT) AS n_docs,
          |    count(*) AS n_batches,
          |    CAST(sum(real_tokens) AS BIGINT) AS real_tokens,
          |    CAST(sum(padded_tokens) AS BIGINT) AS padded_tokens
          |  FROM bb GROUP BY bucket_len),
          |mx AS (SELECT max(bucket_len) AS max_bucket FROM pb)
          |SELECT bucket_len, n_docs, n_batches, real_tokens,
          |  padded_tokens,
          |  1000 - real_tokens * 1000 // padded_tokens AS waste_pm,
          |  n_docs * max_bucket AS naive_padded,
          |  1000 - padded_tokens * 1000 // (n_docs * max_bucket)
          |    AS savings_pm
          |FROM pb, mx ORDER BY bucket_len""".stripMargin),
    "q_epoch_plan" ->
      (s"WITH ${Sft.microSql},\n" +
        s"""esc AS (
           |  SELECT source,
           |    CAST(sum(s6i) AS BIGINT) * 1000
           |      // (count(*) * 1000000) AS mean_pm
           |  FROM s GROUP BY source),
           |etk AS (
           |  SELECT source,
           |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
           |  FROM documents GROUP BY source),
           |er AS (
           |  SELECT esc.source, esc.mean_pm, etk.n_tok,
           |    CAST(row_number() OVER (ORDER BY esc.mean_pm DESC,
           |      esc.source) AS BIGINT) AS q_rank
           |  FROM esc JOIN etk USING (source)),
           |ew AS (
           |  SELECT *, $MaxEpochs * n_tok AS max_grant,
           |    coalesce(sum($MaxEpochs * n_tok) OVER (ORDER BY q_rank
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS cum_before,
           |    (SELECT $EpochBudgetX * sum(n_tok) FROM etk) AS budget
           |  FROM er)
           |SELECT source, q_rank, mean_pm, n_tok, max_grant,
           |  CAST(cum_before AS BIGINT) AS cum_before,
           |  CAST(budget AS BIGINT) AS budget,
           |  CAST(greatest(0, least(max_grant, budget - cum_before))
           |    AS BIGINT) AS granted,
           |  CAST(greatest(0, least(max_grant, budget - cum_before))
           |    * 1000 // n_tok AS BIGINT) AS epochs_mpm,
           |  greatest(0, least(max_grant, budget - cum_before)) = 0
           |    AS starved
           |FROM ew ORDER BY q_rank""".stripMargin)
  )
}
