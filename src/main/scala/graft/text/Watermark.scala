package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SYNTHETIC-TEXT WATERMARK DETECTION — the green-list scheme of
  * Kirchenbauer et al. 2023 ("A Watermark for Large Language
  * Models"), run from the DETECTOR side as a training-data hygiene
  * pass: a watermarking generator seeds a pseudo-random "green" half
  * of the vocabulary from each previous token and boosts green
  * logits, so watermarked text shows a green-bigram fraction far
  * above the γ = 1/2 chance rate; a data pipeline runs this detector
  * to keep model-generated text OUT of pretraining corpora (the
  * synthetic-contamination filter every post-ChatGPT crawl needs).
  * At γ = 1/2 the paper's z-test is EXACT INTEGER arithmetic:
  *   z = (n_green − n/2)/sqrt(n/4) = (2·n_green − n)/sqrt(n),
  * so z > 2 ⟺ excess > 0 AND excess² > 4n with excess = 2·n_green −
  * n — no float anywhere.
  *
  *  - `q_watermark_detect` — per document: bigram count, green
  *    count (green(prev, tok) = salted-md5 parity, the paper's
  *    hash-seeded green list at γ = 1/2), exact per-mille green
  *    rate, the excess statistic, and the z > 2 flag. Flags are LIVE
  *    both ways at every SF on the natural corpus (1/6/79 of
  *    500/500/5000 docs — the detector's expected ≈2.3% false-positive
  *    rate at z > 2).
  *  - `q_watermark_audit` — the per-source release readout: doc-level
  *    flag counts/rates plus the POOLED source-level test (the
  *    dataset-inference analog — pooling makes the test decisive on
  *    a contaminated source). On the natural corpus NO source flags
  *    at any SF — the null result is the correct reading and is
  *    spec-asserted; the spec PLANTS a green-chain source through the
  *    exposed law and shows pooling flags it decisively.
  *
  * Scale shape at 100 TB: detection is a PROJECTION — the bigram
  * zip, hash and count run inside one codegen'd expression over the
  * token array; text dies at the scan and per-doc rows are thin. The
  * audit adds ONE map-combined source-key aggregate. Zero joins,
  * zero windows, zero text exchanges at any corpus size.
  */
object Watermark {

  /** The green-list salt — the detector key shared with the
    * (hypothetical) generator. Interpolated into both engine
    * spellings.
    */
  val WmSalt = ":wm"

  /** The green-bigram counting law over a token-array column `l` —
    * the one place the hash parity is spelled (Spark side).
    */
  private[graft] val greenCountSql: String =
    s"""size(filter(zip_with(slice(l, 1, size(l) - 1),
       |  slice(l, 2, size(l) - 1),
       |  (a, b) -> cast(conv(substring(md5(cast(concat(a, ' ', b,
       |    '$WmSalt') as binary)), 1, 8), 16, 10) as bigint) % 2),
       |  x -> x = 0))""".stripMargin

  /** The detection law over ANY (doc_id, text) table (extra columns
    * ride along) — exposed so the spec can plant a green-chain
    * source and drive it through the exact production path.
    */
  private[graft] def detectOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("l", split(col("text"), " "))
      .withColumn("n_bigrams", (size(col("l")) - 1).cast("long"))
      .withColumn("n_green", expr(greenCountSql).cast("long"))
      .withColumn("green_pm",
        when(col("n_bigrams") > 0,
          expr("n_green * 1000 div n_bigrams")).otherwise(0L))
      .withColumn("excess", lit(2L) * col("n_green") - col("n_bigrams"))
      .withColumn("watermarked",
        col("excess") > 0 &&
          col("excess") * col("excess") > lit(4L) * col("n_bigrams"))
      .drop("l", "text")

  /** The per-source audit over a detection table — exposed for the
    * spec's planted-source drive.
    */
  private[graft] def auditOf(det: DataFrame): DataFrame =
    det.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("watermarked"), 1L).otherwise(0L)).as("n_flagged"),
        sum(col("n_green")).as("pooled_green"),
        sum(col("n_bigrams")).as("pooled_bigrams"))
      .withColumn("flagged_pm", expr("n_flagged * 1000 div n_docs"))
      .withColumn("pooled_excess",
        lit(2L) * col("pooled_green") - col("pooled_bigrams"))
      // the square is widened to DECIMAL(38,0): pooled_excess is
      // O(pooled_bigrams), so a source past ~3.1e9 bigrams — routine
      // at the 100 TB target — would overflow a 64-bit square and
      // silently flip the verdict in Spark (DuckDB would error)
      .withColumn("source_flagged",
        col("pooled_excess") > 0 &&
          col("pooled_excess").cast("decimal(38,0)") * col("pooled_excess") >
            lit(4L) * col("pooled_bigrams"))
      .orderBy(col("source"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-doc detection: one codegen'd array kernel, zero joins,
    // zero windows — text dies at the scan.
    "q_watermark_detect" -> ((s, d) =>
      detectOf(Tables.documents(s, d).select(col("doc_id"), col("text")))
        .orderBy(col("doc_id"))),

    // The per-source contamination readout with the pooled test.
    "q_watermark_audit" -> ((s, d) =>
      auditOf(detectOf(Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text")))))
  )

  /** The detection CTE chain (mirrors [[detectOf]]; the bigram
    * unnest replaces the array kernel — same values, DuckDB's
    * idiom). Margin-stripped; concatenate, don't re-interpolate.
    */
  private lazy val detectSql: String =
    s"""wl AS (SELECT doc_id, source, string_split(text, ' ') AS l
       |       FROM documents),
       |wb AS (
       |  SELECT doc_id, source, l[i] AS prev, l[i + 1] AS tok
       |  FROM (SELECT doc_id, source, l,
       |          unnest(generate_series(1, len(l) - 1)) AS i
       |        FROM wl) t),
       |wg AS (
       |  SELECT w.doc_id, w.source,
       |    CAST(coalesce(g.n_big, 0) AS BIGINT) AS n_bigrams,
       |    CAST(coalesce(g.n_green, 0) AS BIGINT) AS n_green
       |  FROM (SELECT doc_id, source FROM wl) w
       |  LEFT JOIN (
       |    SELECT doc_id, count(*) AS n_big,
       |      sum(CASE WHEN ('0x' || substr(md5(prev || ' ' || tok
       |        || '$WmSalt'), 1, 8))::BIGINT % 2 = 0
       |        THEN 1 ELSE 0 END) AS n_green
       |    FROM wb GROUP BY doc_id) g USING (doc_id)),
       |wd AS (
       |  SELECT doc_id, source, n_bigrams, n_green,
       |    CASE WHEN n_bigrams > 0 THEN n_green * 1000 // n_bigrams
       |         ELSE 0 END AS green_pm,
       |    2 * n_green - n_bigrams AS excess,
       |    (2 * n_green - n_bigrams) > 0 AND
       |      (2 * n_green - n_bigrams) * (2 * n_green - n_bigrams)
       |        > 4 * n_bigrams AS watermarked
       |  FROM wg)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_watermark_detect" ->
      (s"WITH $detectSql\n" +
        """SELECT doc_id, n_bigrams, n_green, green_pm, excess,
          |  watermarked
          |FROM wd ORDER BY doc_id""".stripMargin),
    "q_watermark_audit" ->
      (s"WITH $detectSql\n" +
        """SELECT source, count(*) AS n_docs,
          |  CAST(sum(CASE WHEN watermarked THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_flagged,
          |  CAST(sum(n_green) AS BIGINT) AS pooled_green,
          |  CAST(sum(n_bigrams) AS BIGINT) AS pooled_bigrams,
          |  CAST(sum(CASE WHEN watermarked THEN 1 ELSE 0 END) AS BIGINT)
          |    * 1000 // count(*) AS flagged_pm,
          |  2 * CAST(sum(n_green) AS BIGINT)
          |    - CAST(sum(n_bigrams) AS BIGINT) AS pooled_excess,
          |  (2 * CAST(sum(n_green) AS BIGINT)
          |    - CAST(sum(n_bigrams) AS BIGINT)) > 0 AND
          |    CAST(2 * CAST(sum(n_green) AS BIGINT)
          |      - CAST(sum(n_bigrams) AS BIGINT) AS HUGEINT)
          |    * (2 * CAST(sum(n_green) AS BIGINT)
          |      - CAST(sum(n_bigrams) AS BIGINT))
          |    > 4 * CAST(sum(n_bigrams) AS BIGINT) AS source_flagged
          |FROM wd GROUP BY source ORDER BY source""".stripMargin)
  )
}
