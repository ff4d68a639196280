package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-quality operators beyond the per-doc statistics family:
  * rule-based filtering (the Gopher/MassiveText checklist) and
  * domain-importance weighting (the DSIR shape). Both are pure
  * per-row or thin-aggregate work — the quality layer of a training
  * pipeline must not cost a corpus shuffle, and neither of these does.
  *
  * All published numbers are INTEGER (per-mille / ppm / centi-units):
  * the two engines then share exact arithmetic end-to-end with no
  * FP-order or libm exposure — the discipline q_token_budget and
  * q_doc_diversity established.
  */
object Quality {

  /** The Gopher rule thresholds, adapted to this corpus's scale: the
    * MassiveText filters bound word count 50..100k and mean word
    * length 3..10 chars for web pages; this synthetic corpus runs
    * 12..110 words/doc, so the word-count gate is 30..90 (same rule,
    * corpus-appropriate constants — the constants are the tunable,
    * the rule shapes are the operator). Symbol/bullet/ellipsis ratios
    * and the stopword floor carry Gopher's published limits.
    */
  val GopherMinWords = 30L
  val GopherMaxWords = 90L
  val GopherMinWlenCpm = 300L  // mean word length ≥ 3.00 chars
  val GopherMaxWlenCpm = 1000L // ≤ 10.00 chars
  val GopherMaxSymPm = 100L    // hash/ellipsis symbols ≤ 0.1 per word
  val GopherMaxBulletPm = 900L // ≤ 90% of lines bullet-led
  val GopherMaxEllipsisPm = 300L // ≤ 30% of lines ellipsis-ended
  val GopherMinStop = 1L       // ≥ 1 stopword hit (corpus-adapted: ≥2
                               //  for web text with a full stop list)

  /** Stopword list literal shared with the TextStats kernel (and the
    * language-ID heuristic) — one corpus-wide vocabulary of function
    * words, quoted for SQL interpolation into BOTH engines.
    */
  private val stopList: String =
    graft.functions.GraftText.Stopwords.map(w => s"'$w'").mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher/MassiveText rule-based quality filter: word-count gate,
    // mean-word-length gate, symbol-to-word ratio, bullet-led and
    // ellipsis-ended line ratios, stopword floor — the standard
    // pre-model cleaning pass (Rae et al. 2021, §A1.1). Every feature
    // derives in ONE codegen'd projection per row (split + higher-
    // order filter/aggregate over the token array — no explode, no
    // shuffle, the q_text_quality discipline), and every ratio is
    // integer centi/per-mille, so both engines compute identical
    // values with no FP anywhere. The only post-scan work is the
    // publish sort.
    "q_quality_gopher" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .withColumn("lines", split(col("text"), "\n"))
        .withColumn("n_words", size(col("words")).cast("long"))
        .withColumn("n_lines", size(col("lines")).cast("long"))
        .withColumn("wchars",
          expr("aggregate(words, 0L, (a, w) -> a + length(w))"))
        .withColumn("n_stop",
          expr(s"CAST(size(filter(words, w -> w IN ($stopList))) AS LONG)"))
        .withColumn("n_sym", expr(
          """CAST(length(text) - length(replace(text, '#', ''))
            |  + size(filter(words, w -> w LIKE '%...%')) AS LONG)"""
            .stripMargin.replace("\n", " ")))
        .withColumn("n_bullet", expr(
          "CAST(size(filter(lines, l -> l LIKE '- %' OR l LIKE '* %')) AS LONG)"))
        .withColumn("n_ell", expr(
          "CAST(size(filter(lines, l -> l LIKE '%...')) AS LONG)"))
        .select(col("doc_id"), col("lang"), col("n_words"),
          expr("wchars * 100 div n_words").as("mean_wlen_cpm"),
          col("n_stop"),
          expr("n_sym * 1000 div n_words").as("sym_pm"),
          expr("n_bullet * 1000 div n_lines").as("bullet_pm"),
          expr("n_ell * 1000 div n_lines").as("ellipsis_pm"))
        .withColumn("keep",
          col("n_words").between(GopherMinWords, GopherMaxWords) &&
            col("mean_wlen_cpm").between(GopherMinWlenCpm, GopherMaxWlenCpm) &&
            col("n_stop") >= GopherMinStop &&
            col("sym_pm") <= GopherMaxSymPm &&
            col("bullet_pm") <= GopherMaxBulletPm &&
            col("ellipsis_pm") <= GopherMaxEllipsisPm)
        .orderBy(col("doc_id"))),

    // DSIR-shaped domain-importance weights (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling"): score
    // each document by how much more its unigrams look like the
    // TARGET domain (here: the English slice) than the raw corpus.
    // DSIR's log-likelihood ratio is replaced by the LINEAR ppm
    // difference Σ cnt(w)·(p_target(w) − p_raw(w)) — the library
    // no-libm rule (the q_bm25 precedent): same ordering signal for
    // resampling, exact integer arithmetic in both engines.
    //
    // Shape: ONE exploded-token aggregate builds the vocabulary with
    // per-domain counts (map-combined, token-keyed — the corpus's one
    // thin shuffle); the ppm-weight table is vocabulary-bounded and
    // BROADCASTS back into the per-doc token counts, whose weighted
    // sum is a thin doc_id aggregate. Nothing after the token agg
    // scales with corpus size; at 100 TB the vocab table is the same
    // written artifact the coverage/topk operators share.
    "q_dsir_weights" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("token"))
      // localCheckpoint: the vocabulary is bounded, and both the
      // totals row and the weight table derive from it — without the
      // checkpoint Catalyst would re-run the corpus-wide token
      // aggregate once per consumer (2× the pipeline's only big scan)
      val vocab = tok.groupBy(col("token"))
        .agg(count(lit(1)).as("r_cnt"),
          count(when(col("lang") === "en", 1)).as("t_cnt"))
        .localCheckpoint()
      val tot = vocab.agg(sum(col("r_cnt")).as("r_tot"),
        sum(col("t_cnt")).as("t_tot"))
      val w = vocab.crossJoin(broadcast(tot))
        .select(col("token"),
          (expr("t_cnt * 1000000 div t_tot") -
            expr("r_cnt * 1000000 div r_tot")).as("w_ppm"))
      val docTok = tok.groupBy(col("doc_id"), col("lang"), col("token"))
        .agg(count(lit(1)).as("cnt"))
      docTok.join(broadcast(w), "token")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("cnt")).as("n_tokens"),
          sum(col("cnt") * col("w_ppm")).as("score"))
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_quality_gopher" ->
      s"""WITH f AS (
         |  SELECT doc_id, lang,
         |    string_split(text, ' ') AS words,
         |    string_split(text, chr(10)) AS lines,
         |    length(text) - length(replace(text, '#', '')) AS n_hash
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, lang,
         |    CAST(len(words) AS BIGINT) AS n_words,
         |    CAST(len(lines) AS BIGINT) AS n_lines,
         |    CAST(list_sum(list_transform(words, w -> length(w)))
         |      AS BIGINT) AS wchars,
         |    CAST(len(list_filter(words, w -> w IN ($stopList)))
         |      AS BIGINT) AS n_stop,
         |    CAST(n_hash + len(list_filter(words, w -> w LIKE '%...%'))
         |      AS BIGINT) AS n_sym,
         |    CAST(len(list_filter(lines,
         |      l -> l LIKE '- %' OR l LIKE '* %')) AS BIGINT) AS n_bullet,
         |    CAST(len(list_filter(lines, l -> l LIKE '%...'))
         |      AS BIGINT) AS n_ell
         |  FROM f),
         |r AS (
         |  SELECT doc_id, lang, n_words,
         |    wchars * 100 // n_words AS mean_wlen_cpm, n_stop,
         |    n_sym * 1000 // n_words AS sym_pm,
         |    n_bullet * 1000 // n_lines AS bullet_pm,
         |    n_ell * 1000 // n_lines AS ellipsis_pm
         |  FROM m)
         |SELECT doc_id, lang, n_words, mean_wlen_cpm, n_stop, sym_pm,
         |  bullet_pm, ellipsis_pm,
         |  (n_words BETWEEN $GopherMinWords AND $GopherMaxWords
         |    AND mean_wlen_cpm BETWEEN $GopherMinWlenCpm AND $GopherMaxWlenCpm
         |    AND n_stop >= $GopherMinStop
         |    AND sym_pm <= $GopherMaxSymPm
         |    AND bullet_pm <= $GopherMaxBulletPm
         |    AND ellipsis_pm <= $GopherMaxEllipsisPm) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |vocab AS (
        |  SELECT token, count(*) AS r_cnt,
        |    count(CASE WHEN lang = 'en' THEN 1 END) AS t_cnt
        |  FROM tok GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(r_cnt) AS BIGINT) AS r_tot,
        |    CAST(sum(t_cnt) AS BIGINT) AS t_tot FROM vocab),
        |w AS (
        |  SELECT token,
        |    t_cnt * 1000000 // t_tot - r_cnt * 1000000 // r_tot AS w_ppm
        |  FROM vocab, tot),
        |dt AS (
        |  SELECT doc_id, lang, token, count(*) AS cnt
        |  FROM tok GROUP BY 1, 2, 3)
        |SELECT dt.doc_id, dt.lang,
        |  CAST(sum(dt.cnt) AS BIGINT) AS n_tokens,
        |  CAST(sum(dt.cnt * w.w_ppm) AS BIGINT) AS score
        |FROM dt JOIN w USING (token)
        |GROUP BY 1, 2 ORDER BY dt.doc_id""".stripMargin
  )
}
