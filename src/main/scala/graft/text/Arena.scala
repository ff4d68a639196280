package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ARENA-STYLE PAIRWISE EVALUATION — the battle → leaderboard
  * aggregation (Chiang et al. 2024, Chatbot Arena; ranked by the
  * Copeland rule, the tournament method that needs no rating model):
  * competitors meet pairwise within a category, a battle's verdict is
  * decided by a deterministic judge, and the leaderboard orders
  * competitors by wins-minus-losses. The engine's role is exactly
  * this scoring pass at corpus scale — here sources compete per
  * language on corpus quality (the deterministic stand-in for model
  * responses under a judge; the plumbing — per-cell stats, pairwise
  * verdicts, rank rollup — is what carries to a real battle table).
  *
  *  - `q_arena_battles` — one row per (lang, src_a < src_b): each
  *    side's doc count and per-mille mean micro reward (EXACT integer
  *    division of the one-IEEE-quantized [[Sft.microScored]] sums —
  *    deterministic in both engines) and the verdict 'a'/'b'/'tie'.
  *    Ties are LIVE in-corpus at every SF (2/4/9 battles at
  *    sf0.001/0.01/0.1) alongside both win directions.
  *  - `q_arena_leaderboard` — per source: battles, wins, losses,
  *    ties, the Copeland score (wins − losses), exact per-mille win
  *    rate, and the total-order rank (Copeland desc, source asc).
  *
  * Scale shape at 100 TB: the per-(lang, source) stats are ONE
  * map-combined aggregate of thin (id-free) rows — text dies at the
  * quality kernel's scan projection; everything downstream operates
  * on the metadata-cardinality cell table (≤ |langs|·|sources| rows):
  * the battle self-join BROADCASTS, and the leaderboard's rank window
  * spans ≤ |sources| rows. Corpus size never reaches the pairwise
  * stage — battles are |sources|² per lang, a metadata quantity.
  */
object Arena {

  /** Per-(lang, source) cell stats over ANY micro-scored table
    * carrying (lang, source, s6i) — exposed for the spec's designed
    * drives.
    */
  private[graft] def cellsOf(scored: DataFrame): DataFrame =
    scored.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), sum(col("s6i")).as("tot"))
      .withColumn("mean_pm", expr("tot * 1000 div (n * 1000000)"))

  /** The battle table over a cell table — exposed so the spec can
    * drive a constructed exact tie and both win directions through
    * the production path.
    */
  private[graft] def battlesOf(cells: DataFrame): DataFrame = {
    val a = cells.select(col("lang"), col("source").as("src_a"),
      col("n").as("n_a"), col("mean_pm").as("mean_a_pm"))
    val b = cells.select(col("lang").as("lang_b"),
      col("source").as("src_b"), col("n").as("n_b"),
      col("mean_pm").as("mean_b_pm"))
    a.join(broadcast(b),
        col("lang") === col("lang_b") && col("src_a") < col("src_b"))
      .select(col("lang"), col("src_a"), col("src_b"),
        col("n_a"), col("mean_a_pm"), col("n_b"), col("mean_b_pm"),
        when(col("mean_a_pm") > col("mean_b_pm"), lit("a"))
          .when(col("mean_a_pm") < col("mean_b_pm"), lit("b"))
          .otherwise(lit("tie")).as("winner"))
  }

  /** The Copeland leaderboard over a battle table — exposed for the
    * spec's replay drive. Both sides unpivot, so every battle credits
    * exactly one (win, loss) pair or two ties.
    */
  private[graft] def leaderboardOf(battles: DataFrame): DataFrame = {
    def side(src: String, winSide: String, lossSide: String) =
      battles.select(col(src).as("source"),
        when(col("winner") === winSide, 1L).otherwise(0L).as("win"),
        when(col("winner") === lossSide, 1L).otherwise(0L).as("loss"),
        when(col("winner") === "tie", 1L).otherwise(0L).as("tie"))
    side("src_a", "a", "b").unionAll(side("src_b", "b", "a"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_battles"), sum(col("win")).as("wins"),
        sum(col("loss")).as("losses"), sum(col("tie")).as("ties"))
      .withColumn("copeland", col("wins") - col("losses"))
      .withColumn("win_pm", expr("wins * 1000 div n_battles"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("copeland").desc, col("source"))).cast("long"))
      .orderBy(col("rank"))
  }

  /** REWARD LENGTH-BIAS DIAGNOSTIC (Singhal et al. 2023, "A Long Way
    * to Go: Investigating Length Correlations in RLHF"): reward
    * models notoriously prefer LONGER responses; the audit is the
    * Kendall concordance between response length and reward over
    * each task's sample pool — all-integer (concordant/discordant
    * pair counts over the ≤C(16,2)=120 within-pool pairs; tau in
    * exact per-mille). This corpus's quality reward genuinely runs
    * the OTHER way (duplication grows with length under a bounded
    * vocabulary, so longer → lower reward): the measured direction is
    * 93/1 · 89/1 · 100/0 shorter-biased tasks at sf0.001/0.01/0.1 —
    * a real finding, not a dead branch; the spec drives both signs
    * and the exact-zero tie through designed pools.
    *
    * Exposed over ANY pool carrying (lang, source, samp, s6i,
    * n_tok) for the spec's designed drives.
    */
  private[graft] def lengthBiasOf(pool: DataFrame): DataFrame = {
    val a = pool.select(col("lang"), col("source"), col("samp"),
      col("s6i"), col("n_tok"))
    val b = pool.select(col("lang").as("lang_b"),
      col("source").as("source_b"), col("samp").as("samp_b"),
      col("s6i").as("s6i_b"), col("n_tok").as("n_tok_b"))
    val prod = (col("n_tok") - col("n_tok_b")) * (col("s6i") - col("s6i_b"))
    a.join(broadcast(b),
        col("lang") === col("lang_b") && col("source") === col("source_b")
          && col("samp") < col("samp_b"))
      .select(col("lang"), col("source"),
        when(prod > 0, 1L).otherwise(0L).as("conc"),
        when(prod < 0, 1L).otherwise(0L).as("disc"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("conc")).as("concordant"),
        sum(col("disc")).as("discordant"))
      .withColumn("tied",
        col("n_pairs") - col("concordant") - col("discordant"))
      .withColumn("tau_pm",
        expr("(concordant - discordant) * 1000 div n_pairs"))
      .withColumn("direction",
        when(col("concordant") > col("discordant"), lit("longer"))
          .when(col("concordant") < col("discordant"), lit("shorter"))
          .otherwise(lit("neutral")))
      .orderBy(col("lang"), col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The battle table: one map-combined cell aggregate, then a
    // broadcast self-join of the metadata-sized cell table.
    "q_arena_battles" -> ((s, d) =>
      battlesOf(cellsOf(Sft.microScored(s, d)))
        .orderBy(col("lang"), col("src_a"), col("src_b"))),

    // The Copeland leaderboard: unpivot + a |sources|-row aggregate
    // and rank window.
    "q_arena_leaderboard" -> ((s, d) =>
      leaderboardOf(battlesOf(cellsOf(Sft.microScored(s, d))))),

    // The length-bias audit over the ':lb' pool: the metadata-sized
    // pool (tasks × ≤16) broadcasts into the thin doc_stats layout
    // for lengths, then self-joins pairwise (bounded 120 pairs/task).
    // Corpus size never reaches the pairwise stage.
    "q_length_bias" -> ((s, d) =>
      lengthBiasOf(
        TextOps.docStats(s, d).select(col("doc_id"),
            col("dl").as("n_tok"))
          .join(broadcast(Sft.samplePool(s, d, ":lb")), "doc_id")))
  )

  /** The cells + battles CTE chain over [[Sft.microSql]].
    * Margin-stripped; concatenate, don't re-interpolate.
    */
  private lazy val battleSql: String =
    """ac AS (
      |  SELECT lang, source, count(*) AS n,
      |    CAST(sum(s6i) AS BIGINT) AS tot,
      |    CAST(sum(s6i) AS BIGINT) * 1000 // (count(*) * 1000000)
      |      AS mean_pm
      |  FROM s GROUP BY lang, source),
      |ab AS (
      |  SELECT a.lang, a.source AS src_a, b.source AS src_b,
      |    a.n AS n_a, a.mean_pm AS mean_a_pm,
      |    b.n AS n_b, b.mean_pm AS mean_b_pm,
      |    CASE WHEN a.mean_pm > b.mean_pm THEN 'a'
      |         WHEN a.mean_pm < b.mean_pm THEN 'b'
      |         ELSE 'tie' END AS winner
      |  FROM ac a JOIN ac b
      |    ON a.lang = b.lang AND a.source < b.source)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_arena_battles" ->
      (s"WITH ${Sft.microSql},\n$battleSql\n" +
        """SELECT lang, src_a, src_b, n_a, mean_a_pm, n_b, mean_b_pm,
          |  winner
          |FROM ab ORDER BY lang, src_a, src_b""".stripMargin),
    "q_arena_leaderboard" ->
      (s"WITH ${Sft.microSql},\n$battleSql,\n" +
        """sides AS (
          |  SELECT src_a AS source,
          |    CASE WHEN winner = 'a' THEN 1 ELSE 0 END AS win,
          |    CASE WHEN winner = 'b' THEN 1 ELSE 0 END AS loss,
          |    CASE WHEN winner = 'tie' THEN 1 ELSE 0 END AS tie
          |  FROM ab
          |  UNION ALL
          |  SELECT src_b,
          |    CASE WHEN winner = 'b' THEN 1 ELSE 0 END,
          |    CASE WHEN winner = 'a' THEN 1 ELSE 0 END,
          |    CASE WHEN winner = 'tie' THEN 1 ELSE 0 END
          |  FROM ab),
          |lb AS (
          |  SELECT source, count(*) AS n_battles,
          |    CAST(sum(win) AS BIGINT) AS wins,
          |    CAST(sum(loss) AS BIGINT) AS losses,
          |    CAST(sum(tie) AS BIGINT) AS ties
          |  FROM sides GROUP BY source)
          |SELECT source, n_battles, wins, losses, ties,
          |  wins - losses AS copeland,
          |  wins * 1000 // n_battles AS win_pm,
          |  CAST(row_number() OVER
          |    (ORDER BY wins - losses DESC, source) AS BIGINT) AS rank
          |FROM lb ORDER BY rank""".stripMargin),
    "q_length_bias" ->
      (s"WITH ${Sft.poolSql(":lb")},\n" +
        """lbp AS (
          |  SELECT p.lang, p.source, p.samp, p.s6i,
          |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
          |  FROM pool p JOIN documents d USING (doc_id)),
          |lpr AS (
          |  SELECT a.lang, a.source,
          |    CASE WHEN (a.n_tok - b.n_tok) * (a.s6i - b.s6i) > 0
          |      THEN 1 ELSE 0 END AS conc,
          |    CASE WHEN (a.n_tok - b.n_tok) * (a.s6i - b.s6i) < 0
          |      THEN 1 ELSE 0 END AS disc
          |  FROM lbp a JOIN lbp b
          |    ON a.lang = b.lang AND a.source = b.source
          |    AND a.samp < b.samp),
          |lt AS (
          |  SELECT lang, source, count(*) AS n_pairs,
          |    CAST(sum(conc) AS BIGINT) AS concordant,
          |    CAST(sum(disc) AS BIGINT) AS discordant
          |  FROM lpr GROUP BY lang, source)
          |SELECT lang, source, n_pairs, concordant, discordant,
          |  n_pairs - concordant - discordant AS tied,
          |  (concordant - discordant) * 1000 // n_pairs AS tau_pm,
          |  CASE WHEN concordant > discordant THEN 'longer'
          |       WHEN concordant < discordant THEN 'shorter'
          |       ELSE 'neutral' END AS direction
          |FROM lt ORDER BY lang, source""".stripMargin)
  )
}
