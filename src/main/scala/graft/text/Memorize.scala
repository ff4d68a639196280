package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Memorization CANARIES — the plant-and-measure side of training-data
  * privacy (the detection side is the min-k% family in
  * [[TextOps.minkPerDoc]]): Carlini et al. 2019, "The Secret Sharer:
  * Evaluating and Testing Unintended Memorization in Neural Networks".
  * The protocol: insert a secret drawn from a known candidate space R
  * into the training corpus a controlled number of times, then measure
  * EXPOSURE = log2|R| − log2(rank of the true secret among R by model
  * likelihood). High exposure ⇒ the secret is extractable.
  *
  * This engine's likelihood proxy is the corpus unigram LM (the
  * q_lm_unigram_score / q_mink_prob precedent), under which the
  * likelihood ORDER of the 16 candidates is exactly their corpus
  * occurrence-count order — so the whole pipeline is exact integer
  * arithmetic end to end:
  *
  *  - `q_canary_plant` — the controlled injection. Candidate space =
  *    the first [[CanaryPoolK]] vocabulary tokens in byte order
  *    (deterministic at any corpus size, plant-independent by
  *    construction since the pool is read from the UNPLANTED text).
  *    Canary i ∈ 1..15 is appended (` canarymark <secret_i>`) to the
  *    docs whose slot = doc_id mod [[CanarySlots]] falls in the i-th
  *    triangular interval [i(i−1)/2, i(i+1)/2) — so canary i lands in
  *    ≈ i·n/256 documents: plant counts are PROPORTIONAL to corpus
  *    size with zero coordination (no global row_number — pure
  *    per-row arithmetic), and candidate 0 is the never-planted
  *    control.
  *  - `q_canary_exposure` — the measurement, reading only the PLANTED
  *    corpus the way a real auditor would: one explode pass counts
  *    each candidate's total occurrences; n_planted comes from the
  *    slot law; natural_cnt = total − planted (exact by construction);
  *    xrank ranks the 16 candidates by (total_cnt desc, token) and
  *    exposure_mb publishes 1000·log2(16/xrank) milli-bits from a
  *    LITERAL table (the γ-powers precedent: both engines emit the
  *    same 16 integer constants, so no float ever computes), plus the
  *    honest readout `lifted` = did planting move the candidate above
  *    its natural-frequency rank. The metric faithfully inherits the
  *    paper's caveat that a naturally-frequent candidate ranks high
  *    without planting — which is exactly what natural_rank/lifted
  *    make visible.
  *
  * Scale shape at 100 TB: the plant is a PROJECTION (per-row slot
  * arithmetic + a 16-row broadcast join for the secret) — text never
  * shuffles; the exposure pass is one explode filtered by the
  * broadcast 16-token pool (the semi-filter kills every non-candidate
  * occurrence at the scan), one map-combined 16-group aggregate, and
  * windows over exactly 16 rows. The pool build is a vocabulary-sized
  * map-side-combined distinct + TakeOrdered(16) — the BPE vocab-build
  * shape. Semantic analog in the reference: the seeded-probe
  * discipline of `hashtable.rs:65-80` (a known needle, a measured
  * lookup), re-read as a privacy audit.
  */
object Memorize {

  /** |R|: the candidate-space size. 16 keeps the exposure range at
    * log2 16 = 4 bits and the rank windows constant-sized.
    */
  val CanaryPoolK = 16

  /** Slot modulus for the plant law. 256 ≫ T(15) = 120, so slots
    * 120..255 stay unplanted and every canary's plant share is fixed
    * (canary i owns i of 256 slots).
    */
  val CanarySlots = 256L

  /** Triangular thresholds T(i) = i(i+1)/2, i = 0..15: canary i owns
    * slots [T(i−1), T(i)).
    */
  private val Tri: IndexedSeq[Long] =
    (0 to CanaryPoolK - 1).map(i => i.toLong * (i + 1) / 2)

  /** The slot→canary CASE, interpolated into BOTH engine spellings
    * (single-homed plant law). `ELSE 0` = unplanted.
    */
  private[graft] val slotCaseSql: String =
    "CAST(CASE " +
      (1 until CanaryPoolK).map(i =>
        s"WHEN doc_id % $CanarySlots < ${Tri(i)} THEN $i").mkString(" ") +
      " ELSE 0 END AS BIGINT)"

  /** exposure_mb(rank) = round(1000·log2(16/rank)) as exact literals —
    * the only place log2 appears is this comment. MemorizeSpec replays
    * the formula and pins every entry.
    */
  private[graft] val ExposureMb: IndexedSeq[Long] = IndexedSeq(
    4000L, 3000L, 2415L, 2000L, 1678L, 1415L, 1193L, 1000L,
    830L, 678L, 541L, 415L, 300L, 193L, 93L, 0L)

  private[graft] val exposureCaseSql: String =
    "CAST(CASE xrank " +
      ExposureMb.zipWithIndex.map { case (mb, r) =>
        s"WHEN ${r + 1} THEN $mb" }.mkString(" ") +
      " ELSE -1 END AS BIGINT)"

  /** The candidate pool: first K vocabulary tokens in byte order, with
    * 0-based candidate index. Deterministic and plant-independent
    * (reads the original text). Vocab-sized distinct + TakeOrdered(K);
    * the K-row rank window is constant-sized by construction.
    */
  private[graft] def poolOf(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("secret"))
      .distinct()
      .orderBy(col("secret")).limit(CanaryPoolK)
      .withColumn("cidx",
        (row_number().over(Window.orderBy(col("secret"))) - 1).cast("long"))

  /** The shared plant law over ANY (doc_id, text) table — exposed so
    * the spec can drive a designed corpus through the exact production
    * path. Output: (doc_id, canary_idx, secret, planted); canary_idx 0
    * rows are unchanged text with secret ''.
    */
  private[graft] def plantedOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("canary_idx", expr(slotCaseSql))
      // LEFT join keeps the law total on ANY corpus: with a
      // vocabulary smaller than the pool (cidx range < 16), slots
      // mapping past it stay unplanted instead of silently dropping
      // their documents from the output
      .join(broadcast(poolOf(docs)), col("canary_idx") === col("cidx"),
        "left")
      .select(col("doc_id"), col("canary_idx"),
        when(col("canary_idx") === 0L || col("secret").isNull, lit(""))
          .otherwise(col("secret")).as("secret"),
        when(col("canary_idx") === 0L || col("secret").isNull, col("text"))
          .otherwise(concat(col("text"), lit(" canarymark "), col("secret")))
          .as("planted"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The controlled injection (Secret Sharer step 1). Pure per-row
    // slot arithmetic + one 16-row broadcast join: text reaches the
    // sink without ever entering an exchange.
    "q_canary_plant" -> ((s, d) =>
      plantedOf(Tables.documents(s, d)).orderBy(col("doc_id"))),

    // The exposure measurement (Secret Sharer step 2), reading the
    // planted corpus only. All-integer: counts, the subtraction
    // identity, two 16-row rank windows, and the literal milli-bit
    // table. Liveness measured at every SF: some candidates lift,
    // the control (and saturated-frequency candidates) don't.
    "q_canary_exposure" -> ((s, d) =>
      exposureOf(Tables.documents(s, d)))
  )

  /** The exposure measurement over ANY (doc_id, text) table — exposed
    * so the spec can drive a designed corpus (a rare candidate planted
    * past a frequent one) through the exact production path.
    */
  private[graft] def exposureOf(docs: DataFrame): DataFrame = {
    val pool = poolOf(docs)
    val planted = plantedOf(docs)
    val totals = planted
      .select(col("canary_idx"),
        explode(split(col("planted"), " ")).as("tok"))
      .join(broadcast(pool), col("tok") === col("secret"))
      .groupBy(col("cidx"), col("secret"))
      .agg(count(lit(1)).as("total_cnt"))
    val plants = planted.filter(col("canary_idx") > 0L)
      .groupBy(col("canary_idx")).agg(count(lit(1)).as("n_planted"))
    totals
      .join(broadcast(plants),
        totals("cidx") === plants("canary_idx"), "left")
      .select(col("cidx"), col("secret"), col("total_cnt"),
        coalesce(col("n_planted"), lit(0L)).as("n_planted"))
      .withColumn("natural_cnt", col("total_cnt") - col("n_planted"))
      .withColumn("natural_rank", row_number().over(
        Window.orderBy(col("natural_cnt").desc, col("secret")))
        .cast("long"))
      .withColumn("xrank", row_number().over(
        Window.orderBy(col("total_cnt").desc, col("secret")))
        .cast("long"))
      .select(col("cidx").as("canary_idx"), col("secret"),
        col("n_planted"), col("natural_cnt"), col("total_cnt"),
        col("natural_rank"), col("xrank"),
        (col("xrank") < col("natural_rank")).as("lifted"),
        expr(exposureCaseSql).as("exposure_mb"))
      .orderBy(col("canary_idx"))
  }

  /** The pool + plant CTE chain shared by both oracles (margin-
    * stripped; concatenate, don't re-interpolate).
    */
  private lazy val plantSql: String =
    s"""ctoks AS (
       |  SELECT DISTINCT tok AS secret
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
       |        FROM documents) u),
       |pool AS (
       |  SELECT secret,
       |    CAST(row_number() OVER (ORDER BY secret) - 1 AS BIGINT) AS cidx
       |  FROM (SELECT secret FROM ctoks ORDER BY secret
       |        LIMIT $CanaryPoolK) p),
       |pd AS (
       |  SELECT doc_id, text, $slotCaseSql AS canary_idx
       |  FROM documents),
       |pl AS (
       |  SELECT pd.doc_id, pd.canary_idx,
       |    CASE WHEN pd.canary_idx = 0 THEN '' ELSE pool.secret END
       |      AS secret,
       |    CASE WHEN pd.canary_idx = 0 THEN pd.text
       |         ELSE pd.text || ' canarymark ' || pool.secret END
       |      AS planted
       |  FROM pd JOIN pool ON pd.canary_idx = pool.cidx)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_canary_plant" ->
      (s"WITH $plantSql\n" +
        """SELECT doc_id, canary_idx, secret, planted
          |FROM pl ORDER BY doc_id""".stripMargin),
    "q_canary_exposure" ->
      (s"WITH $plantSql,\n" +
        s"""tot AS (
           |  SELECT p.cidx, p.secret, count(*) AS total_cnt
           |  FROM (SELECT unnest(string_split(planted, ' ')) AS tok
           |        FROM pl) t
           |  JOIN pool p ON t.tok = p.secret
           |  GROUP BY 1, 2),
           |np AS (
           |  SELECT canary_idx, count(*) AS n_planted
           |  FROM pd WHERE canary_idx > 0 GROUP BY 1),
           |f AS (
           |  SELECT t.cidx, t.secret, t.total_cnt,
           |    coalesce(np.n_planted, 0) AS n_planted,
           |    t.total_cnt - coalesce(np.n_planted, 0) AS natural_cnt
           |  FROM tot t LEFT JOIN np ON t.cidx = np.canary_idx),
           |r AS (
           |  SELECT cidx, secret, n_planted, natural_cnt, total_cnt,
           |    CAST(row_number() OVER
           |      (ORDER BY natural_cnt DESC, secret) AS BIGINT)
           |      AS natural_rank,
           |    CAST(row_number() OVER
           |      (ORDER BY total_cnt DESC, secret) AS BIGINT) AS xrank
           |  FROM f)
           |SELECT cidx AS canary_idx, secret, n_planted, natural_cnt,
           |  total_cnt, natural_rank, xrank,
           |  xrank < natural_rank AS lifted,
           |  $exposureCaseSql AS exposure_mb
           |FROM r ORDER BY canary_idx""".stripMargin)
  )
}
