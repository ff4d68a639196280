package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERIFIABLE instruction-following evaluation — the IFEval protocol
  * (Zhou et al. 2023, "Instruction-Following Evaluation for Large
  * Language Models"): score responses against instructions whose
  * compliance is CHECKABLE BY PROGRAM (word counts, keyword
  * frequency, forbidden words, end-phrase, …) so the eval needs no
  * judge model. The engine's role in the pipeline is exactly this
  * scoring pass at corpus scale: assign each response its verifiable
  * constraint, evaluate strict and loose compliance, and aggregate
  * per source. Documents stand in for responses (the plumbing —
  * schema, dispatch, aggregation — is what carries to a real response
  * table; q_pii_scrub's synthetic-adornment precedent).
  *
  *  - `q_ifeval_check`: per response, the assigned constraint
  *    (kind = doc_id mod 6 — six live IFEval families, thresholds
  *    MEASURED to split the corpus both ways at every SF) and two
  *    verdicts: STRICT (the response as-is) and LOOSE (the paper's
  *    relaxation: also accept the response with its leading token
  *    stripped — the "remove the first line" transform — OR'd with
  *    strict, so loose ≥ strict by construction).
  *  - `q_ifeval_report`: the release readout — per (source, kind):
  *    counts, strict/loose passes, and exact per-mille rates
  *    (BIGINT div, the all-integer house rule).
  *
  * Every check is exact integer/array arithmetic on the token list
  * (split once, checks share the array): no regex, no floats, no
  * locale surface — both engines agree token-for-token (the
  * cross-engine parity row covers the split law itself).
  *
  * Scale shape at 100 TB: the check is a PROJECTION — one row in, one
  * row out, text dies at the split, `source` rides along so the
  * report never joins; the report adds ONE map-combined
  * (source × 6)-cell aggregate of thin boolean rows. Zero joins, zero
  * windows, zero text exchanges at any corpus size.
  */
object Ifeval {

  /** The six constraint kinds' thresholds — they live here only,
    * interpolated into BOTH engine spellings. Measured pass counts at
    * sf0.01 (n≈83/kind): 44/25/19/1/46/56 — every kind live both ways
    * at every SF.
    */
  val MinWords = 55
  val Keyword = "join"
  val KeywordMin = 3
  val Forbidden = "slow"
  val EndWord = "query"
  val MinDistinct = 25
  val RepeatCap = 40

  private[graft] val Kinds: IndexedSeq[(Int, String)] = IndexedSeq(
    0 -> s"answer with at least $MinWords words",
    1 -> s"mention the word $Keyword at least $KeywordMin times",
    2 -> s"do not use the word $Forbidden",
    3 -> s"end your answer with the word $EndWord",
    4 -> s"use at least $MinDistinct distinct words",
    5 -> s"repeat at most $RepeatCap words in total")

  /** The strict verdict for one token-list under one kind. CASE
    * branches evaluate lazily, so the end-phrase probe is safe on an
    * empty list (the loose tail of a one-token response).
    */
  private def strictOf(l: Column, kind: Column): Column =
    when(kind === 0L, size(l) >= MinWords)
      .when(kind === 1L,
        size(filter(l, t => t === lit(Keyword))) >= KeywordMin)
      .when(kind === 2L, !array_contains(l, Forbidden))
      .when(kind === 3L, when(size(l) === 0, lit(false))
        .otherwise(element_at(l, -1) === EndWord))
      .when(kind === 4L, size(array_distinct(l)) >= MinDistinct)
      .otherwise(size(l) - size(array_distinct(l)) <= RepeatCap)

  private def instructionOf(kind: Column): Column =
    Kinds.foldLeft(lit(null).cast("string")) { case (acc, (k, txt)) =>
      when(kind === k.toLong, lit(txt)).otherwise(acc)
    }

  /** The shared check law over ANY response table carrying
    * (doc_id, text) — exposed so the spec can drive designed
    * responses (the loose-flips-strict cases) through the exact
    * production path. Non-text input columns (e.g. `source`) ride
    * along; text dies here.
    */
  private[graft] def checksOf(docs: DataFrame): DataFrame = {
    val l = split(col("text"), " ")
    val tail = slice(l, lit(2), greatest(size(l) - 1, lit(0)))
    docs
      .withColumn("kind", (col("doc_id") % 6L).cast("long"))
      .withColumn("instruction", instructionOf(col("kind")))
      .withColumn("followed_strict", strictOf(l, col("kind")))
      .withColumn("followed_loose",
        strictOf(l, col("kind")) || strictOf(tail, col("kind")))
      .drop("text")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-response verdicts. Pure projection: text dies at the split.
    "q_ifeval_check" -> ((s, d) =>
      checksOf(Tables.documents(s, d).select(col("doc_id"), col("text")))
        .orderBy(col("doc_id"))),

    // The per-(source, kind) release readout: one bounded aggregate
    // of thin boolean rows; exact per-mille rates.
    "q_ifeval_report" -> ((s, d) =>
      checksOf(Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text")))
        .groupBy(col("source"), col("kind"))
        .agg(max(col("instruction")).as("instruction"),
          count(lit(1)).as("n_docs"),
          sum(when(col("followed_strict"), 1L).otherwise(0L))
            .as("n_strict"),
          sum(when(col("followed_loose"), 1L).otherwise(0L))
            .as("n_loose"))
        .select(col("source"), col("kind"), col("instruction"),
          col("n_docs"), col("n_strict"), col("n_loose"),
          expr("n_strict * 1000 div n_docs").as("strict_pm"),
          expr("n_loose * 1000 div n_docs").as("loose_pm"))
        .orderBy(col("source"), col("kind")))
  )

  /** The strict law spelled for DuckDB over a list column `l` — kept
    * textually beside the Scala law; thresholds interpolate from the
    * same constants.
    */
  private def duckStrict(l: String): String =
    s"""CASE kind
       |  WHEN 0 THEN len($l) >= $MinWords
       |  WHEN 1 THEN len(list_filter($l, x -> x = '$Keyword'))
       |    >= $KeywordMin
       |  WHEN 2 THEN NOT list_contains($l, '$Forbidden')
       |  WHEN 3 THEN CASE WHEN len($l) = 0 THEN false
       |    ELSE $l[len($l)] = '$EndWord' END
       |  WHEN 4 THEN len(list_distinct($l)) >= $MinDistinct
       |  ELSE len($l) - len(list_distinct($l)) <= $RepeatCap
       |END""".stripMargin

  private lazy val checkSql: String = {
    val instructionCase = "CASE kind " + Kinds.map { case (k, txt) =>
      s"WHEN $k THEN '$txt'" }.mkString(" ") + " END"
    s"""ifd AS (
       |  SELECT doc_id, source, CAST(doc_id % 6 AS BIGINT) AS kind,
       |    string_split(text, ' ') AS l,
       |    string_split(text, ' ')[2:] AS tl
       |  FROM documents),
       |ifc AS (
       |  SELECT doc_id, source, kind,
       |    $instructionCase AS instruction,
       |    (${duckStrict("l")}) AS followed_strict,
       |    (${duckStrict("l")}) OR (${duckStrict("tl")})
       |      AS followed_loose
       |  FROM ifd)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_ifeval_check" ->
      (s"WITH $checkSql\n" +
        """SELECT doc_id, kind, instruction, followed_strict,
          |  followed_loose
          |FROM ifc ORDER BY doc_id""".stripMargin),
    "q_ifeval_report" ->
      (s"WITH $checkSql\n" +
        """SELECT source, kind, max(instruction) AS instruction,
          |  count(*) AS n_docs,
          |  CAST(sum(CASE WHEN followed_strict THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_strict,
          |  CAST(sum(CASE WHEN followed_loose THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_loose,
          |  CAST(sum(CASE WHEN followed_strict THEN 1 ELSE 0 END)
          |    AS BIGINT) * 1000 // count(*) AS strict_pm,
          |  CAST(sum(CASE WHEN followed_loose THEN 1 ELSE 0 END)
          |    AS BIGINT) * 1000 // count(*) AS loose_pm
          |FROM ifc GROUP BY source, kind
          |ORDER BY source, kind""".stripMargin)
  )
}
