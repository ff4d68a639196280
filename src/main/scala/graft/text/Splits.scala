package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Train/validation/test SPLITTING — the step between corpus curation
  * and training that every pipeline in this engine feeds: a split must
  * be deterministic (re-runs and late-arriving shards land identically
  * — no RNG state, the md5 discipline shared with the samplers),
  * proportioned (800/100/100 per-mille here), and LEAKAGE-SAFE — the
  * Lee et al. 2022 dedup motivation read in reverse: if near-duplicate
  * documents straddle train and test, the eval set is contaminated by
  * construction and measured loss is memorization, not generalization.
  *
  * Three operators (q_sample_split publishes the per-document
  * ASSIGNMENT; these publish what a release sign-off reads):
  *  - `q_split_stratified`: the per-source PROPORTION AUDIT of the
  *    md5-bucket split — does every stratum actually get its
  *    800/100/100, or did a small source draw a skewed hand? (pure
  *    per-row map + a bounded (source × 3) aggregate, ZERO text
  *    shuffle at any corpus size; an exact-ratio rank split would
  *    sort each stratum, the q_quantile_bucket trade, and buys
  *    ±0.1% ratio precision nobody needs at 100 TB).
  *  - `q_split_leakage_safe`: every member of a near-dup CLUSTER
  *    (the written CC labels, `dedup_cluster_labels`) inherits the
  *    split of its cluster keeper, so no cluster straddles splits —
  *    published with BOTH audits: straddling clusters under this
  *    assignment (0 by construction, counted honestly from the data)
  *    and under the naive per-document split (the counterfactual
  *    leak this operator exists to prevent).
  *  - `q_kanon_report`: k-anonymity over the quasi-identifier tuple
  *    (source, lang, log2 length bucket) — the privacy readout before
  *    a split ships to an external eval: groups below k = 5 members
  *    are re-identification risks a release would suppress.
  *
  * Scale shape: the stratified split is map-only + one bounded
  * (source × 3)-row aggregate; the leakage-safe split adds ONE thin
  * id-width equi-join against the written labels layout (labels grow
  * with the corpus, so the join is deliberately NOT broadcast — the
  * q_dedup_soft discipline) and two thin audit aggregates keyed on the
  * cluster id; the k-anonymity report is one map-combined aggregate
  * over a bounded group space. No text column ever enters an exchange.
  * All-integer outputs; all three fully oracled (the cluster labels
  * compose through the q_dedup_clusters recursive CTE).
  */
object Splits {

  /** Split thresholds in per-mille of the md5 bucket space. */
  val TrainPm = 800L
  val ValPm = 900L

  /** k-anonymity threshold: groups below this size are flagged. */
  val KAnon = 5L

  /** md5 bucket in [0, 1000) of a key column — the engine's standard
    * deterministic-uniform construction (12 hex chars < 2^48, so the
    * BIGINT mod is exact in both engines).
    */
  private def bucketOf(key: Column): Column =
    pmod(conv(substring(md5(concat(key.cast("string"), lit(":split42"))
      .cast("binary")), 1, 12), 16, 10).cast("long"), lit(1000L))

  private[graft] def splitOf(key: Column): Column =
    when(bucketOf(key) < TrainPm, "train")
      .when(bucketOf(key) < ValPm, "val")
      .otherwise("test")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_split_stratified" -> ((s, d) => {
      val per = Tables.documents(s, d)
        .select(col("source"), splitOf(col("doc_id")).as("split"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
      val tot = per.groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_src"))
      per.join(broadcast(tot), "source")
        .select(col("source"), col("split"), col("n_docs"),
          expr("n_docs * 1000 div n_src").as("share_pm"))
        .orderBy(col("source"), col("split"))
    }),

    "q_split_leakage_safe" -> ((s, d) => {
      val labels = graft.dedup.Dedup.clusterLabels(s, d)
      val assigned = Tables.documents(s, d).select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_keeper"), col("doc_id")).as("skey"))
        .select(col("doc_id"), col("skey"),
          splitOf(col("skey")).as("split"),
          splitOf(col("doc_id")).as("naive_split"))
      val per = assigned.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("skey")).as("n_groups"))
      // both audits from the same thin (skey, splits) aggregate: a
      // cluster straddles when its members see >1 distinct split
      val audit = assigned.groupBy(col("skey"))
        .agg(countDistinct(col("split")).as("ns"),
          countDistinct(col("naive_split")).as("nn"))
        .agg(sum(when(col("ns") > 1, 1L).otherwise(0L))
            .as("straddling_clusters"),
          sum(when(col("nn") > 1, 1L).otherwise(0L))
            .as("naive_straddling_clusters"))
      val tot = assigned.agg(count(lit(1)).as("n_total"))
      per.crossJoin(broadcast(audit)).crossJoin(broadcast(tot))
        .select(col("split"), col("n_docs"), col("n_groups"),
          expr("n_docs * 1000 div n_total").as("share_pm"),
          col("straddling_clusters"), col("naive_straddling_clusters"))
        .orderBy(col("split"))
    }),

    "q_kanon_report" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(col("source"), col("lang"),
          expr("CAST(length(bin(n_chars)) - 1 AS BIGINT)").as("len_bin"))
        .agg(count(lit(1)).as("n"))
        .select(col("source"), col("lang"), col("len_bin"), col("n"),
          (col("n") >= KAnon).as("meets_k"))
        .orderBy(col("source"), col("lang"), col("len_bin"))),

    // TEMPORAL split — the OTHER leakage axis: for behavioral/ordered
    // data, a random split trains on the future and evals on the past
    // (temporal leakage); the standard fix is train = everything up to
    // a boundary instant, eval = everything after. The boundary is the
    // exact 80th-percentile order date, derived WITHOUT sorting the
    // fact table: one thin per-date count aggregate (distinct dates
    // are bounded — ~2.4k here, calendar-bounded at any corpus size),
    // a running sum over that small table, and the boundary broadcast
    // back as a 1-row aggregate. Rows at the boundary date all land in
    // train (deterministic; no tie ambiguity). Fully oracled.
    "q_split_temporal" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d).select(col("o_orderdate"))
      val byDate = o.groupBy(col("o_orderdate")).agg(count(lit(1)).as("c"))
      // window over the thin per-date table, not the fact table
      val cum = byDate.withColumn("cum",
        sum(col("c")).over(Window.orderBy(col("o_orderdate"))))
      val tot = o.agg(count(lit(1)).as("n_total"))
      val bdry = cum.crossJoin(broadcast(tot))
        .filter(col("cum") * 1000 <= lit(TrainPm) * col("n_total"))
        .agg(max(col("o_orderdate")).as("boundary"))
      o.crossJoin(broadcast(bdry))
        .select(when(col("o_orderdate") <= col("boundary"), "train")
          .otherwise("eval").as("split"), col("o_orderdate"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderdate")).as("first_date"),
          max(col("o_orderdate")).as("last_date"))
        .crossJoin(broadcast(tot))
        .select(col("split"), col("n_orders"),
          expr("n_orders * 1000 div n_total").as("share_pm"),
          col("first_date"), col("last_date"))
        .orderBy(col("split"))
    })
  )

  /** The md5 bucket law in DuckDB — shared by both split oracles. */
  private def bucketSql(key: String): String =
    s"('0x' || substr(md5(CAST($key AS VARCHAR) || ':split42'), 1, 12))" +
      s"::BIGINT % 1000"

  private[graft] def splitSql(key: String): String =
    s"""CASE WHEN ${bucketSql(key)} < $TrainPm THEN 'train'
       |     WHEN ${bucketSql(key)} < $ValPm THEN 'val'
       |     ELSE 'test' END""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_split_stratified" ->
      s"""WITH a AS (
         |  SELECT source, ${splitSql("doc_id")} AS split FROM documents),
         |per AS (SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs
         |        FROM a GROUP BY source, split),
         |tot AS (SELECT source, sum(n_docs) AS n_src FROM per GROUP BY source)
         |SELECT p.source, p.split, p.n_docs,
         |  CAST(p.n_docs * 1000 // t.n_src AS BIGINT) AS share_pm
         |FROM per p JOIN tot t ON p.source = t.source
         |ORDER BY p.source, p.split""".stripMargin,
    "q_split_leakage_safe" ->
      s"""WITH RECURSIVE ${graft.dedup.Dedup.clusterLabelCtes},
         |a AS (
         |  SELECT d.doc_id,
         |    coalesce(l.cluster_keeper, d.doc_id) AS skey
         |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id),
         |sp AS (
         |  SELECT doc_id, skey,
         |    ${splitSql("skey")} AS split,
         |    ${splitSql("doc_id")} AS naive_split
         |  FROM a),
         |per AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT skey) AS BIGINT) AS n_groups
         |  FROM sp GROUP BY split),
         |aud AS (
         |  SELECT
         |    CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS straddling_clusters,
         |    CAST(sum(CASE WHEN nn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS naive_straddling_clusters
         |  FROM (SELECT skey, count(DISTINCT split) AS ns,
         |          count(DISTINCT naive_split) AS nn
         |        FROM sp GROUP BY skey) g),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM sp)
         |SELECT per.split, per.n_docs, per.n_groups,
         |  CAST(per.n_docs * 1000 // tot.n_total AS BIGINT) AS share_pm,
         |  aud.straddling_clusters, aud.naive_straddling_clusters
         |FROM per, aud, tot ORDER BY per.split""".stripMargin,
    "q_kanon_report" ->
      s"""SELECT source, lang,
         |  CAST(length(bin(n_chars)) - 1 AS BIGINT) AS len_bin,
         |  CAST(count(*) AS BIGINT) AS n,
         |  count(*) >= $KAnon AS meets_k
         |FROM documents GROUP BY source, lang, len_bin
         |ORDER BY source, lang, len_bin""".stripMargin,
    "q_split_temporal" ->
      s"""WITH byd AS (
         |  SELECT o_orderdate, count(*) AS c FROM orders GROUP BY 1),
         |cum AS (
         |  SELECT o_orderdate,
         |    sum(c) OVER (ORDER BY o_orderdate
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM byd),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM orders),
         |bdry AS (
         |  SELECT max(o_orderdate) AS boundary FROM cum, tot
         |  WHERE cum * 1000 <= $TrainPm * n_total)
         |SELECT split, n_orders,
         |  CAST(n_orders * 1000 // n_total AS BIGINT) AS share_pm,
         |  first_date, last_date
         |FROM (
         |  SELECT CASE WHEN o_orderdate <= (SELECT boundary FROM bdry)
         |      THEN 'train' ELSE 'eval' END AS split,
         |    CAST(count(*) AS BIGINT) AS n_orders,
         |    min(o_orderdate) AS first_date,
         |    max(o_orderdate) AS last_date
         |  FROM orders GROUP BY 1) p, tot
         |ORDER BY split""".stripMargin
  )
}
