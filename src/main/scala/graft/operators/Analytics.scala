package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators over the events stream: cohort
  * retention, deterministic anomaly scoring, and the null-safe join
  * surface (`<=>` / `IS NOT DISTINCT FROM`).
  *
  * Scale notes: retention is two thin shuffles on `user_id` (first-seen
  * agg, then a co-partitioned self-join — the join keys carry only
  * (user_id, week) pairs, never payloads) followed by a thin
  * (cohort, week) agg. Anomaly scoring aggregates 5 groups of exact
  * DECIMAL moments and broadcasts them back over the fact scan — the
  * fact side never shuffles. The null-safe join hashes NULL as a real
  * key value: that makes NULL the hottest key by construction, which
  * is exactly the semantics. Note the null blocks here are
  * modulus-PROPORTIONAL (~n/97 × ~m/11), so the null×null cross
  * product grows quadratically with table size — at 100 TB a
  * production pipeline must pre-filter or hard-cap the null sides
  * before a null-safe join (or salt NULL like any other hot key);
  * this query surfaces the operator semantics, not that mitigation.
  */
object Analytics {

  /** q_ewma truncation depth and the exact (3/4)^j weight literals.
    * Powers of 3/4 are finite decimal fractions, hence exactly
    * representable doubles — both engines parse identical weights, so
    * the whole EWMA arithmetic is the same IEEE ops in the same order.
    * The num/den/n_prev fragments are SHARED between the Spark
    * selectExpr and the DuckDB oracle (identical window syntax), which
    * makes cross-engine drift structurally impossible.
    */
  val EwmaK = 8

  /** q_trend_ols x-origin (2024-01-01T00:00:00Z, seconds): re-zeroing
    * the regressor keeps the x-moment magnitudes small without a
    * data-dependent min pass; the slope is translation-invariant.
    */
  val TrendEpochSec = 1704067200L
  private val ewmaW: IndexedSeq[String] =
    (0 until EwmaK).map(j =>
      java.math.BigDecimal.valueOf(0.75).pow(j).toPlainString)
  private val ewmaOver = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
  private val ewmaNumSql: String =
    (s"value * ${ewmaW(0)}" +:
      (1 until EwmaK).map(j =>
        s"coalesce(lag(value, $j) $ewmaOver * ${ewmaW(j)}, 0.0)")).mkString(" + ")
  private val ewmaDenSql: String =
    (ewmaW(0) +:
      (1 until EwmaK).map(j =>
        s"(CASE WHEN lag(value, $j) $ewmaOver IS NULL THEN 0.0 ELSE ${ewmaW(j)} END)"))
      .mkString(" + ")
  private val ewmaNPrevSql: String =
    (1 until EwmaK).map(j =>
      s"(CASE WHEN lag(value, $j) $ewmaOver IS NULL THEN 0 ELSE 1 END)")
      .mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Weekly cohort retention: cohort = a user's first active ISO week;
    // cell (cohort_w, week_n) = distinct users from that cohort active
    // n weeks later. The canonical engagement matrix every product
    // pipeline derives from an event log. First-seen is a thin
    // (user_id, min week) agg; the join back is co-partitioned on
    // user_id (AQE plans it broadcast at this SF — either way no
    // payload moves, events are pre-projected to (user_id, week)).
    "q_cohort_retention" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      val first = e.groupBy(col("user_id")).agg(min(col("w")).as("cohort_w"))
      e.join(first, "user_id")
        .withColumn("week_n",
          floor(datediff(col("w").cast("date"), col("cohort_w").cast("date")) / 7)
            .cast("long"))
        .groupBy(col("cohort_w"), col("week_n"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_w"), col("week_n"))
    }),

    // Deterministic z-score anomaly flagging: per-type moments from
    // EXACT decimal sums (sum and sum-of-squares are DECIMAL — no
    // FP accumulation order anywhere), then mean/std/z derive through
    // single IEEE ops, so every double is bit-identical to the oracle
    // with no rounding crutch. The moment table (5 rows) broadcasts
    // back over the fact scan: zero fact shuffle at any scale.
    "q_anomaly_zscore" -> ((s, d) => {
      val st = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("s1"),
          sum((col("value") * col("value")).cast("decimal(30,4)"))
            .cast("double").as("s2"))
        .select(col("event_type").as("et"), col("n"),
          (col("s1") / col("n")).as("mean"),
          sqrt((col("s2") - col("s1") * col("s1") / col("n"))
            / (col("n") - 1)).as("std"))
      Tables.events(s, d)
        .join(broadcast(st), col("event_type") === col("et"))
        .withColumn("z", (col("value") - col("mean")) / col("std"))
        .filter(abs(col("z")) > 3.0)
        .select(col("event_id"), col("event_type"), col("value"),
          col("z"))
        .orderBy(col("event_id"))
    }),

    // Robust (median/MAD) anomaly scoring — the heavy-tail twin of
    // q_anomaly_zscore: mean/std move with the outliers they hunt,
    // medians don't (50% breakdown point), so the modified z-score
    // 0.6745·(x−med)/MAD (Iglewicz–Hoaglin) flags tails a
    // contaminated std misses. Shape: two bounded aggregates — exact
    // per-type medians via sort-based percentile over each type's
    // values, then the MAD over broadcast-joined deviations — and the
    // 5-row moment tables broadcast back over the fact scan: the fact
    // side never shuffles, same as the z-score. (At extreme per-key
    // cardinality the exact median swaps for approx_percentile the
    // way q_profile_table_approx twins the exact profile.) The
    // published score is rounded: the two engines' quantile
    // interpolation formulas (lo·(1−f)+hi·f vs lo+f·(hi−lo)) can
    // differ in the last ulp.
    "q_anomaly_mad" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      val med = e.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5D)").as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(dev, 0.5D)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .withColumn("rz", lit(0.6745) * (col("value") - col("med")) / col("mad"))
        .filter(abs(col("rz")) > 3.5)
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("rz"), 6).as("rz"))
        .orderBy(col("event_id"))
    }),

    // Truncated exponentially-weighted moving average per user — the
    // smoothing pass behind rate trends and engagement decay. The
    // recursive EWMA is a sequential scan; the K-term truncation
    // (error ≤ (1−α)^K = 0.75⁸ ≈ 10%, and any tolerance is one K
    // notch away) re-expresses it as K fixed lags inside ONE window
    // pass — fully parallel over users, the standard trade that makes
    // EWMA distributable. Weights (3/4)^j are finite decimals, hence
    // EXACT doubles in both engines, and the term sum is written in
    // one fixed order — every double is IEEE-identical to the oracle
    // (rounding is belt-and-braces). One shuffle on user_id; per-user
    // partitions are bounded by the activity horizon.
    "q_ewma" -> ((s, d) =>
      Tables.events(s, d)
        .selectExpr("user_id", "event_id", "value",
          s"CAST($ewmaNPrevSql AS BIGINT) AS n_prev",
          s"round(($ewmaNumSql) / ($ewmaDenSql), 9) AS ewma")
        .orderBy(col("user_id"), col("event_id"))),

    // Per-group OLS TREND + Pearson correlation — the closed-form
    // regression every metrics pipeline fits per segment (is this
    // event type's value drifting, and how tightly does it track
    // time?). Five moments (Σx, Σx², Σy, Σy², Σxy) aggregate as EXACT
    // DECIMALS in one map-combined pass (the q_anomaly_zscore
    // discipline: no FP accumulation order anywhere — x² and xy sums
    // are DECIMAL(38,·) so 1e9-row groups cannot overflow), then
    // slope/intercept/r derive through single IEEE ops mirrored
    // operand-for-operand in DuckDB — bit-identical without any
    // approximation. x is integer seconds from a fixed epoch (keeps
    // the moment magnitudes small); slope publishes per-day. One thin
    // |types|-row aggregate; the fact table never shuffles.
    "q_trend_ols" -> ((s, d) => {
      val m = Tables.events(s, d)
        .select(col("event_type"), col("value"),
          expr(s"unix_micros(ts) div 1000000 - $TrendEpochSec").as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
          sum(col("value").cast("decimal(18,2)")).as("sy"),
          sum((col("value") * col("value")).cast("decimal(30,4)")).as("syy"),
          sum((col("value").cast("decimal(18,2)") * col("x"))
            .cast("decimal(38,4)")).as("sxy"))
      val md = m.select(col("event_type"), col("n"),
        col("sx").cast("double").as("sxd"),
        col("sxx").cast("double").as("sxxd"),
        col("sy").cast("double").as("syd"),
        col("syy").cast("double").as("syyd"),
        col("sxy").cast("double").as("sxyd"))
      md.select(col("event_type"), col("n"),
          ((col("n") * col("sxyd") - col("sxd") * col("syd")) /
            (col("n") * col("sxxd") - col("sxd") * col("sxd")) * lit(86400.0))
            .as("slope_day"),
          ((col("n") * col("sxyd") - col("sxd") * col("syd")) /
            sqrt((col("n") * col("sxxd") - col("sxd") * col("sxd")) *
              (col("n") * col("syyd") - col("syd") * col("syd"))))
            .as("corr"))
        .select(col("event_type"), col("n"),
          round(col("slope_day"), 9).as("slope_day"),
          round(col("corr"), 9).as("corr"))
        .orderBy(col("event_type"))
    }),

    // First-order Markov TRANSITION matrix over per-user event
    // sequences — the behavioral model behind next-action prediction
    // and bot detection (a scripted client's transition rows are
    // near-deterministic; organic ones aren't). One window pass on
    // user_id pairs each event with its predecessor; the (prev, next)
    // counts aggregate map-side to a |types|² bounded table, and the
    // per-prev row normalization is integer per-mille off a thin
    // self-aggregate — nothing after the single user_id exchange
    // scales with the event count. Fully oracled.
    "q_event_transitions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val c = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type").as("nxt"))
        .withColumn("prev", lag(col("nxt"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("nxt")).agg(count(lit(1)).as("n"))
      val tot = c.groupBy(col("prev")).agg(sum(col("n")).as("tot"))
      c.join(broadcast(tot), "prev")
        .select(col("prev"), col("nxt"), col("n"),
          expr("n * 1000 div tot").as("p_pm"))
        .orderBy(col("prev"), col("nxt"))
    }),

    // Ordered funnel conversion: how many users progress
    // view → click-after-view → purchase-after-click, where each stage
    // must happen strictly after the user's first event of the prior
    // stage. The canonical product-analytics cascade: each stage is a
    // thin (user_id, min ts) aggregate co-partitioned with the next
    // stage's filter join — only (user_id, ts) pairs ever move, and
    // every stage shrinks the user set, so the cascade's cost is
    // bounded by the first stage's aggregate at any scale.
    "q_funnel" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_buy"))
      v.agg(count(lit(1)).as("n_users")).select(lit("s1_view").as("stage"), col("n_users"))
        .unionAll(c.agg(count(lit(1)).as("n_users"))
          .select(lit("s2_click").as("stage"), col("n_users")))
        .unionAll(p.agg(count(lit(1)).as("n_users"))
          .select(lit("s3_purchase").as("stage"), col("n_users")))
        .orderBy(col("stage"))
    }),

    // RFM customer SEGMENTATION (recency / frequency / monetary) —
    // the canonical CRM scoring: per customer, days since last order
    // (vs the corpus horizon — a data-derived broadcast scalar, no
    // wall clock, so the query is reproducible), order count, and
    // exact-cents spend, each quartiled by ntile over a total order
    // (deterministic ties via custkey), combined into the familiar
    // 3-digit segment code. One thin per-customer aggregate + three
    // ntile windows over single-column sorts; at 100 TB the ntile
    // swaps for the quantile-bucket two-phase form
    // (q_quantile_bucket) — same codes, bounded partitions. Fully
    // oracled.
    "q_rfm_segment" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate").cast("date")).as("last_d"),
          count(lit(1)).as("n_orders"),
          (sum(graft.Exact.money(col("o_totalprice"))) * 100)
            .cast("long").as("m_cents"))
      val horizon = per.agg(max(col("last_d")).as("h"))
      val wr = Window.orderBy(col("r_days"), col("o_custkey"))
      val wf = Window.orderBy(col("n_orders").desc, col("o_custkey"))
      val wm = Window.orderBy(col("m_cents").desc, col("o_custkey"))
      per.crossJoin(broadcast(horizon))
        .select(col("o_custkey"),
          datediff(col("h"), col("last_d")).cast("long").as("r_days"),
          col("n_orders"), col("m_cents"))
        .withColumn("r_q", ntile(4).over(wr).cast("long"))
        .withColumn("f_q", ntile(4).over(wf).cast("long"))
        .withColumn("m_q", ntile(4).over(wm).cast("long"))
        .withColumn("segment",
          expr("r_q * 100 + f_q * 10 + m_q"))
        .orderBy(col("o_custkey"))
    }),

    // LINEAR click ATTRIBUTION with a 60-minute lookback — each
    // purchase's value splits evenly across the user's clicks in
    // (t−60min, t] — the marketing-attribution aggregate between
    // last-touch (q_asof_nearest's backward pick) and full-funnel
    // credit. The range COUNT is two cumulative lookups, not an
    // interval join: union clicks, purchases, AND a probe row per
    // purchase at t−60min; one (user, time) sort carries the running
    // click count; n = cum(purchase) − cum(probe). Probes sort before
    // clicks at the same instant (exclusive lower bound), purchases
    // after (inclusive upper). One user exchange + a thin per-
    // purchase regroup — no state grows with the window length, the
    // property an interval join lacks. Credit is integer cents with
    // an explicit remainder column (credit·n + resid = value, exact).
    // Fully oracled vs the brute-force interval join.
    "q_attribution_linear" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click").select(
        col("user_id"), unix_micros(col("ts")).as("t_us"),
        lit(0).as("kind"), // clicks (0) < probes (1) < purchases (2):
        // a click AT the probe instant lands inside cum(probe), so
        // the (t-60min, t] lower bound stays exclusive
        lit(null).cast("long").as("p_id"),
        lit(null).cast("long").as("v_cents"), lit(1L).as("is_click"))
      val buys = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), unix_micros(col("ts")).as("t_us"),
        lit(2).as("kind"), col("event_id").as("p_id"),
        (graft.Exact.money(col("value")) * 100).cast("long").as("v_cents"),
        lit(0L).as("is_click"))
      val probes = buys.select(col("user_id"),
        (col("t_us") - lit(3600L * 1000000)).as("t_us"),
        lit(1).as("kind"), col("p_id"),
        lit(null).cast("long").as("v_cents"), lit(0L).as("is_click"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(buys).unionByName(probes)
        .withColumn("cum", sum(col("is_click")).over(w))
        .filter(col("p_id").isNotNull)
        .groupBy(col("p_id"))
        .agg(first(col("user_id")).as("user_id"),
          max(when(col("kind") === 2, col("t_us"))).as("ts_us"),
          max(col("v_cents")).as("v_cents"),
          (max(when(col("kind") === 2, col("cum"))) -
            max(when(col("kind") === 1, col("cum")))).as("n_clicks"))
        .select(col("p_id"), col("user_id"), col("ts_us"), col("v_cents"),
          col("n_clicks"),
          when(col("n_clicks") > 0, expr("v_cents div n_clicks"))
            .as("credit_cents"),
          when(col("n_clicks") > 0,
            expr("v_cents - n_clicks * (v_cents div n_clicks)"))
            .as("resid_cents"))
        .orderBy(col("p_id"))
    }),

    // Null-safe equality join (`<=>` / NullSafeEqual): NULL keys match
    // each other instead of vanishing — the semantics MERGE/dedup
    // pipelines need when the join key is itself nullable. Derived
    // nullable keys on both sides (a modulus knocks keys out to NULL)
    // make the null×null block real; its size is modulus-proportional,
    // i.e. quadratic in table size — see the scaladoc for the 100 TB
    // mitigation. The aggregate separates the null-key block from
    // ordinary matches.
    "q_join_nullsafe" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 97 === 0, lit(null))
            .otherwise(col("o_custkey")).as("ok"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey"),
          when(col("c_custkey") % 11 === 0, lit(null))
            .otherwise(col("c_custkey")).as("ck"))
      o.join(c, col("ok") <=> col("ck"))
        .groupBy(col("ok").isNull.as("null_key"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_customers"))
        .orderBy(col("null_key"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_rfm_segment" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    max(CAST(o_orderdate AS DATE)) AS last_d,
        |    count(*) AS n_orders,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |      AS BIGINT) AS BIGINT) AS m_cents
        |  FROM orders GROUP BY 1),
        |h AS (SELECT max(last_d) AS h FROM per),
        |r AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', last_d, h.h) AS BIGINT) AS r_days,
        |    n_orders, m_cents
        |  FROM per, h)
        |SELECT o_custkey, r_days, n_orders, m_cents,
        |  CAST(ntile(4) OVER (ORDER BY r_days, o_custkey) AS BIGINT)
        |    AS r_q,
        |  CAST(ntile(4) OVER (ORDER BY n_orders DESC, o_custkey)
        |    AS BIGINT) AS f_q,
        |  CAST(ntile(4) OVER (ORDER BY m_cents DESC, o_custkey)
        |    AS BIGINT) AS m_q,
        |  CAST(ntile(4) OVER (ORDER BY r_days, o_custkey) * 100
        |    + ntile(4) OVER (ORDER BY n_orders DESC, o_custkey) * 10
        |    + ntile(4) OVER (ORDER BY m_cents DESC, o_custkey)
        |    AS BIGINT) AS segment
        |FROM r ORDER BY o_custkey""".stripMargin,
    // brute-force interval-count form of the cumulative-probe carry
    "q_attribution_linear" ->
      """WITH c AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_us
        |  FROM events WHERE event_type = 'click'),
        |b AS (
        |  SELECT event_id AS p_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents
        |  FROM events WHERE event_type = 'purchase'),
        |n AS (
        |  SELECT b.p_id, b.user_id, b.ts_us, b.v_cents,
        |    CAST(count(c.c_us) AS BIGINT) AS n_clicks
        |  FROM b LEFT JOIN c ON b.user_id = c.user_id
        |    AND c.c_us > b.ts_us - 3600000000
        |    AND c.c_us <= b.ts_us
        |  GROUP BY 1, 2, 3, 4)
        |SELECT p_id, user_id, ts_us, v_cents, n_clicks,
        |  CASE WHEN n_clicks > 0 THEN v_cents // n_clicks END
        |    AS credit_cents,
        |  CASE WHEN n_clicks > 0
        |    THEN v_cents - n_clicks * (v_cents // n_clicks) END
        |    AS resid_cents
        |FROM n ORDER BY p_id""".stripMargin,
    "q_anomaly_mad" ->
      """WITH e AS (SELECT event_id, event_type, value FROM events),
        |med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM e GROUP BY 1),
        |dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
        |    abs(e.value - m.med) AS dev
        |  FROM e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value,
        |  round(0.6745 * (d.value - d.med) / m2.mad, 6) AS rz
        |FROM dev d JOIN mad m2 USING (event_type)
        |WHERE abs(0.6745 * (d.value - d.med) / m2.mad) > 3.5
        |ORDER BY event_id""".stripMargin,
    "q_ewma" ->
      s"""SELECT user_id, event_id, value,
         |  CAST($ewmaNPrevSql AS BIGINT) AS n_prev,
         |  round(($ewmaNumSql) / ($ewmaDenSql), 9) AS ewma
         |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
         |      FROM events) e
         |ORDER BY user_id, event_id""".stripMargin,
    "q_trend_ols" ->
      s"""WITH m AS (
         |  SELECT event_type, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx,
         |    sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         |    sum(CAST(value AS DECIMAL(18,2))) AS sy,
         |    sum(CAST(CAST(value AS DECIMAL(18,2))
         |      * CAST(value AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS syy,
         |    sum(CAST(CAST(value AS DECIMAL(18,2)) * x AS DECIMAL(38,4)))
         |      AS sxy
         |  FROM (SELECT event_type, value,
         |      epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 - $TrendEpochSec AS x
         |    FROM events) t
         |  GROUP BY 1),
         |md AS (
         |  SELECT event_type, n,
         |    CAST(sx AS DOUBLE) AS sxd, CAST(sxx AS DOUBLE) AS sxxd,
         |    CAST(sy AS DOUBLE) AS syd, CAST(syy AS DOUBLE) AS syyd,
         |    CAST(sxy AS DOUBLE) AS sxyd
         |  FROM m)
         |SELECT event_type, n,
         |  round((n * sxyd - sxd * syd)
         |    / (n * sxxd - sxd * sxd) * 86400.0, 9) AS slope_day,
         |  round((n * sxyd - sxd * syd)
         |    / sqrt((n * sxxd - sxd * sxd) * (n * syyd - syd * syd)), 9)
         |    AS corr
         |FROM md ORDER BY event_type""".stripMargin,
    "q_event_transitions" ->
      """WITH t AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev,
        |    event_type AS nxt
        |  FROM events),
        |c AS (SELECT prev, nxt, count(*) AS n FROM t
        |  WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev, CAST(sum(n) AS BIGINT) AS tot
        |  FROM c GROUP BY 1)
        |SELECT c.prev, c.nxt, c.n, CAST(c.n * 1000 // t.tot AS BIGINT) AS p_pm
        |FROM c JOIN tot t USING (prev) ORDER BY prev, nxt""".stripMargin,
    "q_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS w
        |  FROM events),
        |f AS (SELECT user_id, min(w) AS cohort_w FROM e GROUP BY user_id)
        |SELECT cohort_w,
        |  CAST(floor(date_diff('day', CAST(cohort_w AS DATE),
        |                       CAST(w AS DATE)) / 7.0) AS BIGINT) AS week_n,
        |  count(DISTINCT user_id) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_anomaly_zscore" ->
      """WITH st AS (
        |  SELECT event_type AS et, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1),
        |m AS (SELECT et, s1 / n AS mean,
        |        sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std FROM st)
        |SELECT event_id, event_type, value, (value - mean) / std AS z
        |FROM events JOIN m ON event_type = et
        |WHERE abs((value - mean) / std) > 3.0
        |ORDER BY event_id""".stripMargin,
    "q_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_buy
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |  GROUP BY e.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT 's1_view' AS stage, count(*) AS n_users FROM v
        |  UNION ALL SELECT 's2_click', count(*) FROM c
        |  UNION ALL SELECT 's3_purchase', count(*) FROM p)
        |ORDER BY stage""".stripMargin,
    "q_join_nullsafe" ->
      """SELECT ok IS NULL AS null_key, count(*) AS n_pairs,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  count(DISTINCT c_custkey) AS n_customers
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |             ELSE o_custkey END AS ok FROM orders) o
        |JOIN (SELECT c_custkey,
        |        CASE WHEN c_custkey % 11 = 0 THEN NULL
        |             ELSE c_custkey END AS ck FROM customer) c
        |  ON ok IS NOT DISTINCT FROM ck
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
