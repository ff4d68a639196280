package graft.operators

import graft.Exact.money
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions: ranking, analytic (lag/lead), and aggregate
  * windows with ROWS and RANGE frames.
  *
  * Absent from the reference (SURVEY.md §2.2). Scale notes: a window
  * spec shuffles once on `partitionBy` and sorts within partitions;
  * the o_custkey queries partition by a key with bounded
  * cardinality-per-key, so no single partition can exceed an executor
  * (orders-per-customer is ~10 regardless of SF). q_window_dist and
  * q_window_range partition by o_orderstatus (3 values) — they exist
  * to surface the NATIVE distribution/frame operators and their
  * semantics; q_window_dist_scaled is the same computation in the
  * shape you'd run at 100 TB (binned distributed rank + closed forms,
  * no per-status window over documents). Running sums use exact
  * decimals (graft.Exact) so frame evaluation order cannot introduce
  * float drift vs the oracle.
  */
object Windows {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "q_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          datediff(col("o_orderdate"),
            lag(col("o_orderdate"), 1).over(w)).cast("long").as("days_since_prev"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // Distribution + value window functions: percent_rank/cume_dist
    // (exact small-integer ratios — identical doubles in both
    // engines), first/last/nth value over a running frame.
    "q_window_dist" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("o_orderkey")).over(wRun).as("first_key"),
          last(col("o_orderkey")).over(wRun).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(wRun).as("second_key"))
        .orderBy(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
    }),

    // q_window_dist in the 100 TB shape: the distribution functions
    // have exact closed forms over the global rank — with a unique
    // full sort key (price, orderkey) there are no peer groups, so
    //   percent_rank = (rk-1)/(n-1), cume_dist = rk/n,
    //   first/nth_value(2) over a running frame = the rank-1/rank-2
    //   keys, last_value = the current row.
    // The rank itself is a two-phase distributed count over price
    // bins (the q_quantile_bucket pattern; bins are monotone in the
    // sort key, so (bin, price, key) ordering == (price, key)): no
    // window ever spans more than one (status, bin) slice. Bin
    // occupancy follows the value distribution — a pathologically hot
    // price narrows to more bins by shrinking the width constant.
    // Oracle: the SAME SQL as q_window_dist — the outputs are
    // bit-identical (single correctly-rounded double divisions).
    "q_window_dist_scaled" -> ((s, d) => {
      val rows = Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("bin",
          expr("cast(round(o_totalprice * 100) as bigint) div 1048576"))
      val wOff = Window.partitionBy(col("o_orderstatus")).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = rows.groupBy(col("o_orderstatus"), col("bin"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
        .withColumn("n_part",
          sum(col("cnt")).over(Window.partitionBy(col("o_orderstatus"))))
        .select(col("o_orderstatus"), col("bin"), col("off"), col("n_part"))
      val wLoc = Window.partitionBy(col("o_orderstatus"), col("bin"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val ranked = rows.join(broadcast(offsets), Seq("o_orderstatus", "bin"))
        .withColumn("rk", col("off") + row_number().over(wLoc))
      val heads = ranked.filter(col("rk") <= 2)
        .groupBy(col("o_orderstatus"))
        .agg(min(when(col("rk") === 1, col("o_orderkey"))).as("head_key"),
          min(when(col("rk") === 2, col("o_orderkey"))).as("rank2_key"))
      ranked.join(broadcast(heads), Seq("o_orderstatus"))
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          when(col("n_part") === 1, lit(0.0))
            .otherwise((col("rk") - 1).cast("double") /
              (col("n_part") - 1).cast("double")).as("pr"),
          (col("rk").cast("double") / col("n_part").cast("double")).as("cd"),
          col("head_key").as("first_key"),
          col("o_orderkey").as("last_key"),
          when(col("rk") >= 2, col("rank2_key")).as("second_key"))
        .orderBy(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
    }),

    // Running total: ROWS UNBOUNDED PRECEDING .. CURRENT ROW.
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(money(col("o_totalprice"))).over(w).cast("double").as("run_total"),
          count(lit(1)).over(w).as("run_n"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // Value-based RANGE frame on an integer cents column (exact; both
    // engines agree on integer range bounds where doubles could drift).
    "q_window_range" -> ((s, d) => {
      val cents = round(col("o_totalprice") * 100).cast("long")
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("price_cents"))
        .rangeBetween(-500000L, 0L) // 5000.00 currency units preceding
      Tables.orders(s, d)
        .withColumn("price_cents", cents)
        .select(col("o_orderstatus"), col("o_orderkey"), col("price_cents"),
          count(lit(1)).over(w).as("n_in_range"))
        .orderBy(col("o_orderstatus"), col("price_cents"), col("o_orderkey"))
    }),

    // q_window_range in the 100 TB shape. With bins exactly the frame
    // width W, a row at value v only ever sees bins b and b-1:
    //   n_in_range(v) = cnt_b(value <= v)                  [own bin]
    //                 + total_{b-1} - cnt_{b-1}(value <= v-W-1)
    // cnt_b(<= v) is a within-(status, bin) RANGE-cumulative window;
    // the neighbor-bin term is an as-of lookup: probe rows (value
    // v-W-1, carrying their o_orderkey) union into the previous bin's
    // distinct-value cumulative table and take last non-null carried
    // count — every window spans ONE (status, bin) slice, never a
    // whole status. A probe below its bin's values carries 0, which
    // makes the v-on-bin-boundary case fall out correctly. Bin
    // occupancy follows the value distribution (shrink W for hot
    // ranges). Oracle: the SAME SQL as q_window_range.
    "q_window_range_scaled" -> ((s, d) => {
      val W = 500000L
      val rows = Tables.orders(s, d)
        .withColumn("price_cents", round(col("o_totalprice") * 100).cast("long"))
        .select(col("o_orderstatus"), col("o_orderkey"), col("price_cents"))
        .withColumn("bin", expr(s"price_cents div $W"))
      // own-bin cumulative count by value (ties included: RANGE frame)
      val wOwn = Window.partitionBy(col("o_orderstatus"), col("bin"))
        .orderBy(col("price_cents"))
        .rangeBetween(Window.unboundedPreceding, 0)
      val own = rows.withColumn("own_cum", count(lit(1)).over(wOwn))
      // distinct-value cumulative table per (status, bin) + bin totals
      val wCum = Window.partitionBy(col("o_orderstatus"), col("bin"))
        .orderBy(col("price_cents"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = rows.groupBy(col("o_orderstatus"), col("bin"), col("price_cents"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cumv", sum(col("cnt")).over(wCum))
        .select(col("o_orderstatus"), col("bin"), col("price_cents"),
          col("cumv"))
      val totals = cum.groupBy(col("o_orderstatus"), col("bin"))
        .agg(max(col("cumv")).as("bin_total"))
        .select(col("o_orderstatus"), (col("bin") + 1).as("bin"),
          col("bin_total").as("prev_total"))
      // as-of probes into bin-1: entries sort before a same-value probe
      val probes = rows.select(col("o_orderstatus"),
        (col("bin") - 1).as("bin"),
        (col("price_cents") - W - 1).as("price_cents"),
        lit(null).cast("long").as("cumv"),
        col("o_orderkey").as("probe_key"))
      val entries = cum.withColumn("probe_key", lit(null).cast("long"))
      val wAsOf = Window.partitionBy(col("o_orderstatus"), col("bin"))
        .orderBy(col("price_cents"),
          when(col("probe_key").isNull, 0).otherwise(1))
        .rowsBetween(Window.unboundedPreceding, 0)
      val prevLe = entries.unionByName(probes)
        .withColumn("carried",
          last(col("cumv"), ignoreNulls = true).over(wAsOf))
        .filter(col("probe_key").isNotNull)
        .select(col("probe_key").as("o_orderkey"),
          coalesce(col("carried"), lit(0L)).as("prev_le"))
      own.join(prevLe, "o_orderkey")
        .join(broadcast(totals), Seq("o_orderstatus", "bin"), "left")
        .select(col("o_orderstatus"), col("o_orderkey"), col("price_cents"),
          (col("own_cum") + coalesce(col("prev_total"), lit(0L)) -
            col("prev_le")).as("n_in_range"))
        .orderBy(col("o_orderstatus"), col("price_cents"), col("o_orderkey"))
    })
  )

  private val windowDistSql =
    """SELECT o_orderstatus, o_orderkey, o_totalprice,
      |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd,
      |  first_value(o_orderkey) OVER wr AS first_key,
      |  last_value(o_orderkey) OVER wr AS last_key,
      |  nth_value(o_orderkey, 2) OVER wr AS second_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey),
      |       wr AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderstatus, o_totalprice, o_orderkey""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER w AS rn, rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS BIGINT) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_window_dist" -> windowDistSql,
    // identical output, scale-path plan — the one oracle pins both
    "q_window_dist_scaled" -> windowDistSql,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_total,
        |  count(*) OVER w AS run_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_window_range" -> windowRangeSql,
    // identical output, scale-path plan — the one oracle pins both
    "q_window_range_scaled" -> windowRangeSql
  )

  private lazy val windowRangeSql =
    """SELECT o_orderstatus, o_orderkey, price_cents,
      |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY price_cents
      |                 RANGE BETWEEN 500000 PRECEDING AND CURRENT ROW) AS n_in_range
      |FROM (SELECT o_orderstatus, o_orderkey,
      |        CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents FROM orders) t
      |ORDER BY o_orderstatus, price_cents, o_orderkey""".stripMargin
}
