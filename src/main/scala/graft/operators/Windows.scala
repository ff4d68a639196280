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
  * all four queries below share the "partition by a key with bounded
  * cardinality-per-key" shape, so no single partition can exceed an
  * executor (orders-per-customer is ~10 regardless of SF). Running
  * sums use exact decimals (graft.Exact) so frame evaluation order
  * cannot introduce float drift vs the oracle.
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
    })
  )

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
    "q_window_dist" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd,
        |  first_value(o_orderkey) OVER wr AS first_key,
        |  last_value(o_orderkey) OVER wr AS last_key,
        |  nth_value(o_orderkey, 2) OVER wr AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey),
        |       wr AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderstatus, o_totalprice, o_orderkey""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_total,
        |  count(*) OVER w AS run_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_window_range" ->
      """SELECT o_orderstatus, o_orderkey, price_cents,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY price_cents
        |                 RANGE BETWEEN 500000 PRECEDING AND CURRENT ROW) AS n_in_range
        |FROM (SELECT o_orderstatus, o_orderkey,
        |        CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents FROM orders) t
        |ORDER BY o_orderstatus, price_cents, o_orderkey""".stripMargin
  )
}
