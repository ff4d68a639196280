package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each event picks the most recent order
  * (by order date) of the same user at or before the event timestamp.
  *
  * Spark has no ASOF JOIN operator; the scalable composition is the
  * union-sort-carry technique: tag both sides, union them, and carry
  * the latest order attributes forward with `last(..., ignoreNulls)`
  * over a (user, time)-ordered window. One shuffle on the user key,
  * no range-join explosion — at 100 TB this beats the naive
  * join-filter-max plan by orders of magnitude because each row is
  * touched exactly once after the sort.
  *
  * Orders are first deduplicated to one row per (custkey, orderdate)
  * (max orderkey) so the as-of winner is deterministic — the DuckDB
  * `ASOF JOIN` oracle does the same.
  */
object AsOf {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_join" -> ((s, d) => {
      val od = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      // o_orderdate arrives as TIMESTAMP_NTZ; cast to instant (session
      // tz is UTC) for unix_micros.
      val odUs = unix_micros(col("o_orderdate").cast("timestamp"))
      val orderSide = od.select(
        col("o_custkey").as("user_id"),
        odUs.as("t_us"),
        lit(0).as("is_event"),
        lit(null).cast("long").as("event_id"),
        col("o_orderkey"),
        odUs.as("o_date_us"))
      val eventSide = Tables.events(s, d).select(
        col("user_id"),
        unix_micros(col("ts")).as("t_us"),
        lit(1).as("is_event"),
        col("event_id"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("long").as("o_date_us"))
      // Orders sort before events at the same instant (is_event asc),
      // so an order dated exactly at the event time is visible to it.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us"), col("is_event"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orderSide.unionByName(eventSide)
        .withColumn("m_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("m_date_us", last(col("o_date_us"), ignoreNulls = true).over(w))
        .filter(col("is_event") === 1)
        .select(col("event_id"), col("user_id"), col("t_us").as("ts_us"),
          col("m_orderkey").as("o_orderkey"), col("m_date_us").as("o_date_us"))
        .orderBy(col("event_id"))
    }),

    // NEAREST-in-time join — the sensor-fusion / feature-alignment
    // variant of as-of: align each purchase event with the user's
    // CLOSEST click in either direction (ties → the earlier, i.e.
    // backward, candidate) — attribution when the clickstream and the
    // conversion stream have no shared key beyond (user, time). Same
    // union-sort-carry shape, run BOTH ways over one (user, time)
    // sort: a backward last(ignoreNulls) carry and a forward
    // first(ignoreNulls) carry share the single user_id exchange (two
    // Window passes, no second shuffle — the q_scd2 exchange-reuse
    // discipline), then one row-local comparison picks the nearer
    // candidate. Clicks sort before purchases at the same instant, so
    // a delta-0 match arrives via the backward carry. Still one
    // shuffle, each row touched twice after the sort — no range-join
    // blowup at any scale. Fully oracled vs the brute-force argmin.
    "q_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // one candidate per (user, instant) — max event_id, the same
      // dedup q_asof_join applies to orders — so the carry direction
      // tiebreak is deterministic even with equal-time clicks
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("c_us"))
        .agg(max(col("event_id")).as("cid"))
      val clickSide = clicks.select(
        col("user_id"),
        col("c_us").as("t_us"),
        lit(0).as("is_left"),
        lit(null).cast("long").as("event_id"),
        col("cid").as("click_id"),
        col("c_us").as("click_us"))
      val buySide = ev.filter(col("event_type") === "purchase").select(
        col("user_id"),
        unix_micros(col("ts")).as("t_us"),
        lit(1).as("is_left"),
        col("event_id"),
        lit(null).cast("long").as("click_id"),
        lit(null).cast("long").as("click_us"))
      // forward carry as a DESCENDING running frame: Spark's
      // (currentRow, unboundedFollowing) frame rescans the tail per
      // row — O(n²) in a user's history; the reversed running last()
      // is the same navigation in O(n) over the reused exchange
      val wb = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us"), col("is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("user_id"))
        .orderBy(col("t_us").desc, col("is_left").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clickSide.unionByName(buySide)
        .withColumn("bk", last(col("click_id"), ignoreNulls = true).over(wb))
        .withColumn("bd", last(col("click_us"), ignoreNulls = true).over(wb))
        .withColumn("fk", last(col("click_id"), ignoreNulls = true).over(wf))
        .withColumn("fd", last(col("click_us"), ignoreNulls = true).over(wf))
        .filter(col("is_left") === 1)
        .withColumn("pick_back",
          col("fd").isNull ||
            (col("bd").isNotNull &&
              (col("t_us") - col("bd")) <= (col("fd") - col("t_us"))))
        .select(col("event_id"), col("user_id"), col("t_us").as("ts_us"),
          when(col("pick_back"), col("bk")).otherwise(col("fk"))
            .as("click_id"),
          when(col("pick_back"), col("bd")).otherwise(col("fd"))
            .as("click_us"),
          when(col("pick_back"), col("t_us") - col("bd"))
            .otherwise(col("fd") - col("t_us")).as("delta_us"))
        .orderBy(col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH od AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id,
        |       epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
        |       o.o_orderkey,
        |       epoch_us(o.o_orderdate) AS o_date_us
        |FROM events e
        |ASOF LEFT JOIN od o
        |  ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    // brute-force argmin form: rank candidates by |delta| with the
    // earlier instant breaking ties — the semantics the carry
    // implements (candidates deduped to one per (user, instant))
    "q_asof_nearest" ->
      """WITH c AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS c_us,
        |    max(event_id) AS cid
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |b AS (
        |  SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events WHERE event_type = 'purchase'),
        |cand AS (
        |  SELECT b.event_id, b.user_id, b.ts_us, c.cid, c.c_us,
        |    row_number() OVER (PARTITION BY b.event_id
        |      ORDER BY abs(b.ts_us - c.c_us), c.c_us) AS rn
        |  FROM b LEFT JOIN c ON b.user_id = c.user_id)
        |SELECT event_id, user_id, ts_us, cid AS click_id,
        |  c_us AS click_us, abs(ts_us - c_us) AS delta_us
        |FROM cand WHERE rn = 1 ORDER BY event_id""".stripMargin
  )
}
