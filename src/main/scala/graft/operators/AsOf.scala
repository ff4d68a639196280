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
        |ORDER BY e.event_id""".stripMargin
  )
}
