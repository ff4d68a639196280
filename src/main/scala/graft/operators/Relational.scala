package graft.operators

import graft.{Exact, Tables}
import graft.Exact.{money, one, rate, sumMoney}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational surface: joins (all types, broadcast + shuffle), hash
  * aggregation (incl. distinct / rollup / cube / grouping sets), sort,
  * limit, top-k per group, and set operations.
  *
  * The reference has none of these (SURVEY.md §2.2) — its hash table
  * (`src/hashtable.rs`) is the *mechanism* engines grow into hash-agg /
  * hash-join; here Catalyst supplies both. Scale notes per operator:
  *
  *  - Dimension joins (`region`/`nation`/`supplier`, ≤ a few thousand
  *    rows even at 1000× sf) are explicitly `broadcast()`: zero
  *    shuffle of the fact side.
  *  - The fact⋈fact join (`orders ⋈ lineitem`) shuffles both sides on
  *    the join key once; at 100 TB this is the sort-merge-join path and
  *    AQE handles skewed keys. Aggregations run partial (map-side)
  *    before the exchange — guaranteed by declaring them via
  *    `groupBy().agg()`.
  *  - Exact decimal arithmetic (graft.Exact) makes every sum
  *    order-independent, so results are identical regardless of
  *    partitioning — the property that lets the same plan run on
  *    local[4] and a 1000-executor cluster.
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan-filter-hashagg over the fact table.
    "q1_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1999-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumMoney(col("l_quantity")).as("sum_qty"),
          sumMoney(col("l_extendedprice")).as("sum_base_price"),
          sum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(money(col("l_extendedprice")) * (one - rate(col("l_discount")))
            * (one + rate(col("l_tax")))).cast("double").as("sum_charge"),
          (sum(money(col("l_quantity"))).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Star-join through two broadcast dims; fact side never shuffles
    // for the join (only for the final small aggregation).
    "q_join_broadcast" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_cust"),
          sumMoney(col("c_acctbal")).as("acctbal_sum"))
        .orderBy(col("r_name"))
    }),

    // Fact ⋈ fact equi-join: shuffle/sort-merge path, AQE-skew-safe.
    "q_join_sortmerge" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    }),

    // Left outer join preserving customers with zero orders.
    // Aggregate-before-join: orders collapse to one row per custkey
    // *before* the join, so the join input is |customers| + |custkeys|
    // rows instead of |customers| + |orders| — the shape that matters
    // when orders is the 100 TB side.
    "q_join_left" -> ((s, d) => {
      val oAgg = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_o"), sum(money(col("o_totalprice"))).as("t_o"))
      Tables.customer(s, d)
        .join(oAgg, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("n_o"), lit(0L)).as("n_orders"),
          coalesce(col("t_o"), lit(0)).cast("double").as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // Semi join = EXISTS: no payload columns from the right side cross
    // the exchange — cheapest join shape for filtering at scale.
    "q_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy(col("c_custkey"))
    }),

    // Anti join = NOT EXISTS.
    "q_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy(col("c_custkey"))
    }),

    // Full outer join of two pre-aggregated sides (aggregate-then-join:
    // shrinks both inputs before the expensive join at scale).
    "q_join_full" -> ((s, d) => {
      val c = Tables.customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables.supplier(s, d).groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, c("c_nationkey") === su("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // Distinct aggregation (expands to a two-phase plan under AQE).
    "q_agg_distinct" -> ((s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          countDistinct(col("c_nationkey")).as("n_nations"))
        .orderBy(col("c_mktsegment"))),

    // Min/max/count basic stats (exact picks — no float drift).
    "q_agg_stats" -> ((s, d) =>
      Tables.part(s, d)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
          min(col("p_retailprice")).as("min_price"),
          max(col("p_retailprice")).as("max_price"),
          sumMoney(col("p_retailprice")).as("sum_price"))
        .orderBy(col("p_brand"))),

    // ARG-MAX aggregation (max_by / arg_max): the group member that
    // attains the group's maximum — here, each event type's
    // top-spending user. Expressed as max over a (value, key) STRUCT,
    // which both engines order lexicographically: the embedded key IS
    // the deterministic tiebreak (bare max_by/arg_max leave ties
    // engine-defined — the reason this idiom, not those functions, is
    // the library form). Two map-combined aggregates, exact-decimal
    // sums; no window, no sort of the group space.
    "q_agg_argmax" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(money(col("value"))).as("v_sum"))
        .groupBy(col("event_type"))
        .agg(max(struct(col("v_sum"), col("user_id"))).as("m"))
        .select(col("event_type"), col("m.user_id").as("top_user"),
          col("m.v_sum").cast("double").as("top_sum"))
        .orderBy(col("event_type"))),

    // Approximate distinct (HLL++). No oracle: DuckDB's approx sketch
    // differs by construction → rows-only check.
    "q_approx_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))),

    // ROLLUP with sentinel-coalesced keys (avoids NULL-ordering
    // divergence between engines) + grouping_id level marker.
    "q_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("lvl"),
          count(lit(1)).as("n"), sumMoney(col("l_quantity")).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("lvl"), col("n"), col("qty"))
        .orderBy(col("returnflag"), col("linestatus"), col("lvl"))),

    "q_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("lvl"),
          count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("orderstatus"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("orderpriority"),
          col("lvl"), col("n"), col("total"))
        .orderBy(col("orderstatus"), col("orderpriority"), col("lvl"))),

    // GROUPING SETS via Spark SQL (shared text with the oracle).
    "q_grouping_sets" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      Tables.region(s, d).createOrReplaceTempView("region")
      s.sql(Sql.groupingSets)
    }),

    // Global sort + limit → TakeOrderedAndProject (top-k per partition
    // then merge on the driver: no full sort at scale).
    "q_sort_limit" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)),

    // Top-k per group: rank inside each partition of the window —
    // single shuffle on the partition key.
    "q_topk_per_group" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy(col("o_custkey"), col("rk"))
    }),

    // Set operations.
    "q_set_union" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          lit("customer").as("src"), col("c_acctbal").as("acctbal"))
      val su = Tables.supplier(s, d)
        .select(col("s_suppkey").as("id"), col("s_name").as("name"),
          lit("supplier").as("src"), col("s_acctbal").as("acctbal"))
      c.unionByName(su).orderBy(col("src"), col("id"))
    }),

    "q_set_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(
          Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))),

    "q_set_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(
          Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey")))
  )

  private object Sql {
    val groupingSets: String =
      """SELECT coalesce(n_name, '(all)') AS nation,
        |       coalesce(r_name, '(all)') AS region,
        |       count(*) AS n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((n_name, r_name), (r_name), ())
        |ORDER BY nation, region""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_agg_argmax" ->
      """WITH s AS (
        |  SELECT event_type, user_id,
        |    sum(CAST(value AS DECIMAL(18,2))) AS v_sum
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type,
        |    max(struct_pack(v := v_sum, u := user_id)) AS m
        |  FROM s GROUP BY 1)
        |SELECT event_type, CAST(m.m.u AS BIGINT) AS top_user,
        |  CAST(m.m.v AS DOUBLE) AS top_sum
        |FROM m ORDER BY event_type""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_join_sortmerge" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_full" ->
      """SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
        |       coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
        |ON c.c_nationkey = s.s_nationkey
        |ORDER BY nationkey""".stripMargin,
    "q_agg_distinct" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |       count(DISTINCT c_nationkey) AS n_nations
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_agg_stats" ->
      """SELECT p_brand, count(*) AS n_parts, min(p_retailprice) AS min_price,
        |       max(p_retailprice) AS max_price,
        |       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |       coalesce(l_linestatus, '(all)') AS linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus, lvl""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS orderstatus,
        |       coalesce(o_orderpriority, '(all)') AS orderpriority,
        |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS lvl,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority, lvl""".stripMargin,
    "q_grouping_sets" -> Sql.groupingSets,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q_set_union" ->
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS src, c_acctbal AS acctbal FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src, s_acctbal AS acctbal FROM supplier
        |ORDER BY src, id""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin
  )
}
