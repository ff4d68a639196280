package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Advanced-surface queries: generator (UDTF-shape) explode, pivot,
  * array-collecting aggregation, moment statistics, and a typed
  * `Aggregator` over embedding vectors.
  *
  * Parity notes: collected arrays are sorted and string-joined before
  * comparison (array cells don't hash stably across engines' client
  * layers); moment statistics and centroids are rounded to 4 decimals
  * because partial-aggregation order perturbs the low bits.
  */
object Advanced {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // posexplode = generator/UDTF shape: one row per token position.
    "q_posexplode" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .orderBy(col("doc_id"), col("pos"))),

    // Pivot: order counts per priority × status matrix.
    "q_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority"))),

    // Array-collecting aggregation (sorted for determinism).
    "q_collect" -> ((s, d) =>
      Tables.nation(s, d).as("n")
        .join(Tables.customer(s, d).as("c"),
          col("c.c_nationkey") === col("n.n_nationkey"))
        .groupBy(col("n.n_regionkey").as("regionkey"))
        .agg(
          array_join(array_sort(collect_set(col("n.n_name"))), ",").as("nations"),
          count(lit(1)).as("n_cust"))
        .orderBy(col("regionkey"))),

    // Moment statistics (sample stddev/variance, correlation) —
    // rounded: partial-agg order perturbs low bits.
    "q_stats_adv" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("qty_sd"),
          round(var_samp(col("l_quantity")), 4).as("qty_var"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
          round(avg(col("l_discount")), 4).as("disc_avg"))
        .orderBy(col("l_returnflag"))),

    // Bounded-heap top-k per group via a typed Aggregator: unlike the
    // window form (q_topk_per_group sorts every group's full rows),
    // the buffer is k pairs per group×partition and the map-side pass
    // discards sub-top-k rows before the exchange — O(groups·k) state
    // at any scale. Same oracle shape as a window rank.
    "q_topk_agg" -> ((s, d) => {
      import s.implicits._
      val agg = new graft.functions.TopKAggregator(5).toColumn
      Tables.events(s, d)
        .select(col("event_type"), col("value"), col("event_id"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(agg.name("top")
          .asInstanceOf[org.apache.spark.sql.TypedColumn[(Double, Long), Seq[(Double, Long)]]])
        .toDF("event_type", "top")
        .select(col("event_type"), posexplode(col("top")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rk"),
          col("col._1").as("value"), col("col._2").as("event_id"))
        .orderBy(col("event_type"), col("rk"))
    }),

    // Typed Aggregator: per-label embedding centroid (mean vector),
    // emitted as a rounded comma-joined string for stable comparison.
    "q_embed_centroid" -> ((s, d) => {
      import s.implicits._
      val agg = new graft.functions.CentroidAggregator(64).toColumn
      Tables.embeddings(s, d)
        .select(col("label"), col("embedding"))
        .as[(Int, Array[Float])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg.name("centroid")
          .asInstanceOf[org.apache.spark.sql.TypedColumn[Array[Float], Array[Double]]])
        .toDF("label", "centroid")
        // DECIMAL(10,4) strings: Spark renders small doubles in
        // scientific notation, DuckDB never does — decimal text is the
        // stable interchange form.
        .select(col("label"),
          array_join(transform(col("centroid"),
            x => round(x, 4).cast("decimal(10,4)").cast("string")), ",")
            .as("centroid"),
          size(col("centroid")).cast("long").as("dim"))
        .orderBy(col("label"))
    }),

    // RECURSIVE CTE hierarchy walk (`WITH RECURSIVE`, new engine
    // surface in Spark 4): every document walks its ancestor chain in
    // the implicit binary tree parent(n) = n div 2 — the
    // thread-ancestry / taxonomy-rollup traversal shape (conversation
    // trees, category hierarchies) expressed in the QUERY LANGUAGE
    // rather than a hand-rolled loop (contrast q_graph_pagerank /
    // connected components, which drive iteration from the driver).
    // Scale: each recursion step is one thin (doc_id, node, depth)
    // projection and the depth is log2(max id) — 64 steps bound the
    // walk at ANY corpus size, and Catalyst plans each step as an
    // ordinary union increment. Fully oracled (DuckDB WITH RECURSIVE
    // mirrors verbatim; the per-doc aggregate casts away HUGEINT).
    "q_recursive_ancestry" -> ((s, d) => {
      Tables.documents(s, d).select(col("doc_id"))
        .createOrReplaceTempView("graft_rec_docs")
      s.sql(
        """WITH RECURSIVE anc AS (
          |  SELECT doc_id, doc_id AS node, 0 AS depth FROM graft_rec_docs
          |  UNION ALL
          |  SELECT doc_id, node DIV 2, depth + 1 FROM anc WHERE node > 1)
          |SELECT doc_id, CAST(max(depth) AS BIGINT) AS walk_depth,
          |  CAST(count(*) AS BIGINT) AS n_nodes,
          |  CAST(sum(node) AS BIGINT) AS path_sum
          |FROM anc GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_recursive_ancestry" ->
      """WITH RECURSIVE anc AS (
        |  SELECT doc_id, doc_id AS node, 0 AS depth FROM documents
        |  UNION ALL
        |  SELECT doc_id, node // 2, depth + 1 FROM anc WHERE node > 1)
        |SELECT doc_id, CAST(max(depth) AS BIGINT) AS walk_depth,
        |  CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(node) AS BIGINT) AS path_sum
        |FROM anc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_topk_agg" ->
      """SELECT event_type, CAST(rk AS BIGINT) AS rk, value, event_id FROM (
        |  SELECT event_type, value, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS rk
        |  FROM events) t
        |WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin,
    "q_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS INT) AS pos, l[i] AS token FROM (
        |  SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l
        |        FROM documents WHERE doc_id < 50) t) u
        |ORDER BY doc_id, pos""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_collect" ->
      """SELECT n_regionkey AS regionkey,
        |  array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
        |  count(*) AS n_cust
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY regionkey""".stripMargin,
    "q_stats_adv" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS qty_sd,
        |  round(var_samp(l_quantity), 4) AS qty_var,
        |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        |  round(avg(l_discount), 4) AS disc_avg
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_embed_centroid" ->
      """SELECT label,
        |  array_to_string(list(CAST(CAST(r AS DECIMAL(10,4)) AS VARCHAR) ORDER BY i), ',') AS centroid,
        |  CAST(64 AS BIGINT) AS dim
        |FROM (
        |  SELECT label, i, round(sum(CAST(e AS DOUBLE)) / count(*), 4) AS r
        |  FROM (SELECT label, unnest(embedding) AS e,
        |          unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings) t
        |  GROUP BY label, i) g
        |GROUP BY label ORDER BY label""".stripMargin
  )
}
