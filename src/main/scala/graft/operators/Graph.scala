package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality: PageRank over a bipartite business graph —
  * supplier ↔ customer edges derived from who supplied whose orders
  * (lineitem ⋈ orders), symmetrized so every node has out-edges (no
  * dangling-mass special case).
  *
  * Why a training-data engine carries this: host-graph centrality is
  * a standard corpus-quality signal — Common Crawl publishes host-
  * level PageRank and web-scale corpus filters (CCNet-descended
  * pipelines) use link centrality to weight or threshold sources.
  * This operator is that computation's shape: nodes are hosts,
  * edges are links, ranks feed the quality column the sampling
  * operators (q_mixture_sample, q_domain_filter) consume.
  *
  * Scale design: the edge list is THIN (two longs per edge,
  * distinct-deduped); each of the fixed `PrIters` iterations is one
  * equi-join of edges against the (node, rank/outdeg) table plus one
  * map-side-combined sum by destination — the exact shuffle profile
  * of the connected-components rounds, linear in |E| per iteration
  * with bounded iteration count. `localCheckpoint` truncates the
  * iterative lineage (the standard pattern shared with CC and BPE).
  * No driver-side data movement: the only driver values are the node
  * count (one number) and the final top-20 collect implied by the
  * bench sink.
  *
  * Rows-only by contract (fixed-point iteration in IEEE doubles is
  * not SQL-expressible in the oracle's dialect); GraphSpec replays
  * the identical iteration in plain Scala over the collected edge
  * list and pins every node's rank to 1e-9, rank-mass conservation
  * (Σrank = 1), and the top-20 ordering.
  */
object Graph {

  /** Fixed iteration budget; PR converges geometrically at damping
    * 0.85, and the spec pins the exact iterate, not the fixpoint, so
    * the budget is a cost knob, not a correctness one.
    */
  val PrIters = 6
  val Damping = 0.85

  /** Customer node-id tag: high bit 40. An ADDITIVE offset is only
    * disjoint while suppkey stays below the constant (a fixed 1e6
    * broke past TPC-H sf100); the high-bit tag stays disjoint for any
    * key below 2^40 ≈ 1.1e12 — comfortably above both key spaces at
    * the 100 TB target (customers ~1.5e10 at sf100k) — with no
    * per-corpus aggregate to derive it.
    */
  private val CustTag = 1L << 40

  /** Distinct supplier→customer edges, symmetrized. */
  private[graft] def edges(s: SparkSession, d: String): DataFrame = {
    val ab = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("a"),
        col("o_custkey").bitwiseOR(CustTag).as("b"))
      .distinct()
    ab.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(ab.select(col("b").as("src"), col("a").as("dst")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = edges(s, d).localCheckpoint()
      val nodes = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("double").as("outdeg"))
      val n = nodes.count()
      var ranks = nodes
        .select(col("node"), col("outdeg"), lit(1.0 / n).as("rank"))
        .localCheckpoint()
      for (it <- 1 to PrIters) {
        val msgs = e.join(ranks.select(col("node").as("src"),
            (col("rank") / col("outdeg")).as("w")), "src")
          .groupBy(col("dst")).agg(sum(col("w")).as("m"))
        ranks = ranks.select(col("node"), col("outdeg"))
          .join(msgs, col("node") === col("dst"), "left")
          .select(col("node"), col("outdeg"),
            (lit((1.0 - Damping) / n) +
              lit(Damping) * coalesce(col("m"), lit(0.0))).as("rank"))
        // checkpoint every OTHER round: a 2-iteration lineage is cheap
        // for Catalyst, and each eager localCheckpoint writes the full
        // rank table to the block store — halving those is strictly
        // less work, though at this scale the per-round join+aggregate
        // dominates wall time (measured ~equal at sf0.1)
        if (it % 2 == 0 || it == PrIters) ranks = ranks.localCheckpoint()
      }
      // rank and order on the 6-decimal rounded value: near-tied nodes
      // differ only in double-sum order noise, so the published
      // ordering keys on the rounded rank (deterministic in any
      // engine), node id as the tiebreak
      val rounded = ranks.select(col("node"),
        round(col("rank"), 6).as("rank"))
      val w = Window.orderBy(col("rank").desc, col("node"))
      rounded.orderBy(col("rank").desc, col("node")).limit(20)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .select(col("rnk"), col("node"), col("rank"))
        .orderBy(col("rnk"))
    })
  )

  val oracle: Map[String, String] = Map.empty
}
