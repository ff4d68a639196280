package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted join.
  *
  * When one join key dominates (a hot user, a null-heavy dimension),
  * hash partitioning sends its entire volume to one task. Salting
  * splits the hot side S ways: the fact row derives a deterministic
  * salt in [0, S), the dimension is replicated S times, and the join
  * key becomes (key, salt) — spreading each hot key over S tasks.
  * AQE's skew-join handling covers many cases at runtime; salting is
  * the explicit, planner-independent form.
  *
  * The salt must be *deterministic* (here: xxhash64 of the fact row
  * id, reference-style seeded hashing) — `rand()` would break retry
  * semantics and oracle comparison. Results are identical to the
  * unsalted join, which is exactly what the DuckDB oracle checks.
  */
object Skew {

  private val SaltBuckets = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_join" -> ((s, d) => {
      val fact = Tables.events(s, d)
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(SaltBuckets)))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .crossJoin(
          s.range(0, SaltBuckets).select(col("id").as("salt")))
      fact.join(dim,
        fact("user_id") === dim("c_custkey") && fact("salt") === dim("salt"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          graft.Exact.sumMoney(col("value")).as("v_sum"))
        .orderBy(col("c_mktsegment"))
    }),

    // Join-key skew profile — the diagnostic a planner (or an
    // engineer) runs BEFORE choosing a join strategy: the hottest
    // keys of a prospective join column with their absolute counts
    // and corpus share. A key near `total/shuffle_partitions` share
    // is the signal to salt (q_salted_join) or lean on AQE skew
    // handling. Shape at 100 TB: one map-side-combined per-key count
    // (the only full-data pass), a distributed top-k via
    // orderBy+limit (TakeOrderedAndProject — no global window sorts
    // the key space), and a 2-value broadcast aggregate; the rank
    // window runs over the 10 surviving rows. share_ppm is integer
    // math (parts-per-million via integer division) so the oracle
    // compares exactly — no double-rounding divergence.
    // Sketch-based JOIN-CARDINALITY estimation — the other number a
    // planner wants before committing to a join strategy (q_skew_keys
    // profiles the hot keys; this estimates distinct-key overlap):
    // one HLL sketch per side over the join column, union them, and
    // inclusion-exclusion gives the estimated key intersection —
    // |A∩B| ≈ |A| + |B| − |A∪B| — without ever joining. Each sketch
    // is one map-combined constant-size aggregate (the shape that
    // works when both sides are 100 TB and a dry-run join is
    // unaffordable); the exact intersection rides along as the
    // audit column (a key-only semi-join distinct — itself thin).
    // HLL insertion is order-independent, so the estimates are
    // deterministic; rows-only by contract (sketch internals),
    // JoinCardSpec pins each estimate within ±5% of exact.
    "q_join_card_est" -> ((s, d) => {
      val a = Tables.orders(s, d).select(col("o_orderkey").as("k"))
      val b = Tables.lineitem(s, d).select(col("l_orderkey").as("k"))
      val ska = a.agg(hll_sketch_agg(col("k"), lit(12)).as("sk"))
        .select(lit(1).as("j"), col("sk").as("ska"))
      val skb = b.agg(hll_sketch_agg(col("k"), lit(12)).as("sk"))
        .select(lit(1).as("j"), col("sk").as("skb"))
      val exact = a.distinct().join(b.distinct(), "k")
        .agg(count(lit(1)).as("exact_overlap"))
        .select(lit(1).as("j"), col("exact_overlap"))
      ska.join(skb, "j").join(exact, "j")
        .select(
          hll_sketch_estimate(col("ska")).as("est_a"),
          hll_sketch_estimate(col("skb")).as("est_b"),
          hll_sketch_estimate(hll_union(col("ska"), col("skb")))
            .as("est_union"),
          (hll_sketch_estimate(col("ska")) +
            hll_sketch_estimate(col("skb")) -
            hll_sketch_estimate(hll_union(col("ska"), col("skb"))))
            .as("est_overlap"),
          col("exact_overlap"))
    }),

    "q_skew_keys" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val freq = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      val tot = freq.agg(sum(col("n_events")).as("total"),
        count(lit(1)).as("n_keys"))
      val top = freq.orderBy(col("n_events").desc, col("user_id")).limit(10)
      val w = Window.orderBy(col("n_events").desc, col("user_id"))
      top.crossJoin(broadcast(tot))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .select(col("rnk"), col("user_id"), col("n_events"),
          expr("CAST(n_events * 1000000 DIV total AS BIGINT)").as("share_ppm"),
          col("n_keys"))
        .orderBy(col("rnk"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_skew_keys" ->
      """WITH freq AS (
        |  SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
        |tot AS (
        |  SELECT sum(n_events) AS total, count(*) AS n_keys FROM freq),
        |ranked AS (
        |  SELECT user_id, n_events,
        |    CAST(row_number() OVER (ORDER BY n_events DESC, user_id)
        |      AS BIGINT) AS rnk
        |  FROM freq)
        |SELECT rnk, user_id, n_events,
        |  CAST(n_events * 1000000 // total AS BIGINT) AS share_ppm, n_keys
        |FROM ranked, tot WHERE rnk <= 10 ORDER BY rnk""".stripMargin
  )
}
