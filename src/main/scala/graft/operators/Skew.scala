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
    })
  )

  val oracle: Map[String, String] = Map(
    "q_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
