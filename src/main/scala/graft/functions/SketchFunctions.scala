package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter sketch functions for membership prefilters.
  *
  * Spark ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its internal join runtime filters (`InjectRuntimeFilter`) but does
  * not register them in the SQL function registry; this exposes the
  * same codepath as explicit functions so a query can state the
  * pattern directly: build a bloom filter over the small side's keys
  * (one aggregate → a few MB of bits regardless of key count), then
  * prefilter the large side AT THE SCAN with `might_contain` — no
  * false negatives, so an exact verify join over the surviving rows
  * returns the exact answer while the join input shrinks to the
  * match fraction. At 100 TB this replaces broadcasting a huge id set
  * with shipping a constant-size sketch.
  *
  * `BloomFilterMightContain` requires its filter argument to be
  * foldable or a scalar subquery, so consumers express the filter as
  * a SQL scalar subquery (see `q_bloom_semijoin`).
  */
object SketchFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
