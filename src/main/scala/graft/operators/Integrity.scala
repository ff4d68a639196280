package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-integrity operators: an order-independent table checksum and a
  * single-pass per-column profile — the validation passes a warehouse
  * runs after every ingest.
  *
  * The checksum is the distributed analog of the reference's per-page
  * CRC32 (reference src/aligned.rs:61-64, checked on every typed-page
  * downcast): where potpot verifies 16 KiB pages on read, a 100 TB
  * table verifies itself with a per-row digest folded through a
  * commutative reduce — order-independent, so it is identical across
  * partitionings, engines, and shuffles, and any single-row corruption
  * changes it. One full scan, map-side partial sums, a 1-row result.
  *
  * The profile (rows = columns) is the Deequ/expectations shape: null
  * counts, distinct cardinalities, min/max per column in ONE pass
  * over the table. It ships as a twin pair: `q_profile_table` (exact
  * countDistinct — the audit form; its 4-way distinct plans an EXPAND
  * that multiplies the scan ~5× and shuffles full column
  * cardinalities) and `q_profile_table_approx` (approx_count_distinct
  * — HLL sketches, no EXPAND, one map-combined aggregate; the 100 TB
  * DEFAULT). ProfileTwinSpec pins the twins' non-distinct columns
  * identical and their distincts within ±5% at test scale.
  */
object Integrity {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Constraint suite (the Deequ/Great-Expectations check run): five
    // named expectations over orders/lineitem — not-null, uniqueness,
    // value range, accepted values, referential integrity — each
    // reported as (chk, status, violations). Shape at 100 TB: the
    // three row-local checks share ONE map-combined aggregate over
    // one scan (stack() fans the 1-row result into report rows — no
    // EXPAND, unlike exact multi-distinct); uniqueness is a thin
    // key-only group-by (never count-distinct in the shared agg);
    // the FK check is a LEFT ANTI join on the key. Fully oracled.
    "q_validate_constraints" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val rowLocal = o.agg(
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nn"),
          sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("rp"),
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
            .otherwise(0L)).as("av"))
        .select(expr("""stack(3,
          |  'not_null_custkey', nn,
          |  'range_totalprice_pos', rp,
          |  'accepted_status_values', av) AS (chk, violations)""".stripMargin))
      val uq = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(coalesce(sum(col("c") - 1), lit(0L)).as("violations"))
        .select(lit("unique_orderkey").as("chk"), col("violations"))
      val fk = Tables.lineitem(s, d).select(col("l_orderkey"))
        .join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("fk_lineitem_orders").as("chk"), col("violations"))
      rowLocal.unionAll(uq).unionAll(fk)
        .select(col("chk"),
          when(col("violations") === 0, "pass").otherwise("fail")
            .as("status"),
          col("violations").cast("long").as("violations"))
        .orderBy(col("chk"))
    }),

    // Order-independent integrity checksum over a canonical row
    // string: first 8 md5 hex chars → int64, summed exactly in
    // DECIMAL(38,0) (no int64 wrap — a plain BIGINT sum of 32-bit
    // digests overflows past ~4.3e9 rows, i.e. exactly at the 100 TB
    // scale this targets, and Spark wraps where DuckDB widens to
    // HUGEINT, breaking cross-engine parity), then reduced mod 10^18
    // so the published checksum is a plain int64 in every engine.
    // DECIMAL(38,0) holds the exact sum to ~2e28 rows. Commutative ⇒
    // partition-order independent ⇒ cross-engine comparable.
    "q_table_checksum" -> ((s, d) => {
      val rowStr = concat_ws("|", col("o_orderkey").cast("string"),
        col("o_orderstatus"),
        graft.Exact.money(col("o_totalprice")).cast("string"))
      Tables.orders(s, d)
        .select(conv(substring(md5(rowStr.cast("binary")), 1, 8), 16, 10)
          .cast("decimal(38,0)").as("h"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(col("h")) % lit(1000000000000000000L))
            .cast("long").as("checksum"))
    }),

    // Single-pass table profile: one wide aggregate computes every
    // column's stats, then pivots to a row per column via a literal
    // struct array — no second scan, no driver-side collect. Exact
    // audit form — see the scaladoc; q_profile_table_approx is the
    // 100 TB default.
    "q_profile_table" -> ((s, d) =>
      profile(s, d, c => countDistinct(c))),

    // Approximate profile twin — the 100 TB DEFAULT: byte-identical
    // plan shape except every exact countDistinct becomes an
    // approx_count_distinct HLL sketch (rsd 2%), so the plan carries
    // NO EXPAND (the exact form multiplies the scan ~5× through
    // Expand) and no full-cardinality distinct shuffle — one
    // map-side-combined aggregate pass, partial sketches merged.
    // Rows-only by contract (estimates); ProfileTwinSpec pins the
    // non-distinct columns identical to the exact form and every
    // distinct estimate within ±5% at test scale.
    "q_profile_table_approx" -> ((s, d) =>
      profile(s, d, c => approx_count_distinct(c, 0.02))),

    // Distribution DRIFT monitor — the data-quality gate between
    // ingest batches: total-variation distance between each year's
    // order-price distribution and the base year's, over 10 fixed
    // price buckets. TVD = ½·Σ|pA−pB| is the RATIONAL drift measure
    // (PSI's Σ(pA−pB)·ln(pA/pB) needs libm and diverges on empty
    // buckets — TVD is the same monotone alarm without either
    // failure mode, the q_doc_diversity rationale). Buckets come
    // from exact DECIMAL cents (integer div — no float boundary can
    // disagree across engines), the (year, bucket) histogram is ONE
    // map-combined thin aggregate densified against the literal
    // bucket range, and the per-mille arithmetic is all-integer —
    // bit-stable under any partitioning. Fully oracled.
    "q_drift_tvd" -> ((s, d) => {
      val counts = Tables.orders(s, d)
        .select(year(col("o_orderdate")).cast("long").as("y"),
          expr("least(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " div 5000000, 9L)").as("bucket"))
        .groupBy(col("y"), col("bucket")).agg(count(lit(1)).as("n"))
      val years = counts.select(col("y")).distinct()
      val dense = years
        .crossJoin(s.range(0, 10).toDF("bucket"))
        .join(counts, Seq("y", "bucket"), "left")
        .select(col("y"), col("bucket"), coalesce(col("n"), lit(0L)).as("n"))
      val tot = dense.groupBy(col("y")).agg(sum(col("n")).as("tot"))
      val pm = dense.join(broadcast(tot), "y")
        .select(col("y"), col("bucket"), expr("n * 1000 div tot").as("pm"))
      val base = pm.join(broadcast(tot.agg(min(col("y")).as("y"))), "y")
        .select(col("bucket"), col("pm").as("base_pm"))
      pm.join(broadcast(base), "bucket")
        .groupBy(col("y"))
        .agg(expr("sum(abs(pm - base_pm)) div 2").as("tvd_pm"))
        .join(tot, "y")
        .select(col("y"), col("tot").as("n_orders"), col("tvd_pm"))
        .orderBy(col("y"))
    }),

    // Mergeable distinct-count sketches as a WRITTEN layout — the
    // third member of the distinct family (exact `q_profile_table`,
    // one-shot sketch `q_approx_distinct`): per-(group, shard) HLL
    // sketch PARTIALS (Apache DataSketches HllSketch via Spark's
    // hll_sketch_agg) persisted once at ingest, then ANY later
    // rollup — per-group or global — is answered by unioning
    // kilobyte sketches, never rescanning the table. That
    // mergeability is what exact partial counts cannot do (distinct
    // doesn't sum across shards) and what makes the pattern the
    // 100 TB default for dashboard-grade cardinalities: the layout is
    // groups×shards rows of ~KB sketches regardless of table size,
    // and the union query reads ONLY the layout (PlanSpec pins the
    // scan). The global "(all)" row unions the same partials across
    // groups — one written artifact serving every rollup level.
    // Rows-only by contract (estimates); HllPartialSpec pins every
    // estimate within ±5% of the exact countDistinct and the exact
    // row counts summing through the partials unchanged.
    "q_hll_partial_union" -> ((s, d) => {
      val p = hllPartials(s, d)
      val per = p.groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .as("approx_parts"),
          sum(col("n_rows")).as("n_rows"))
        .select(col("l_returnflag").as("flag"), col("approx_parts"),
          col("n_rows"))
      val glob = p
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .as("approx_parts"),
          sum(col("n_rows")).as("n_rows"))
        .select(lit("(all)").as("flag"), col("approx_parts"), col("n_rows"))
      per.unionAll(glob).orderBy(col("flag"))
    }),

    // Sketch-based set-OVERLAP estimation via inclusion-exclusion —
    // the audience/retention overlap question (how many of 1996's
    // customers already ordered in 1995?) answered from per-year HLL
    // sketches: |A∩B| ≈ |A| + |B| − |A∪B|, where all three terms are
    // sketch estimates and the union is the native HLL merge. At
    // 100 TB the per-period sketches are the written artifact (the
    // q_hll_partial_union layout family) and every pairwise overlap
    // across ANY two periods is a kilobyte-sized merge — no fact
    // rescan, no distinct join. Inclusion-exclusion inflates relative
    // error when the overlap is small (the documented sketch-algebra
    // caveat); rows-only, spec pins ±10% of the exact intersection at
    // this overlap ratio plus exact consistency bounds.
    "q_hll_intersection" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(year(col("o_orderdate")).as("y"), col("o_custkey"))
        .filter(col("y").isin(1995, 1996))
      val sk = o.groupBy(col("y"))
        .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("sk"),
          count(lit(1)).as("n_rows"))
        .localCheckpoint()
      val per = sk.select(col("y"), hll_sketch_estimate(col("sk")).as("est"))
      val a = per.filter(col("y") === 1995).select(col("est").as("est_a"))
      val b = per.filter(col("y") === 1996).select(col("est").as("est_b"))
      val u = sk.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est_union"))
      a.crossJoin(b).crossJoin(u)
        .select(col("est_a"), col("est_b"), col("est_union"),
          (col("est_a") + col("est_b") - col("est_union"))
            .cast("long").as("est_overlap"))
    }),

    // Mergeable QUANTILE layout — the percentile member of the
    // partial-layout family (HLL → distincts, moments → mean/std,
    // bitmap → exact distincts, THIS → quantiles): per (flag, shard),
    // a 16-bucket equi-depth histogram of l_extendedprice (17 exact
    // within-shard cut points + the shard count) written once; any
    // later quantile rollup merges histograms by WEIGHT — each shard
    // bucket carries count/16 rows — and reads the cut point where
    // cumulative weight crosses p. The t-digest/KLL shape with a
    // deterministic construction: within-shard cuts are exact
    // percentiles (per-file sorts at ingest), the merge is one
    // explode + cumulative-sum window over groups×shards×17 rows —
    // metadata-sized forever. Rows-only (estimate); QuantilePartialSpec
    // pins every estimate within the inter-shard spread of the exact
    // percentile and the weights summing to the table count.
    "q_quantile_partial_union" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = quantilePartials(s, d)
      val pts = h.select(col("l_returnflag").as("flag"), col("n_rows"),
        posexplode(col("cuts")))
        .select(col("flag"), col("pos"), col("col").as("cut"),
          // bucket weight: cut i (i>0) closes a bucket of n/16 rows;
          // cut 0 (the min) carries no mass
          when(col("pos") === 0, lit(0.0))
            .otherwise(col("n_rows") / lit(16.0)).as("w"))
      def estAt(p: Double, tag: String): DataFrame = {
        val wc = Window.partitionBy(col("flag"))
          .orderBy(col("cut"), col("pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy(col("flag"))
        pts.withColumn("cum", sum(col("w")).over(wc))
          .withColumn("need", sum(col("w")).over(tot) * p)
          .filter(col("cum") >= col("need"))
          .groupBy(col("flag"))
          .agg(min(col("cut")).as("est"))
          .select(col("flag"), lit(tag).as("p"),
            round(col("est"), 2).as("est"))
      }
      estAt(0.25, "p25").unionAll(estAt(0.5, "p50"))
        .unionAll(estAt(0.75, "p75")).unionAll(estAt(0.95, "p95"))
        .orderBy(col("flag"), col("p"))
    })
  )

  /** The quantile-partial layout: per (l_returnflag, shard), the 17
    * exact equi-depth cut points (p = 0/16 … 16/16) of
    * l_extendedprice within the shard plus the shard row count. At
    * scale the shard is the file/partition: exact per-file quantiles
    * are one local sort at ingest, and the layout is
    * groups×shards×17 doubles regardless of table size.
    */
  private[graft] def quantilePartials(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.ensureLayout(s, d, "quantile_partials") {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          pmod(xxhash64(col("l_orderkey")), lit(16)).as("shard"))
        .agg(expr("percentile(l_extendedprice, " +
          "array(0D, 0.0625D, 0.125D, 0.1875D, 0.25D, 0.3125D, 0.375D, " +
          "0.4375D, 0.5D, 0.5625D, 0.625D, 0.6875D, 0.75D, 0.8125D, " +
          "0.875D, 0.9375D, 1D))").as("cuts"),
          count(lit(1)).as("n_rows"))
    }

  /** The sketch-partial layout: one HllSketch per (l_returnflag,
    * shard) over l_partkey, 16 hash shards per group (at scale:
    * file/partition granularity), lgConfigK=12 (~2.5 KB max, <1.6%
    * rse). Written once per corpus (`Layouts.ensureLayout`),
    * re-attached by later sessions; the build is one map-side-
    * combined aggregate pass over lineitem.
    */
  private[graft] def hllPartials(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.ensureLayout(s, d, "hll_partials") {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          pmod(xxhash64(col("l_orderkey")), lit(16)).as("shard"))
        .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"),
          count(lit(1)).as("n_rows"))
    }

  /** Shared single-pass profile body; `dct` supplies the distinct
    * aggregator (exact vs sketch) — the ONLY difference between the
    * twins, so their agreement is a property of the sketch, not of
    * two drifting implementations.
    */
  private def profile(s: SparkSession, d: String,
      dct: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
      val price = graft.Exact.money(col("o_totalprice"))
      val a = Tables.orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        count(col("o_orderkey")).as("nn_key"),
        dct(col("o_orderkey")).as("d_key"),
        min(col("o_orderkey")).cast("string").as("min_key"),
        max(col("o_orderkey")).cast("string").as("max_key"),
        count(col("o_orderstatus")).as("nn_st"),
        dct(col("o_orderstatus")).as("d_st"),
        min(col("o_orderstatus")).as("min_st"),
        max(col("o_orderstatus")).as("max_st"),
        count(col("o_totalprice")).as("nn_pr"),
        dct(price).as("d_pr"),
        min(price).cast("string").as("min_pr"),
        max(price).cast("string").as("max_pr"),
        count(col("o_orderdate")).as("nn_dt"),
        dct(col("o_orderdate")).as("d_dt"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("min_dt"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("max_dt"),
        count(col("o_orderpriority")).as("nn_pri"),
        dct(col("o_orderpriority")).as("d_pri"),
        min(col("o_orderpriority")).as("min_pri"),
        max(col("o_orderpriority")).as("max_pri"))
      def row(name: String, nn: String, dc: String, mn: String, mx: String) =
        struct(lit(name).as("col_name"), col("n_rows"),
          col(nn).as("n_nonnull"), col(dc).as("n_distinct"),
          col(mn).as("min_val"), col(mx).as("max_val"))
      a.select(explode(array(
          row("o_orderkey", "nn_key", "d_key", "min_key", "max_key"),
          row("o_orderstatus", "nn_st", "d_st", "min_st", "max_st"),
          row("o_totalprice", "nn_pr", "d_pr", "min_pr", "max_pr"),
          row("o_orderdate", "nn_dt", "d_dt", "min_dt", "max_dt"),
          row("o_orderpriority", "nn_pri", "d_pri", "min_pri", "max_pri")))
          .as("p"))
        .select(col("p.*"))
        .orderBy(col("col_name"))
  }

  val oracle: Map[String, String] = Map(
    "q_drift_tvd" ->
      """WITH b AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |    least(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      // 5000000, 9) AS bucket
        |  FROM orders),
        |c AS (SELECT y, bucket, count(*) AS n FROM b GROUP BY 1, 2),
        |dense AS (
        |  SELECT y, g.bucket, coalesce(c.n, 0) AS n
        |  FROM (SELECT DISTINCT y FROM c) ys
        |  CROSS JOIN (SELECT unnest(range(0, 10)) AS bucket) g
        |  LEFT JOIN c USING (y, bucket)),
        |tot AS (SELECT y, CAST(sum(n) AS BIGINT) AS tot FROM dense GROUP BY 1),
        |pm AS (SELECT d.y, d.bucket, CAST(d.n * 1000 // t.tot AS BIGINT) AS pm
        |  FROM dense d JOIN tot t USING (y)),
        |base AS (SELECT bucket, pm AS base_pm FROM pm
        |  WHERE y = (SELECT min(y) FROM tot))
        |SELECT p.y, t.tot AS n_orders,
        |  CAST(sum(abs(p.pm - b2.base_pm)) // 2 AS BIGINT) AS tvd_pm
        |FROM pm p JOIN base b2 USING (bucket) JOIN tot t ON t.y = p.y
        |GROUP BY p.y, t.tot ORDER BY p.y""".stripMargin,
    "q_validate_constraints" ->
      """WITH oc AS (SELECT
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS rp,
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS av
        |  FROM orders),
        |uq AS (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS v FROM (
        |    SELECT count(*) AS c FROM orders GROUP BY o_orderkey) g
        |  WHERE c > 1),
        |fk AS (SELECT CAST(count(*) AS BIGINT) AS v FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
        |rws AS (
        |  SELECT 'not_null_custkey' AS chk, nn AS violations FROM oc
        |  UNION ALL SELECT 'range_totalprice_pos', rp FROM oc
        |  UNION ALL SELECT 'accepted_status_values', av FROM oc
        |  UNION ALL SELECT 'unique_orderkey', v FROM uq
        |  UNION ALL SELECT 'fk_lineitem_orders', v FROM fk)
        |SELECT chk,
        |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status,
        |  violations
        |FROM rws ORDER BY chk""".stripMargin,
    "q_table_checksum" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(('0x' || substr(md5(
        |    CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)), 1, 8)
        |  )::BIGINT) % 1000000000000000000 AS BIGINT) AS checksum
        |FROM orders""".stripMargin,
    "q_profile_table" ->
      """WITH s AS (SELECT
        |  count(*) AS n_rows,
        |  count(o_orderkey) AS nn_key, count(DISTINCT o_orderkey) AS d_key,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_key,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_key,
        |  count(o_orderstatus) AS nn_st, count(DISTINCT o_orderstatus) AS d_st,
        |  min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st,
        |  count(o_totalprice) AS nn_pr,
        |  count(DISTINCT CAST(o_totalprice AS DECIMAL(18,2))) AS d_pr,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS min_pr,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS max_pr,
        |  count(o_orderdate) AS nn_dt, count(DISTINCT o_orderdate) AS d_dt,
        |  strftime(min(CAST(o_orderdate AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS min_dt,
        |  strftime(max(CAST(o_orderdate AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS max_dt,
        |  count(o_orderpriority) AS nn_pri,
        |  count(DISTINCT o_orderpriority) AS d_pri,
        |  min(o_orderpriority) AS min_pri, max(o_orderpriority) AS max_pri
        |FROM orders)
        |SELECT * FROM (
        |  SELECT 'o_orderkey' AS col_name, n_rows, nn_key AS n_nonnull,
        |         d_key AS n_distinct, min_key AS min_val, max_key AS max_val
        |  FROM s
        |  UNION ALL SELECT 'o_orderstatus', n_rows, nn_st, d_st, min_st, max_st FROM s
        |  UNION ALL SELECT 'o_totalprice', n_rows, nn_pr, d_pr, min_pr, max_pr FROM s
        |  UNION ALL SELECT 'o_orderdate', n_rows, nn_dt, d_dt, min_dt, max_dt FROM s
        |  UNION ALL SELECT 'o_orderpriority', n_rows, nn_pri, d_pri, min_pri, max_pri FROM s)
        |ORDER BY col_name""".stripMargin
  )
}
