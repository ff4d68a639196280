package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic OLAP operators the reference's query surface implies but no
  * earlier round carried: Pareto-frontier (skyline), interval-overlap
  * join, the remaining ranking/navigation window functions (ntile /
  * nth_value / ignore-nulls navigation), rolling exact medians, a
  * mergeable exact-moments layout (the exact twin of the HLL partial
  * layout), bitmap-word exact distinct counting, and linear gap
  * interpolation (the value-series twin of q_gap_fill's zero fill).
  *
  * Scale stance shared by the file: every operator pre-aggregates to a
  * DOMAIN-bounded or value-bounded intermediate before any global step
  * (distinct price/size points, 7-day bins, 64-key bitmap words,
  * 16-shard moment partials), so the one global pass each needs runs
  * over data whose size is set by the value domain, not the row count.
  */
object Olap {

  /** Interval-overlap join bin width (days). Intervals explode into
    * the bins they span (≤ ceil(len/7)+1 rows each) and only same-bin
    * pairs are tested — the standard binned interval join: candidate
    * count is Σ per-bin |A_bin|·|B_bin| instead of |A|·|B|, linear in
    * overlap density. Width trades fan-out (short bins) against
    * per-bin pair volume (long bins); 7 days ≳ the interval lengths
    * here, so each interval lands in ≤ 2 bins.
    */
  val OverlapBinDays = 7

  /** Deterministic interval sets for q_interval_join: two sparse order
    * subsets (co-prime moduli so the sets are disjoint-ish but
    * date-interleaved), A holding 4-day windows, B 6-day windows.
    */
  private def intervals(s: SparkSession, d: String, m: Int, len: Int,
      key: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") % m === 0)
      .select(col("o_orderkey").as(key),
        col("o_orderdate").cast("date").as(s"${key}_s"),
        date_add(col("o_orderdate").cast("date"), len).as(s"${key}_e"))

  /** Exact per-group moment partials (n, Σx, Σx²) over
    * l_extendedprice, 16 hash shards per return flag — the EXACT twin
    * of `Integrity.hllPartials`: partials are algebraic (merge = sum),
    * so any rollup (per-flag, global, or a slice of shards) derives
    * from the written layout without rescanning facts. Sums are
    * DECIMAL (18,2 / 30,4): merge order cannot perturb them, which is
    * what makes the merged moments EQUAL to a direct pass — the
    * property the oracle checks. At 100 TB the shard column is the
    * file/partition id and the layout doubles as a per-file statistics
    * table.
    */
  private[graft] def momentPartials(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.ensureLayout(s, d, "moment_partials") {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          pmod(xxhash64(col("l_orderkey")), lit(16)).as("shard"))
        .agg(count(lit(1)).as("n"),
          sum(graft.Exact.money(col("l_extendedprice"))).as("s1"),
          sum((col("l_extendedprice") * col("l_extendedprice"))
            .cast("decimal(30,4)")).as("s2"))
    }

  /** Published moments are ROUNDED to 6 decimals: the merged Σx²
    * decimal exceeds 2^53 at sf0.1 (…16 significant digits), and the
    * engines' DECIMAL→DOUBLE casts round that overflow differently by
    * one ulp (measured: std differed at the 12th significant digit at
    * sf0.1 only). The decimals themselves are still exact — the round
    * happens after the single IEEE derivation, same as q_anomaly_mad.
    */
  private def momentsOf(df: DataFrame, flag: Column): DataFrame =
    df.select(flag.as("flag"), col("n"), col("s1"), col("s2"))
      .groupBy(col("flag"))
      .agg(sum(col("n")).as("n_rows"),
        sum(col("s1")).cast("double").as("s1d"),
        sum(col("s2")).cast("double").as("s2d"))
      .select(col("flag"), col("n_rows"),
        round(col("s1d") / col("n_rows"), 6).as("mean"),
        round(sqrt((col("s2d") - col("s1d") * col("s1d") / col("n_rows"))
          / (col("n_rows") - 1)), 6).as("std"))

  /** The full trend/seasonal/residual table behind
    * q_seasonal_decompose — shared with the residual anomaly detector.
    */
  private[graft] def seasonalTable(s: SparkSession, d: String): DataFrame = {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_seconds(date_trunc('DAY', ts)) div 86400").as("day_no"))
        .agg(sum(graft.Exact.money(col("value"))).as("v"))
        .select(col("event_type"), col("day_no"),
          (col("v") * 100).cast("long").as("v_cents"))
      val spine = daily.groupBy(col("event_type"))
        .agg(min(col("day_no")).as("d0"), max(col("day_no")).as("d1"))
        .select(col("event_type").as("et"),
          explode(expr("sequence(d0, d1)")).as("day_no"))
      val g = spine.join(daily,
          col("et") === col("event_type") && spine("day_no") === daily("day_no"),
          "left")
        .select(col("et"), spine("day_no").as("day_no"),
          coalesce(col("v_cents"), lit(0L)).as("v_cents"))
      val w7 = Window.partitionBy(col("et")).orderBy(col("day_no"))
        .rowsBetween(-3, 3)
      // localCheckpoint: the trend table feeds BOTH the seasonal
      // aggregate and the final join — without the barrier Catalyst
      // recomputes the whole corpus-wide daily aggregate once per
      // consumer; the table it snapshots is spine-sized (types ×
      // days), metadata-scale at any corpus size
      val t = g
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("trend_cents",
          when(col("n7") === 7,
            floor(sum(col("v_cents")).over(w7) / lit(7)).cast("long")))
        .localCheckpoint()
      val seas = t.filter(col("trend_cents").isNotNull)
        .groupBy(col("et").as("set"), (col("day_no") % 7).as("dow"))
        .agg(sum(col("v_cents") - col("trend_cents")).as("sdev"),
          count(lit(1)).as("ndev"))
        .select(col("set"), col("dow"),
          floor(col("sdev") / col("ndev")).cast("long").as("seas_cents"))
      t.join(broadcast(seas),
          col("et") === col("set") && (col("day_no") % 7) === col("dow"),
          "left")
        .select(col("et").as("event_type"), col("day_no"), col("v_cents"),
          col("trend_cents"),
          when(col("trend_cents").isNotNull, col("seas_cents"))
            .as("seas_cents"),
          when(col("trend_cents").isNotNull,
            col("v_cents") - col("trend_cents") - col("seas_cents"))
            .as("resid_cents"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Skyline (Pareto frontier): the undominated (price, size) points
    // of the part catalog — minimize retail price, maximize size. A
    // point is dominated iff another is no worse on both axes and
    // strictly better on one. Shape: first collapse parts to DISTINCT
    // (price, size) points with multiplicity (a value-domain-bounded
    // aggregate — the skyline of the points IS the skyline of the
    // rows), then one ordered pass: sorted by (price asc, size desc),
    // a point survives iff its size exceeds the running max over all
    // strictly-preceding points (any dominator sorts earlier, and an
    // earlier point with size ≥ mine dominates me). The global window
    // runs over the distinct-point set only; skyline is algebraic
    // under union, so at 100 TB a per-partition local skyline pass
    // prunes before this final domain-sized step.
    "q_skyline" -> ((s, d) => {
      val pts = Tables.part(s, d)
        .groupBy(col("p_retailprice").as("price"), col("p_size").as("size"))
        .agg(count(lit(1)).as("n_parts"))
      val w = Window.orderBy(col("price").asc, col("size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      pts.withColumn("rmax", max(col("size")).over(w))
        .filter(col("rmax").isNull || col("size") > col("rmax"))
        .select(col("price"), col("size"), col("n_parts"))
        .orderBy(col("price"))
    }),

    // Interval-overlap join: both sides are interval sets (4-day vs
    // 6-day order windows) and a pair matches iff the intervals
    // overlap — the log-correlation / genomics / outage-vs-deploy
    // join. Implemented BINNED: each interval explodes into the 7-day
    // bins it touches, pairs meet on a bin equi-join (never a
    // cartesian), duplicates from multi-bin overlaps collapse via
    // distinct, and the exact overlap predicate verifies. Candidate
    // volume is Σ_bin |A_b|·|B_b| — linear in true overlap density
    // for bounded interval length, the property that holds at 100 TB.
    "q_interval_join" -> ((s, d) => {
      val epoch = to_date(lit("1970-01-01"))
      def binned(df: DataFrame, k: String) = df.select(col(k),
          col(s"${k}_s"), col(s"${k}_e"),
          explode(sequence(
            (datediff(col(s"${k}_s"), epoch) / OverlapBinDays)
              .cast("long"),
            (datediff(col(s"${k}_e"), epoch) / OverlapBinDays)
              .cast("long"))).as("bin"))
      val a = binned(intervals(s, d, 199, 3, "a_key"), "a_key")
      val b = binned(intervals(s, d, 211, 5, "b_key"), "b_key")
      a.join(b, "bin")
        .filter(col("a_key_s") <= col("b_key_e") &&
          col("b_key_s") <= col("a_key_e"))
        .select(col("a_key"), col("b_key"),
          (datediff(least(col("a_key_e"), col("b_key_e")),
            greatest(col("a_key_s"), col("b_key_s"))) + 1)
            .cast("long").as("overlap_days"))
        .distinct()
        .orderBy(col("a_key"), col("b_key"))
    }),

    // Ranking/navigation window family not covered by q_window_rank /
    // q_window_lag: ntile quartiles, first/nth value over a running
    // frame, and IGNORE NULLS navigation (the "last known good value"
    // idiom sparse telemetry needs). One window pass over a sparse
    // order subset; per-priority partitions keep every frame bounded
    // and the ROWS frames are running (no per-row rescans).
    "q_window_ntile" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .filter(col("o_orderkey") % 37 === 0)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          when(col("o_orderkey") % 5 =!= 0, col("o_totalprice")).as("npx"))
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("top_price", first(col("o_totalprice")).over(run))
        .withColumn("third_price", nth_value(col("o_totalprice"), 3).over(run))
        .withColumn("last_npx", last(col("npx"), ignoreNulls = true).over(run))
        .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
          col("o_orderkey"))
    }),

    // Rolling EXACT median (+ envelope) over each user's last 25
    // events — the robust smoother for noisy per-entity telemetry
    // (q_ewma's mean-based twin; medians shrug off the spikes
    // q_anomaly_mad hunts).
    //
    // Formulated as 25 O(1) lag offsets + one sorted-array projection,
    // NOT as percentile()/min()/max() aggregates over a 25-row sliding
    // frame: Spark evaluates a sliding-frame aggregate by REBUILDING
    // the whole buffer every time the frame slides (no retraction), so
    // the imperative percentile paid a per-row OpenHashMap build +
    // sort, ×3 aggregates — 3.1 s at sf0.1 for 100k rows. The offset
    // frames are O(1)/row pointer reads and the 25-element sort runs
    // in the codegen'd projection (~0.6 s; OPTIMIZATION_r17.md).
    //
    // Exact equivalence with the old form (oracle unchanged,
    // re-proven at both SFs): filtering nulls from the lag array is
    // precisely the aggregates' null-skipping; the median replays
    // Percentile.getPercentile's arithmetic — position p = 0.5·(n−1),
    // exact element when p is integral (odd n), else the weighted form
    // (higher−p)·lo + (p−lower)·hi with both weights exactly 0.5 —
    // and min/max are the sorted frame's endpoints. The published
    // median is rounded: the two engines' midpoint interpolation can
    // differ in the last ulp.
    "q_rolling_median" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val frameVals = col("value") +:
        (1 to 24).map(k => lag(col("value"), k).over(w))
      val n = size(col("frame"))
      def at(i: Column) = element_at(col("frame"), i)
      // Column./ is double division; the quotients here are exact in
      // double for n <= 25, so the int cast recovers the exact index.
      val medEven = lit(0.5) * at((n / 2).cast("int")) +
        lit(0.5) * at((n / 2 + 1).cast("int"))
      Tables.events(s, d)
        .withColumn("frame",
          sort_array(filter(array(frameVals: _*), v => v.isNotNull)))
        .select(col("user_id"), col("event_id"), col("value"),
          round(when(n === 0, lit(null).cast("double"))
            .when(n % 2 === 1, at(((n + 1) / 2).cast("int")))
            .otherwise(medEven), 6).as("med25"),
          when(n > 0, at(lit(1))).as("lo25"),
          when(n > 0, at(n)).as("hi25"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Mergeable exact-moments rollup: mean/std per return flag AND
    // globally, derived ONLY from the written 16-shard partial layout
    // (`momentPartials`) — never rescanning lineitem. Because the
    // partials are exact decimals, merged moments equal a direct pass
    // bit-for-bit, which is precisely what the oracle (computing from
    // raw facts) certifies. The production shape: per-file moment
    // partials make any later mean/variance rollup a metadata-sized
    // read, the exact counterpart of q_hll_partial_union's sketch
    // rollup.
    "q_moments_merge" -> ((s, d) => {
      val p = momentPartials(s, d)
      momentsOf(p, col("l_returnflag"))
        .unionAll(momentsOf(p, lit("(all)")))
        .orderBy(col("flag"))
    }),

    // INCREMENTAL moments maintenance — the delta path of
    // q_moments_merge (the statistics analog of q_dedup_incremental):
    // a fresh batch (a re-priced order slice standing in for today's
    // ingest) aggregates to its own exact partials, and the updated
    // corpus statistics are the merge of the WRITTEN layout with the
    // batch partials — the historical facts are never rescanned.
    // Algebraic-exactness is the whole point: because the partials
    // are decimals, layout ∪ delta ≡ a full recompute bit-for-bit,
    // which is precisely what the oracle (computing directly over the
    // unioned facts) certifies. Cost: one aggregate over the BATCH
    // plus a metadata-sized merge, at any history size.
    "q_moments_incremental" -> ((s, d) => {
      val batch = Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 101 === 0)
        .select(col("l_returnflag"),
          (col("l_extendedprice") + 10.0).as("p"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(graft.Exact.money(col("p"))).as("s1"),
          sum((col("p") * col("p")).cast("decimal(30,4)")).as("s2"))
      val all = momentPartials(s, d)
        .select(col("l_returnflag"), col("n"), col("s1"), col("s2"))
        .unionAll(batch)
      momentsOf(all, col("l_returnflag"))
        .unionAll(momentsOf(all, lit("(all)")))
        .orderBy(col("flag"))
    }),

    // Bitmap-word exact distinct: distinct customers per order year
    // via 64-key bitmap blocks — key → (block, bit), bit_or the words
    // per (year, block), popcount and sum. Every stage is a
    // map-side-combinable aggregate on a domain-bounded key space
    // (keyspace/64 words max, dense in practice), so unlike
    // count(DISTINCT) the shuffle carries fixed-width words rather
    // than one row per distinct key — and the (year, block) word
    // table is itself a mergeable layout: OR-ing two corpora's words
    // gives the union's exact distinct count without touching either
    // fact table. The oracle's plain COUNT(DISTINCT) certifies
    // exactness.
    "q_bitmap_distinct" -> ((s, d) =>
      Tables.orders(s, d)
        .select(year(col("o_orderdate")).as("o_year"),
          (col("o_custkey") / 64).cast("long").as("blk"),
          expr("shiftleft(1L, CAST(o_custkey % 64 AS INT))").as("bit"))
        .groupBy(col("o_year"), col("blk"))
        .agg(expr("bit_or(bit)").as("w"))
        .groupBy(col("o_year"))
        .agg(sum(expr("bit_count(w)")).cast("long").as("n_cust"))
        .orderBy(col("o_year"))),

    // Classical seasonal decomposition (trend + day-of-week seasonal
    // + residual) of the per-type daily value series — the moving-
    // average STL precursor every metrics pipeline runs before
    // anomaly thresholds. Determinism discipline: the series is exact
    // CENTS on a zero-filled daily spine (missing day = zero traffic,
    // the q_gap_fill stance, which also makes the 7-day window
    // CONTIGUOUS by construction); dow = epoch-day mod 7 (no
    // engine-specific week-start convention); trend and seasonal are
    // floor(exact-integer-sum / exact-count) — integer sums are
    // < 2^53, so the double division and floor are bit-identical
    // cross-engine even where deviations go negative (floor, not
    // truncate, is what DuckDB's // does — using floor() explicitly
    // keeps Spark's div out of negative-operand territory). Shape:
    // one map-combined daily aggregate, a broadcast spine join, one
    // (type) window exchange, one bounded (type, dow) aggregate
    // broadcast back. Residual = v − trend − seasonal, exact.
    "q_seasonal_decompose" -> ((s, d) =>
      seasonalTable(s, d).orderBy(col("event_type"), col("day_no"))),


    // Residual anomaly detection over the DECOMPOSED series — the
    // "decompose, then threshold what's left" discipline: raw-value
    // thresholds fire on every weekend (seasonality) and every growth
    // quarter (trend); thresholding the RESIDUAL finds days that are
    // anomalous relative to their own expected shape. Composes
    // `seasonalTable` with the q_anomaly_mad robust score: per-type
    // median/MAD of the residuals (bounded aggregates over the
    // spine-sized table), flag |resid − med| > 3.5·MAD. Every residual
    // is an exact integer and the medians are exact halves (multiples
    // of 0.5 are exact doubles), so the comparison is deterministic
    // cross-engine with no rounding crutch; published deviations ride
    // as exact ×2 integers. Fully oracled.
    "q_anomaly_stl" -> ((s, d) => {
      val t = seasonalTable(s, d).filter(col("resid_cents").isNotNull)
        .localCheckpoint()
      val med = t.groupBy(col("event_type").as("met"))
        .agg(expr("percentile(resid_cents, 0.5D)").as("med"))
      val dev = t.join(broadcast(med), col("event_type") === col("met"))
        .withColumn("dev", abs(col("resid_cents") - col("med")))
      val mad = dev.groupBy(col("met").as("mmet"))
        .agg(expr("percentile(dev, 0.5D)").as("mad"))
      dev.join(broadcast(mad), col("met") === col("mmet"))
        .filter(col("dev") > lit(3.5) * col("mad"))
        .select(col("event_type"), col("day_no"), col("v_cents"),
          col("resid_cents"),
          (col("dev") * 2).cast("long").as("dev_x2"),
          (col("mad") * 2).cast("long").as("mad_x2"))
        .orderBy(col("event_type"), col("day_no"))
    }),

    // Market-basket ASSOCIATION rules (support / confidence / lift)
    // over co-purchased part pairs — the classic affinity analysis:
    // lift = P(a,b) / (P(a)·P(b)) > 1 flags genuinely associated
    // items against the popularity baseline. All-integer per-mille /
    // cpm arithmetic (lift_cpm = 100·n_ab·N div (n_a·n_b)); pair
    // counts come from the bounded per-order fan-out (C(items,2),
    // order width ≤ 7) with map-side combine, item counts from one
    // thin aggregate broadcast back, top-50 via TakeOrderedAndProject.
    //
    // Shape: the distinct (order, part) projection is consumed by
    // FOUR readers (the order-count scalar, the item counts, both
    // self-join sides), so it is localCheckpoint'd ONCE — without the
    // barrier lineitem's scan + distinct shuffle would replay per
    // consumer (exchange reuse only covers the self-join's identical
    // twins). N_orders stays INSIDE the plan as a broadcast 1-row
    // aggregate (the q_token_budget scalar-fold rule) rather than a
    // driver-side count(): no eager job at construction time, no
    // frozen literal. Fully oracled.
    "q_market_basket" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .localCheckpoint()
      val nOrd = li.agg(countDistinct(col("ok")).as("n_orders"))
      val item = li.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
      val pair = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 3)
      pair
        .join(broadcast(item.select(col("pk").as("a"), col("n_item").as("n_a"))), "a")
        .join(broadcast(item.select(col("pk").as("b"), col("n_item").as("n_b"))), "b")
        .crossJoin(broadcast(nOrd))
        .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
          expr("n_ab * 1000000 div n_orders").as("support_ppm"),
          expr("n_ab * 1000 div n_a").as("conf_ab_pm"),
          expr("100 * n_ab * n_orders div (n_a * n_b)").as("lift_cpm"))
        .orderBy(col("lift_cpm").desc, col("n_ab").desc, col("a"), col("b"))
        .limit(50)
    }),

    // Linear gap interpolation — q_gap_fill's value twin: missing
    // 10-minute buckets of the per-type value series get the linear
    // blend of their nearest observed neighbours instead of zeros
    // (edges extend the nearest observation). All-integer arithmetic:
    // values aggregate to exact CENTS, bucket positions are epoch
    // divs, and the blend is the non-negative weighted form
    // (prev·(gap−step) + next·step) div gap — floor and truncate
    // agree on non-negatives, so the engines cannot drift. Shape: the
    // spine join is q_gap_fill's (bounded by time span); the
    // interpolation is two IGNORE NULLS navigation windows per
    // direction over the spine — linear, partitioned by type.
    "q_gap_interp" -> ((s, d) => {
      val buckets = Tables.events(s, d)
        .groupBy(col("event_type"), window(col("ts"), "10 minutes"))
        .agg(sum(graft.Exact.money(col("value"))).as("v"))
        .select(col("event_type"), col("window.start").as("w_start"),
          (col("v") * 100).cast("long").as("v_cents"))
      val spine = buckets.groupBy(col("event_type"))
        .agg(min(col("w_start")).as("t0"), max(col("w_start")).as("t1"))
        .select(col("event_type").as("et"),
          explode(expr("sequence(t0, t1, interval 10 minutes)")).as("ws"))
      val g = spine.join(buckets,
          col("et") === col("event_type") && col("ws") === col("w_start"),
          "left")
        .select(col("et"), col("ws"),
          expr("unix_seconds(ws) div 600").as("idx"), col("v_cents"))
      // BOTH directions as RUNNING frames: Spark evaluates a
      // (currentRow, unboundedFollowing) frame by rescanning the tail
      // per row — O(n²) per partition (measured 9.5 s at sf0.1); the
      // DESCENDING running frame is the same forward navigation in
      // O(n), at the cost of one extra sort over the reused exchange
      val wb = Window.partitionBy(col("et")).orderBy(col("idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("et")).orderBy(col("idx").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("pv", last(col("v_cents"), ignoreNulls = true).over(wb))
        .withColumn("pi", last(when(col("v_cents").isNotNull, col("idx")),
          ignoreNulls = true).over(wb))
        .withColumn("nv", last(col("v_cents"), ignoreNulls = true).over(wf))
        .withColumn("ni", last(when(col("v_cents").isNotNull, col("idx")),
          ignoreNulls = true).over(wf))
        .select(col("et").as("event_type"), col("ws").as("w_start"),
          when(col("v_cents").isNotNull, lit("obs"))
            .otherwise(lit("interp")).as("src"),
          when(col("v_cents").isNotNull, col("v_cents"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(expr(
              "(pv * (ni - idx) + nv * (idx - pi)) div (ni - pi)"))
            .as("v_cents"))
        .orderBy(col("event_type"), col("w_start"))
    })
  )

  /** The seasonal-decomposition oracle CTE chain, ending in `dec` —
    * shared by the q_seasonal_decompose oracle and the residual
    * anomaly oracle.
    */
  private val seasonalOracleBody: String =
    """WITH daily AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP)))
        |      AS BIGINT) // 86400 AS day_no,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS BIGINT) AS v_cents
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type AS et,
        |    unnest(generate_series(min(day_no), max(day_no))) AS day_no
        |  FROM daily GROUP BY event_type),
        |g AS (
        |  SELECT s.et, s.day_no, coalesce(d.v_cents, 0) AS v_cents
        |  FROM s LEFT JOIN daily d
        |    ON s.et = d.event_type AND s.day_no = d.day_no),
        |t AS (
        |  SELECT et, day_no, v_cents,
        |    CASE WHEN count(*) OVER w7 = 7
        |      THEN CAST(floor(CAST(sum(v_cents) OVER w7 AS DOUBLE) / 7)
        |        AS BIGINT) END AS trend_cents
        |  FROM g
        |  WINDOW w7 AS (PARTITION BY et ORDER BY day_no
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |seas AS (
        |  SELECT et, day_no % 7 AS dow,
        |    CAST(floor(CAST(sum(v_cents - trend_cents) AS DOUBLE)
        |      / count(*)) AS BIGINT) AS seas_cents
        |  FROM t WHERE trend_cents IS NOT NULL GROUP BY 1, 2),
        |dec AS (
        |  SELECT t.et AS event_type, t.day_no, t.v_cents, t.trend_cents,
        |    CASE WHEN t.trend_cents IS NOT NULL THEN se.seas_cents END
        |      AS seas_cents,
        |    CASE WHEN t.trend_cents IS NOT NULL
        |      THEN t.v_cents - t.trend_cents - se.seas_cents END
        |      AS resid_cents
        |  FROM t LEFT JOIN seas se
        |    ON t.et = se.et AND t.day_no % 7 = se.dow)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_skyline" ->
      """WITH pts AS (
        |  SELECT p_retailprice AS price, p_size AS size,
        |    count(*) AS n_parts
        |  FROM part GROUP BY 1, 2),
        |w AS (
        |  SELECT price, size, n_parts,
        |    max(size) OVER (ORDER BY price ASC, size DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rmax
        |  FROM pts)
        |SELECT price, size, n_parts FROM w
        |WHERE rmax IS NULL OR size > rmax
        |ORDER BY price""".stripMargin,
    "q_interval_join" ->
      """WITH a AS (
        |  SELECT o_orderkey AS a_key, CAST(o_orderdate AS DATE) AS a_s,
        |    CAST(o_orderdate AS DATE) + 3 AS a_e
        |  FROM orders WHERE o_orderkey % 199 = 0),
        |b AS (
        |  SELECT o_orderkey AS b_key, CAST(o_orderdate AS DATE) AS b_s,
        |    CAST(o_orderdate AS DATE) + 5 AS b_e
        |  FROM orders WHERE o_orderkey % 211 = 0)
        |SELECT a_key, b_key,
        |  CAST(date_diff('day', greatest(a_s, b_s), least(a_e, b_e))
        |    + 1 AS BIGINT) AS overlap_days
        |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
        |ORDER BY a_key, b_key""".stripMargin,
    "q_window_ntile" ->
      """WITH base AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CASE WHEN o_orderkey % 5 <> 0 THEN o_totalprice END AS npx
        |  FROM orders WHERE o_orderkey % 37 = 0)
        |SELECT o_orderpriority, o_orderkey, o_totalprice, npx,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  first_value(o_totalprice) OVER wr AS top_price,
        |  nth_value(o_totalprice, 3) OVER wr AS third_price,
        |  last_value(npx IGNORE NULLS) OVER wr AS last_npx
        |FROM base
        |WINDOW w AS (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey),
        |  wr AS (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_rolling_median" ->
      """SELECT user_id, event_id, value,
        |  round(quantile_cont(value, 0.5) OVER wf, 6) AS med25,
        |  min(value) OVER wf AS lo25,
        |  max(value) OVER wf AS hi25
        |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        |      FROM events) e
        |WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_moments_merge" ->
      """WITH m AS (
        |  SELECT l_returnflag AS flag, count(*) AS n_rows,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS s1d,
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice
        |      AS DECIMAL(30,4))) AS DOUBLE) AS s2d
        |  FROM lineitem GROUP BY 1
        |  UNION ALL
        |  SELECT '(all)', count(*),
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice
        |      AS DECIMAL(30,4))) AS DOUBLE)
        |  FROM lineitem)
        |SELECT flag, n_rows, round(s1d / n_rows, 6) AS mean,
        |  round(sqrt((s2d - s1d * s1d / n_rows) / (n_rows - 1)), 6) AS std
        |FROM m ORDER BY flag""".stripMargin,
    "q_moments_incremental" ->
      """WITH u AS (
        |  SELECT l_returnflag, l_extendedprice AS p FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, l_extendedprice + 10.0 FROM lineitem
        |  WHERE l_orderkey % 101 = 0),
        |m AS (
        |  SELECT l_returnflag AS flag, count(*) AS n_rows,
        |    CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS s1d,
        |    CAST(sum(CAST(p * p AS DECIMAL(30,4))) AS DOUBLE) AS s2d
        |  FROM u GROUP BY 1
        |  UNION ALL
        |  SELECT '(all)', count(*),
        |    CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE),
        |    CAST(sum(CAST(p * p AS DECIMAL(30,4))) AS DOUBLE)
        |  FROM u)
        |SELECT flag, n_rows, round(s1d / n_rows, 6) AS mean,
        |  round(sqrt((s2d - s1d * s1d / n_rows) / (n_rows - 1)), 6) AS std
        |FROM m ORDER BY flag""".stripMargin,
    "q_bitmap_distinct" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  count(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anomaly_stl" -> (seasonalOracleBody +
      """,
        |r AS (SELECT * FROM dec WHERE resid_cents IS NOT NULL),
        |med AS (SELECT event_type, quantile_cont(resid_cents, 0.5) AS med
        |  FROM r GROUP BY 1),
        |dev AS (
        |  SELECT r.event_type, r.day_no, r.v_cents, r.resid_cents,
        |    abs(r.resid_cents - m.med) AS dev
        |  FROM r JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, d.day_no, d.v_cents, d.resid_cents,
        |  CAST(d.dev * 2 AS BIGINT) AS dev_x2,
        |  CAST(m.mad * 2 AS BIGINT) AS mad_x2
        |FROM dev d JOIN mad m USING (event_type)
        |WHERE d.dev > 3.5 * m.mad
        |ORDER BY d.event_type, d.day_no""".stripMargin),
    "q_market_basket" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
        |item AS (SELECT pk, count(*) AS n_item FROM li GROUP BY 1),
        |pair AS (
        |  SELECT x.pk AS a, y.pk AS b, count(*) AS n_ab
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p.a, p.b, p.n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
        |  p.n_ab * 1000000 // n.n_orders AS support_ppm,
        |  p.n_ab * 1000 // ia.n_item AS conf_ab_pm,
        |  100 * p.n_ab * n.n_orders // (ia.n_item * ib.n_item) AS lift_cpm
        |FROM pair p
        |JOIN item ia ON p.a = ia.pk JOIN item ib ON p.b = ib.pk
        |CROSS JOIN n
        |ORDER BY lift_cpm DESC, n_ab DESC, a, b LIMIT 50""".stripMargin,
    "q_seasonal_decompose" -> (seasonalOracleBody +
      """
        |SELECT * FROM dec ORDER BY event_type, day_no""".stripMargin),

    "q_gap_interp" ->
      """WITH b AS (
        |  SELECT event_type,
        |    time_bucket(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP))
        |      AS w_start,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS BIGINT) AS v_cents
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type,
        |    unnest(generate_series(min(w_start), max(w_start),
        |                           INTERVAL 10 MINUTE)) AS w_start
        |  FROM b GROUP BY event_type),
        |g AS (
        |  SELECT s.event_type AS et, s.w_start AS ws,
        |    CAST(epoch(s.w_start) AS BIGINT) // 600 AS idx, b.v_cents
        |  FROM s LEFT JOIN b ON s.event_type = b.event_type
        |                    AND s.w_start = b.w_start),
        |n AS (
        |  SELECT et, ws, idx, v_cents,
        |    last_value(v_cents IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN v_cents IS NOT NULL THEN idx END
        |      IGNORE NULLS) OVER wb AS pi,
        |    first_value(v_cents IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN v_cents IS NOT NULL THEN idx END
        |      IGNORE NULLS) OVER wf AS ni
        |  FROM g
        |  WINDOW wb AS (PARTITION BY et ORDER BY idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wf AS (PARTITION BY et ORDER BY idx
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT et AS event_type, ws AS w_start,
        |  CASE WHEN v_cents IS NOT NULL THEN 'obs' ELSE 'interp' END
        |    AS src,
        |  CASE WHEN v_cents IS NOT NULL THEN v_cents
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE (pv * (ni - idx) + nv * (idx - pi)) // (ni - pi)
        |  END AS v_cents
        |FROM n ORDER BY event_type, w_start""".stripMargin
  )
}
