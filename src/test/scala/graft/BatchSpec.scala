package graft

import org.apache.spark.sql.functions._

/** Length-bucketed batching family (text.Batching: q_batch_bucketize /
  * q_batch_plan). The DuckDB oracle hash-checks both end to end; these
  * specs replay the batch law independently in Scala over the corpus,
  * pin conservation, drive designed lengths (every bucket boundary,
  * the 2048 clamp, the exact rows_per_batch truncation) through the
  * production path, replay the plan readout, and pin the thin-exchange
  * plan.
  */
class BatchSpec extends SparkSpec {

  private def ceilOf(n: Long): Long =
    text.Batching.BucketCeilings.find(n <= _).getOrElse(2048L)

  test("batch replay: bucket ceilings, shard-local fill, exact accounting") {
    val docs = spark.read.parquet(sf + "/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val out = run("q_batch_bucketize").collect()
    // independent replay: group by (bucket, shard), fill in doc order
    val expected = docs
      .map { case (id, n) =>
        (ceilOf(n), id % text.Batching.BatchShards, id, n) }
      .groupBy(t => (t._1, t._2))
      .flatMap { case ((b, sh), members) =>
        val rpb = math.max(1L, text.Batching.BatchTokenBudget / b)
        members.sortBy(_._3).zipWithIndex
          .map { case (m, i) => (b, sh, i / rpb, m._3, m._4) }
          .groupBy(t => (t._1, t._2, t._3))
          .map { case ((bk, s2, seq), g) =>
            (bk, s2, seq) -> (g.size.toLong, g.map(_._4).min,
              g.map(_._4).max, g.map(_._5).sum) }
      }
    assert(out.length == expected.size)
    out.foreach { r =>
      val key = (r.getAs[Long]("bucket_len"), r.getAs[Long]("shard"),
        r.getAs[Long]("batch_seq"))
      val (nRows, first, last, real) = expected(key)
      assert(r.getAs[Long]("n_rows") == nRows, key)
      assert(r.getAs[Long]("first_doc") == first)
      assert(r.getAs[Long]("last_doc") == last)
      assert(r.getAs[Long]("real_tokens") == real)
      assert(r.getAs[Long]("padded_tokens") == nRows * key._1)
      assert(r.getAs[Long]("waste_pm") ==
        1000L - real * 1000L / (nRows * key._1))
      // a batch never exceeds its row capacity (oversize rows are
      // singleton batches)
      assert(nRows <= math.max(1L, text.Batching.BatchTokenBudget / key._1))
    }
    // conservation: every doc lands in exactly one batch
    assert(out.map(_.getAs[Long]("n_rows")).sum == docs.length.toLong)
    assert(out.map(_.getAs[Long]("real_tokens")).sum == docs.map(_._2).sum)
    // liveness: several buckets; full and partial batches both occur
    assert(out.map(_.getAs[Long]("bucket_len")).distinct.length >= 3)
    assert(out.exists(r => r.getAs[Long]("n_rows") ==
      math.max(1L,
        text.Batching.BatchTokenBudget / r.getAs[Long]("bucket_len"))))
    assert(out.exists(r => r.getAs[Long]("n_rows") <
      math.max(1L,
        text.Batching.BatchTokenBudget / r.getAs[Long]("bucket_len"))))
  }

  test("designed lengths: every boundary, the clamp, exact truncation") {
    val s = spark
    import s.implicits._
    // one doc at each boundary edge (16/17, 32/33, 64/65, ..., and a
    // 3000-token doc clamping into the 2048 bucket), all on shard 0,
    // plus 17 16-token docs on shard 0 to force the bucket-16
    // rows_per_batch = 16 truncation (16 full + 1 spill)
    def textOf(n: Int) = Seq.fill(n)("w").mkString(" ")
    val edges = Seq(16, 17, 32, 33, 64, 65, 128, 129, 256, 257, 512,
      513, 1024, 1025, 2048, 3000)
    val edgeDocs = edges.zipWithIndex.map { case (n, i) =>
      ((100L + i) * text.Batching.BatchShards, textOf(n)) }
    val fillers = (0 until 17).map(i =>
      ((500L + i) * text.Batching.BatchShards, textOf(12)))
    val out = text.Batching.batchesOf(
      (edgeDocs ++ fillers).toDF("doc_id", "text")).collect()
    val byBucket = out.groupBy(_.getAs[Long]("bucket_len"))
    // every ceiling is hit, and the clamp lands 2048+3000 together
    text.Batching.BucketCeilings.foreach(b => assert(byBucket.contains(b)))
    assert(byBucket(2048L).map(_.getAs[Long]("n_rows")).sum == 3L)
    // bucket 16: 17 fillers + the 16-token edge = 18 docs, 16 per
    // batch: one full batch + one 2-row spill
    val b16 = byBucket(16L).sortBy(_.getAs[Long]("batch_seq"))
    assert(b16.map(_.getAs[Long]("n_rows")).toSeq == Seq(16L, 2L))
    // doc order within the shard decides membership: the full batch
    // holds the 16 smallest doc_ids of the bucket
    assert(b16(0).getAs[Long]("last_doc") < b16(1).getAs[Long]("first_doc"))
  }

  test("plan readout replays from the batch table; savings beat naive padding") {
    val batches = run("q_batch_bucketize").collect()
    val plan = run("q_batch_plan").collect()
    val maxBucket = batches.map(_.getAs[Long]("bucket_len")).max
    val byBucket = batches.groupBy(_.getAs[Long]("bucket_len"))
    assert(plan.length == byBucket.size)
    plan.foreach { r =>
      val b = byBucket(r.getAs[Long]("bucket_len"))
      val nDocs = b.map(_.getAs[Long]("n_rows")).sum
      val real = b.map(_.getAs[Long]("real_tokens")).sum
      val padded = b.map(_.getAs[Long]("padded_tokens")).sum
      assert(r.getAs[Long]("n_docs") == nDocs)
      assert(r.getAs[Long]("n_batches") == b.length.toLong)
      assert(r.getAs[Long]("real_tokens") == real)
      assert(r.getAs[Long]("padded_tokens") == padded)
      assert(r.getAs[Long]("waste_pm") == 1000L - real * 1000L / padded)
      assert(r.getAs[Long]("naive_padded") == nDocs * maxBucket)
      assert(r.getAs[Long]("savings_pm") ==
        1000L - padded * 1000L / (nDocs * maxBucket))
    }
    // the whole point: every bucket below the max saves vs pad-to-max
    plan.filter(_.getAs[Long]("bucket_len") < maxBucket)
      .foreach(r => assert(r.getAs[Long]("savings_pm") > 0L))
    assert(plan.exists(_.getAs[Long]("savings_pm") > 500L))
  }

  test("epoch plan: water-filling replays; grants conserve the budget exactly") {
    val out = run("q_epoch_plan").collect().sortBy(_.getAs[Long]("q_rank"))
    val budget = out.head.getAs[Long]("budget")
    // quality order is the (mean_pm desc, source) total order
    out.sliding(2).foreach { p =>
      val (a, b) = (p(0), p(1))
      assert(a.getAs[Long]("mean_pm") > b.getAs[Long]("mean_pm") ||
        (a.getAs[Long]("mean_pm") == b.getAs[Long]("mean_pm") &&
          a.getAs[String]("source") < b.getAs[String]("source")))
    }
    // the prefix-sum law and the clamp, replayed
    var cum = 0L
    out.foreach { r =>
      assert(r.getAs[Long]("cum_before") == cum)
      val mg = text.Batching.MaxEpochs * r.getAs[Long]("n_tok")
      assert(r.getAs[Long]("max_grant") == mg)
      val g = math.max(0L, math.min(mg, budget - cum))
      assert(r.getAs[Long]("granted") == g)
      assert(r.getAs[Long]("epochs_mpm") == g * 1000 / r.getAs[Long]("n_tok"))
      assert(r.getAs[Boolean]("starved") == (g == 0L))
      cum += mg
    }
    // budget < 4x corpus here, so grants exhaust it exactly
    assert(out.map(_.getAs[Long]("granted")).sum == budget)
    // all three branches live
    assert(out.exists(r =>
      r.getAs[Long]("granted") == r.getAs[Long]("max_grant")))
    assert(out.exists(r => r.getAs[Long]("granted") > 0 &&
      r.getAs[Long]("granted") < r.getAs[Long]("max_grant")))
    assert(out.exists(_.getAs[Boolean]("starved")))
  }

  test("designed cells: exact boundary, over-budget, and tiny-budget plans") {
    val s = spark
    import s.implicits._
    // three equal sources of 100 tokens; budget = 2*300 = 600;
    // max grants 400 each: A full 400, B partial 200, C starved —
    // and the boundary between B and C is exact (cum 800 = budget+200)
    val cells = Seq(("A", 900L, 100L), ("B", 800L, 100L),
      ("C", 700L, 100L)).toDF("source", "mean_pm", "n_tok")
    val out = text.Batching.epochPlanOf(cells).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("A").getAs[Long]("granted") == 400L)
    assert(out("A").getAs[Long]("epochs_mpm") == 4000L)
    assert(out("B").getAs[Long]("granted") == 200L)
    assert(out("B").getAs[Long]("epochs_mpm") == 2000L)
    assert(out("C").getAs[Long]("granted") == 0L)
    assert(out("C").getAs[Boolean]("starved"))
    // a single tiny source: budget 2x exceeds nothing — the cap rules
    // (granted = min(4n, 2n) = 2n, nobody starves)
    val solo = Seq(("Z", 500L, 50L)).toDF("source", "mean_pm", "n_tok")
    val so = text.Batching.epochPlanOf(solo).collect().head
    assert(so.getAs[Long]("granted") == 100L)
    assert(so.getAs[Long]("epochs_mpm") == 2000L)
    assert(!so.getAs[Boolean]("starved"))
  }

  test("batch plan: thin exchanges only — text dies at the scan") {
    import org.apache.spark.sql.execution.exchange.Exchange
    for (q <- Seq("q_batch_bucketize", "q_batch_plan")) {
      val qe = run(q).queryExecution
      val p = qe.explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("SortMergeJoin"), q)
      qe.executedPlan.collect { case e: Exchange => e }.foreach { e =>
        assert(!e.child.output.exists(_.name == "text"),
          q + ": exchange carries text")
      }
    }
  }
}
