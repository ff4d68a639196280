package graft

/** RETRO assembly (q_retro_assemble): the leakage-exclusion /
  * survivor-rank / mask-cost law, driven synthetically through the
  * production arithmetic (corpus embeddings are text-independent, so
  * same-cluster neighbors are rare in the real graph at test SF — the
  * designed drive covers leading-excluded, trailing-self-excluded,
  * all-excluded, and graph-absent cases), plus corpus-wide law replay
  * and the thin-plan pin.
  */
class RetroAssembleSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("synthetic drive: exclusion, survivor rank, retro-off, cost law") {
    val sess = spark
    import sess.implicits._
    val lens = Seq.tabulate(6)(i => (i + 1L, (i + 1) * 10L))
      .toDF("doc_id", "dl")
    val labels = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_keeper")
    val graph = Seq(
      (1L, 1L, 2L), (1L, 2L, 3L), (1L, 3L, 4L),  // leading excluded
      (2L, 1L, 1L), (2L, 2L, 5L),                 // excluded + one kept
      (3L, 1L, 6L), (3L, 2L, 4L), (3L, 3L, 5L),   // none excluded
      (4L, 1L, 5L), (4L, 2L, 3L), (4L, 3L, 4L),   // trailing SELF-excluded
      (6L, 1L, 6L)                                 // only self → all excluded
    ).toDF("vid", "rk", "nid")
    val out = sim.Similarity.retroOf(graph, labels, lens)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))
    val expected = Seq(
      // (doc, nbr1, nbr2, n_excl, n_ctx, ctx, tgt, total, trainable, mask_pm)
      (1L, 3L, 4L, 1L, 2L, 74L, 10L, 86L, 11L, 127L),
      (2L, 5L, -1L, 1L, 1L, 52L, 20L, 74L, 21L, 283L),
      (3L, 6L, 4L, 0L, 2L, 104L, 30L, 136L, 31L, 227L),
      (4L, 5L, 3L, 1L, 2L, 84L, 40L, 126L, 41L, 325L),
      (5L, -1L, -1L, 0L, 0L, 0L, 50L, 52L, 51L, 980L),
      (6L, -1L, -1L, 1L, 0L, 0L, 60L, 62L, 61L, 983L))
    assert(out.toSeq == expected)
  }

  test("corpus law replay: exclusion honored, survivors are lowest-rank kept, costs conserve") {
    val rows = run("q_retro_assemble").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "one row per training doc")
    val cluster = dedup.Dedup.clusterLabels(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ck(x: Long) = cluster.getOrElse(x, x)
    val graph = sim.Similarity.knnGraphLayout(spark, sf)
      .select(col("vid"), col("rk"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { case (doc, n1, n2, nExcl, nCtx, ctx, tgt, total, trn) =>
      assert(total == ctx + tgt + 2 && trn == tgt + 1, s"cost law $doc")
      assert(nCtx >= 0 && nCtx <= 2)
      Seq(n1, n2).filter(_ >= 0).foreach { n =>
        assert(n != doc && ck(n) != ck(doc), s"leakage: $doc retrieved $n")
      }
      // replay the survivor rank from the written graph
      val nb = graph.getOrElse(doc, Array.empty).sortBy(_._2)
      val keptIds = nb.filter(t => ck(t._3) != ck(doc)).map(_._3)
      assert(nExcl == nb.count(t => ck(t._3) == ck(doc)))
      assert(n1 == keptIds.headOption.getOrElse(-1L), s"nbr1 of $doc")
      assert(n2 == keptIds.drop(1).headOption.getOrElse(-1L), s"nbr2 of $doc")
    }
    // the exclusion path is proven by the synthetic drive above; if
    // the corpus graph happens to contain same-cluster neighbors,
    // they must all have been excluded (checked per-row already)
  }

  test("assemble plan is thin: no exchange outputs text or embedding") {
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = sim.Similarity.retroOf(
        sim.Similarity.knnGraphLayout(spark, sf),
        dedup.Dedup.clusterLabels(spark, sf),
        text.TextOps.docStats(spark, sf))
      val ex = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      assert(ex.nonEmpty)
      ex.foreach { e =>
        assert(!e.output.exists(a =>
          a.name == "text" || a.name == "embedding"), e.toString)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }
}

/** NIAH eval construction (q_niah_build): full brute-force replay of
  * the window tiling, needle law, and fingerprints from raw text,
  * plus the bounded-pool pushdown pin that makes eval-build cost
  * O(grid) instead of O(corpus).
  */
class NiahSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("grid, tiling, needle and fingerprints replay from raw text") {
    val rows = run("q_niah_build").collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getString(5), r.getLong(6),
          r.getString(7), r.getString(8)))).toMap
    assert(rows.size ==
      text.Corpus.NiahLens.size * text.Corpus.NiahDepthsPm.size *
        text.Corpus.NiahReps.toInt, "grid incomplete")
    val docs = Tables.documents(spark, sf)
      .filter(col("doc_id") < text.Corpus.NiahPoolDocs)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val toks = docs.map { case (id, t) => (id, t.split(" ").toSeq) }
    val stream = toks.flatMap(_._2)
    // doc boundaries for the n_docs replay
    val spans = toks.scanLeft((0L, 0L, 0L)) { case ((_, _, end), (id, tk)) =>
      (id, end, end + tk.length)
    }.drop(1)
    for (l <- text.Corpus.NiahLens; rep <- 0L until text.Corpus.NiahReps) {
      val win = stream.slice((rep * l).toInt, ((rep + 1) * l).toInt)
      assert(win.length == l, s"window ($l, $rep) not fully formed")
      val nd = spans.count { case (_, s0, e) => s0 < (rep + 1) * l && e > rep * l }
      for (depth <- text.Corpus.NiahDepthsPm) {
        val pos = ((l - 7) * depth / 1000).toInt
        val key = md5hex(s"$l:$depth:$rep").take(8)
        val answer = java.lang.Long.parseLong(md5hex(key).take(4), 16) % 1000
        val needle = Seq("needle", "key", key, "holds", "value",
          answer.toString, "end")
        val render = win.take(pos) ++ needle ++ win.drop(pos + 7)
        assert(render.length == l, "needle replacement must preserve L")
        val got = rows((l, depth, rep))
        assert(got == ((nd, pos.toLong, key, answer,
          md5hex(win.mkString(" ")), md5hex(render.mkString(" ")))),
          s"example ($l, $depth, $rep)")
      }
    }
  }

  test("pool predicate reaches the parquet scan: eval build is O(grid), not O(corpus)") {
    val df = text.Corpus.niahOf(text.Corpus.niahPool(spark, sf))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains(s"LessThan(doc_id,${text.Corpus.NiahPoolDocs}"),
      "doc_id pool bound not pushed to the scan")
  }
}
