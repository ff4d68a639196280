package graft

import org.apache.spark.sql.functions._

/** Arena pairwise-evaluation family (text.Arena: q_arena_battles /
  * q_arena_leaderboard). The DuckDB oracle hash-checks both end to
  * end; these specs replay the battle verdict and the Copeland
  * rollup independently in Scala from the cell stats, pin the
  * battle-count identity and tie liveness, drive a constructed exact
  * tie through the production path, and pin the broadcast-only plan.
  */
class ArenaSpec extends SparkSpec {

  test("battle replay: verdicts follow the exact per-mille means; ties live") {
    val cells = text.Arena.cellsOf(
      text.Sft.microScored(spark, sf)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("mean_pm"))).toMap
    val out = run("q_arena_battles").collect()
    // every same-lang ordered pair battles exactly once
    val langs = cells.keys.groupBy(_._1)
    val expectedN = langs.values
      .map(ks => ks.size.toLong * (ks.size - 1) / 2).sum
    assert(out.length.toLong == expectedN)
    out.foreach { r =>
      val l = r.getAs[String]("lang")
      val (na, ma) = cells((l, r.getAs[String]("src_a")))
      val (nb, mb) = cells((l, r.getAs[String]("src_b")))
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
      assert(r.getAs[Long]("mean_a_pm") == ma)
      assert(r.getAs[Long]("mean_b_pm") == mb)
      val expect = if (ma > mb) "a" else if (ma < mb) "b" else "tie"
      assert(r.getAs[String]("winner") == expect)
    }
    // measured liveness: both directions and the tie all occur
    val ws = out.map(_.getAs[String]("winner")).toSet
    assert(ws == Set("a", "b", "tie"))
  }

  test("constructed exact tie and both directions through the production path") {
    val s = spark
    import s.implicits._
    // cells built directly: A vs B tie exactly (same per-mille mean
    // from different raw sums), A beats C, C loses to B
    val cells = Seq(
      ("en", "A", 4L, 2000000L),  // mean_pm = 500
      ("en", "B", 2L, 1000000L),  // mean_pm = 500 — exact tie with A
      ("en", "C", 5L, 1000000L))  // mean_pm = 200
      .toDF("lang", "source", "n", "tot")
      .withColumn("mean_pm", expr("tot * 1000 div (n * 1000000)"))
    val battles = text.Arena.battlesOf(cells).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[String]("winner")).toMap
    assert(battles(("A", "B")) == "tie")
    assert(battles(("A", "C")) == "a")
    // winner names the SIDE: in (B, C), B sits on side a and wins
    assert(battles(("B", "C")) == "a")
    // leaderboard: A and B tie on Copeland 1; source order breaks it
    val lb = text.Arena.leaderboardOf(
      text.Arena.battlesOf(cells)).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(lb("A").getAs[Long]("copeland") == 1L)
    assert(lb("B").getAs[Long]("copeland") == 1L)
    assert(lb("C").getAs[Long]("copeland") == -2L)
    assert(lb("A").getAs[Long]("rank") == 1L)
    assert(lb("B").getAs[Long]("rank") == 2L)
    assert(lb("C").getAs[Long]("rank") == 3L)
    assert(lb("A").getAs[Long]("ties") == 1L)
    assert(lb("C").getAs[Long]("win_pm") == 0L)
  }

  test("leaderboard replays from the battle table; credit conserves") {
    val battles = run("q_arena_battles").collect()
    val lb = run("q_arena_leaderboard").collect()
    // every battle credits both sides once
    assert(lb.map(_.getAs[Long]("n_battles")).sum ==
      2L * battles.length)
    assert(lb.map(_.getAs[Long]("wins")).sum ==
      battles.count(_.getAs[String]("winner") != "tie").toLong)
    assert(lb.map(_.getAs[Long]("wins")).sum ==
      lb.map(_.getAs[Long]("losses")).sum)
    assert(lb.map(_.getAs[Long]("ties")).sum ==
      2L * battles.count(_.getAs[String]("winner") == "tie"))
    // copeland sums to zero over the full tournament
    assert(lb.map(_.getAs[Long]("copeland")).sum == 0L)
    // replay per source
    val per = battles.flatMap { r =>
      val w = r.getAs[String]("winner")
      Seq(
        (r.getAs[String]("src_a"),
          if (w == "a") 1L else 0L, if (w == "b") 1L else 0L,
          if (w == "tie") 1L else 0L),
        (r.getAs[String]("src_b"),
          if (w == "b") 1L else 0L, if (w == "a") 1L else 0L,
          if (w == "tie") 1L else 0L))
    }.groupBy(_._1)
    lb.foreach { r =>
      val g = per(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_battles") == g.length.toLong)
      assert(r.getAs[Long]("wins") == g.map(_._2).sum)
      assert(r.getAs[Long]("losses") == g.map(_._3).sum)
      assert(r.getAs[Long]("ties") == g.map(_._4).sum)
      assert(r.getAs[Long]("win_pm") ==
        g.map(_._2).sum * 1000 / g.length)
    }
    // ranks are the total (copeland desc, source) order
    val sorted = lb.sortBy(r =>
      (-r.getAs[Long]("copeland"), r.getAs[String]("source")))
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") == i + 1L)
    }
  }

  test("length bias replays pairwise from the pool; the corpus is genuinely shorter-biased") {
    val pool = text.Sft.samplePool(spark, sf, ":lb")
      .select(col("lang"), col("source"), col("doc_id"), col("samp"),
        col("s6i")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))
    val lenOf = spark.read.parquet(sf + "/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val out = run("q_length_bias").collect()
    val byTask = pool.groupBy(p => (p._1, p._2))
    // tasks with ≥ 2 members publish; singletons have no pairs
    assert(out.length == byTask.count(_._2.length >= 2))
    out.foreach { r =>
      val members = byTask((r.getAs[String]("lang"), r.getAs[String]("source")))
      val pairs = for {
        i <- members; j <- members if i._4 < j._4
      } yield (lenOf(i._3) - lenOf(j._3)) * (i._5 - j._5)
      assert(r.getAs[Long]("n_pairs") == pairs.length.toLong)
      assert(r.getAs[Long]("concordant") == pairs.count(_ > 0).toLong)
      assert(r.getAs[Long]("discordant") == pairs.count(_ < 0).toLong)
      assert(r.getAs[Long]("tied") == pairs.count(_ == 0).toLong)
      val tau = (pairs.count(_ > 0).toLong - pairs.count(_ < 0)) * 1000 /
        pairs.length
      assert(r.getAs[Long]("tau_pm") == tau)
    }
    // the real finding: this reward runs shorter-biased (duplication
    // grows with length under a bounded vocabulary)
    assert(out.count(_.getAs[String]("direction") == "shorter") >
      out.length / 2)
  }

  test("designed pools drive both bias signs and the exact-zero tie") {
    val s = spark
    import s.implicits._
    // task L: reward rises with length (concordant); task S: falls;
    // task N: one concordant, one discordant, one exactly-tied pair
    // (equal rewards) — conc = disc → neutral, tau 0
    val rows = Seq(
      ("en", "L", 1, 10L, 100L), ("en", "L", 2, 20L, 200L),
      ("en", "L", 3, 30L, 300L),
      ("en", "S", 1, 10L, 300L), ("en", "S", 2, 20L, 200L),
      ("en", "S", 3, 30L, 100L),
      ("en", "N", 1, 10L, 200L), ("en", "N", 2, 20L, 100L),
      ("en", "N", 3, 30L, 200L))
      .toDF("lang", "source", "samp", "n_tok", "s6i")
    val out = text.Arena.lengthBiasOf(rows).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("L").getAs[String]("direction") == "longer")
    assert(out("L").getAs[Long]("tau_pm") == 1000L)
    assert(out("S").getAs[String]("direction") == "shorter")
    assert(out("S").getAs[Long]("tau_pm") == -1000L)
    assert(out("N").getAs[String]("direction") == "neutral")
    assert(out("N").getAs[Long]("tau_pm") == 0L)
    assert(out("N").getAs[Long]("concordant") ==
      out("N").getAs[Long]("discordant"))
  }

  test("arena plan: corpus never reaches the pairwise stage; battles broadcast") {
    import org.apache.spark.sql.execution.exchange.Exchange
    for (q <- Seq("q_arena_battles", "q_arena_leaderboard")) {
      val qe = run(q).queryExecution
      val p = qe.explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("SortMergeJoin"), q)
      assert(p.contains("BroadcastHashJoin"), q)
      qe.executedPlan.collect { case e: Exchange => e }.foreach { e =>
        assert(!e.child.output.exists(_.name == "text"),
          q + ": exchange carries text")
      }
    }
  }
}
