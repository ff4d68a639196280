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
