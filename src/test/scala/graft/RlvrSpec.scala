package graft

import org.apache.spark.sql.functions._

/** Verifiable-reward RL family (text.Sft: q_verify_rewards /
  * q_grpo_advantage / q_self_consistency). The DuckDB oracle
  * hash-checks all three end to end; these specs pin what the oracle
  * can't state: each grader's exact FLIP POINT on designed synthetic
  * conversations (the corpus splits every grader both ways but never
  * isolates a boundary), the assignment law (reward ≡ the boolean the
  * hash names), the GRPO exactness budget (BigInt numerators + the
  * one-IEEE-triple replay, Σadv = 0, the zero-variance convention),
  * and the majority-vote tiebreak on a constructed tie.
  */
class RlvrSpec extends SparkSpec {

  /** The engines' fp8 (first 8 md5 hex chars as a long), replayed on
    * the JVM so the test can CHOOSE event sequences relative to the
    * hash-assigned keyword/check.
    */
  private def fp8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def requiredKw(convId: Long): String =
    text.Sft.VrKeywords((fp8(convId + ":vr") % 5).toInt)
  private def assignedCheck(convId: Long): String =
    text.Sft.VrChecks((fp8(convId + ":vrc") % 4).toInt)

  /** Build a keyed conversation: per assistant turn (event_type, k,
    * content-token-count); user filler turns interleave so assistant
    * turns land on even rn, the production parity.
    */
  private def mkConv(convId: Long,
      asst: Seq[(String, Long, Int)]): Seq[(Long, Long, Long, String, String, String)] =
    asst.zipWithIndex.flatMap { case ((et, k, nTok), i) =>
      val uid = convId * 1000 + 2 * i
      Seq(
        (convId, uid, uid, "view", "{\"k\": 1}", "u"),
        (convId, uid + 1, uid + 1, et, s"""{"k": $k}""",
          Seq.fill(nTok)("w").mkString(" ")))
    }

  test("graders flip at their exact thresholds on designed conversations") {
    val s = spark
    import s.implicits._
    val kw1 = requiredKw(1L)
    val other1 = text.Sft.VrKeywords.filterNot(_ == kw1)
    // conv 1 passes ALL FOUR at the boundary: 10 assistant turns of
    // 10 tokens (resp = 100 = VrMinRespTokens), 7 required-keyword
    // turns in a row (kw_hits = 7 = VrMinKeywordHits, 6 repeats =
    // VrMaxRepeats exactly), 3 distinct non-kw tails (no new
    // repeats), last k even
    val conv1 = mkConv(1L,
      Seq.fill(7)((kw1, 3L, 10)) ++
        Seq((other1(0), 5L, 10), (other1(1), 7L, 10), (other1(2), 42L, 10)))
    val kw2 = requiredKw(2L)
    val other2 = text.Sft.VrKeywords.filterNot(_ == kw2)
    // conv 2 fails ALL FOUR one step past each boundary: 9 turns of
    // 11 tokens (resp = 99), 6 kw hits (one short), 6×kw + 3×other
    // runs = 5 + 2 = 7 repeats (one over), last k odd
    val conv2 = mkConv(2L,
      Seq.fill(6)((kw2, 2L, 11)) ++ Seq.fill(3)((other2(0), 9L, 11)))
    // conv 3: single assistant turn — the lag-null edge (rep_n = 0)
    val conv3 = mkConv(3L, Seq(("view", 8L, 4)))
    val keyed = (conv1 ++ conv2 ++ conv3)
      .toDF("conv_id", "ts", "event_id", "event_type", "props", "content")
    val out = text.Sft.verifyRewardsOf(keyed)
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap

    val r1 = out(1L)
    assert(r1.getAs[String]("required_kw") == kw1)
    assert(r1.getAs[Long]("resp_tokens") == 100L)
    assert(r1.getAs[Long]("kw_hits") == 7L)
    assert(r1.getAs[Long]("rep_n") == 6L)
    assert(r1.getAs[Long]("last_k") == 42L)
    Seq("g_length", "g_keyword", "g_parity", "g_norepeat")
      .foreach(c => assert(r1.getAs[Boolean](c), s"conv1 $c"))
    assert(r1.getAs[Long]("n_pass") == 4L)
    assert(r1.getAs[String]("assigned_check") == assignedCheck(1L))
    assert(r1.getAs[Long]("reward") == 1L)

    val r2 = out(2L)
    assert(r2.getAs[Long]("resp_tokens") == 99L)
    assert(r2.getAs[Long]("kw_hits") == 6L)
    assert(r2.getAs[Long]("rep_n") == 7L)
    assert(r2.getAs[Long]("last_k") == 9L)
    Seq("g_length", "g_keyword", "g_parity", "g_norepeat")
      .foreach(c => assert(!r2.getAs[Boolean](c), s"conv2 $c"))
    assert(r2.getAs[Long]("n_pass") == 0L)
    assert(r2.getAs[Long]("reward") == 0L)

    val r3 = out(3L)
    assert(r3.getAs[Long]("n_assistant") == 1L)
    assert(r3.getAs[Long]("rep_n") == 0L)
    assert(r3.getAs[Boolean]("g_parity")) // k = 8
  }

  test("assignment law on the corpus: reward ≡ the named grader; battery live both ways") {
    val rows = run("q_verify_rewards").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val named = r.getAs[String]("assigned_check") match {
        case "length"  => r.getAs[Boolean]("g_length")
        case "keyword" => r.getAs[Boolean]("g_keyword")
        case "parity"  => r.getAs[Boolean]("g_parity")
        case other     => assert(other == "norepeat")
          r.getAs[Boolean]("g_norepeat")
      }
      assert(r.getAs[Long]("reward") == (if (named) 1L else 0L))
      assert(r.getAs[String]("required_kw") ==
        requiredKw(r.getAs[Long]("conv_id")))
      val np = Seq("g_length", "g_keyword", "g_parity", "g_norepeat")
        .count(r.getAs[Boolean](_)).toLong
      assert(r.getAs[Long]("n_pass") == np)
    }
    // a grader that always passes (or always fails) tests nothing —
    // the calibrated thresholds must keep every check live both ways
    Seq("g_length", "g_keyword", "g_parity", "g_norepeat").foreach { c =>
      assert(rows.exists(_.getAs[Boolean](c)), s"$c never passes")
      assert(rows.exists(!_.getAs[Boolean](c)), s"$c never fails")
    }
  }

  test("grpo: BigInt numerators + IEEE-triple replay; Σadv = 0 per group") {
    val rows = run("q_grpo_advantage").collect()
    assert(rows.nonEmpty)
    val byGroup = rows.groupBy(r =>
      (r.getAs[String]("lang"), r.getAs[String]("source")))
    byGroup.foreach { case (g, ms) =>
      val n = BigInt(ms.length)
      val rsum = ms.map(r => BigInt(r.getAs[Long]("reward_micro"))).sum
      val rsq = ms.map(r => BigInt(r.getAs[Long]("reward_micro")).pow(2)).sum
      val varNum = n * rsq - rsum * rsum
      assert(varNum >= 0, g)
      var advSum = BigInt(0)
      ms.foreach { r =>
        val adv = n * BigInt(r.getAs[Long]("reward_micro")) - rsum
        assert(BigInt(r.getAs[Long]("adv_num")) == adv, g)
        assert(BigInt(r.getAs[Long]("var_num")) == varNum, g)
        assert(r.getAs[Long]("group_n") == ms.length.toLong, g)
        advSum += adv
        // the ONE float step, replayed on the JVM's IEEE doubles
        val expected =
          if (varNum == 0) 0L
          else math.floor(adv.toDouble * 1000000.0 /
            math.sqrt(varNum.toDouble) + 0.5).toLong
        assert(r.getAs[Long]("adv_micro") == expected, g)
      }
      assert(advSum == 0, g)
    }
  }

  test("grpo synthetic: the two-member ±1σ pool and the zero-variance convention") {
    val s = spark
    import s.implicits._
    // [0, 1e6]: μ = 5e5, σ_pop = 5e5, so z = ∓1 exactly
    val two = Seq(("en", "g", 1L, 1L, 0L), ("en", "g", 2L, 2L, 1000000L))
      .toDF("lang", "source", "doc_id", "samp", "s6i")
    val r2 = text.Sft.grpoOf(two).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("adv_micro")).toMap
    assert(r2(1L) == -1000000L && r2(2L) == 1000000L)
    // all-equal multi-member pool: var_num = 0 → advantage 0 (the
    // GRPO finite-gradient convention), NOT a division blow-up
    val flat = Seq(1L, 2L, 3L).map(i => ("en", "g", i, i, 700000L))
      .toDF("lang", "source", "doc_id", "samp", "s6i")
    text.Sft.grpoOf(flat).collect().foreach { r =>
      assert(r.getAs[Long]("var_num") == 0L)
      assert(r.getAs[Long]("adv_micro") == 0L)
    }
  }

  test("self-consistency: constructed tie elects the smallest answer") {
    val s = spark
    import s.implicits._
    // answers 3,3,5,5,7 — a 2-2 tie, best reward in the singleton
    val pool = Seq((1L, 300000L), (2L, 350000L), (3L, 500000L),
      (4L, 550000L), (5L, 770000L))
      .map { case (i, v) => ("en", "g", i, i, v) }
      .toDF("lang", "source", "doc_id", "samp", "s6i")
    val r = text.Sft.selfConsistencyOf(pool).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_answers") == 3L)
    assert(row.getAs[Long]("vote_answer") == 3L) // tie → smallest
    assert(row.getAs[Long]("vote_n") == 2L)
    assert(row.getAs[Long]("runner_n") == 2L)
    assert(row.getAs[Long]("margin") == 0L)
    assert(!row.getAs[Boolean]("consistent"))
    assert(row.getAs[Long]("best_answer") == 7L)
    assert(!row.getAs[Boolean]("agree_best"))
  }

  test("self-consistency: majority and agree-best flags on designed pools") {
    val s = spark
    import s.implicits._
    def pool(vals: Seq[Long]) = vals.zipWithIndex
      .map { case (v, i) => ("en", "g", i.toLong, i.toLong, v) }
      .toDF("lang", "source", "doc_id", "samp", "s6i")
    // 3-of-4 majority whose vote ≠ the best sample's answer
    val a = text.Sft.selfConsistencyOf(
      pool(Seq(400000L, 410000L, 420000L, 900000L))).collect().head
    assert(a.getAs[Long]("vote_answer") == 4L &&
      a.getAs[Long]("margin") == 2L)
    assert(a.getAs[Boolean]("consistent") && !a.getAs[Boolean]("agree_best"))
    // majority that IS the best sample's answer
    val b = text.Sft.selfConsistencyOf(
      pool(Seq(900000L, 910000L, 920000L, 100000L))).collect().head
    assert(b.getAs[Long]("vote_answer") == 9L)
    assert(b.getAs[Boolean]("consistent") && b.getAs[Boolean]("agree_best"))
  }

  test("self-consistency corpus invariants: modal pigeonhole + accounting") {
    val rows = run("q_self_consistency").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("pool_n"), r.getAs[Long]("n_answers"))
      val (v, ru) = (r.getAs[Long]("vote_n"), r.getAs[Long]("runner_n"))
      assert(v >= ru && ru >= 0)
      assert(v * k >= n, "modal count ≥ ⌈n/k⌉")
      assert(r.getAs[Long]("margin") == v - ru)
      assert(r.getAs[Long]("vote_pm") == v * 1000 / n)
      assert(r.getAs[Boolean]("consistent") == (v * 2 > n))
    }
    // the corpus exercises both flag branches and a genuine tie
    assert(rows.exists(_.getAs[Boolean]("consistent")))
    assert(rows.exists(!_.getAs[Boolean]("consistent")))
    assert(rows.exists(_.getAs[Long]("margin") == 0L))
    assert(rows.exists(!_.getAs[Boolean]("agree_best")))
  }
}

/** Plan pins for the family's scale shape: each operator moves thin
  * rows through exactly ONE hash exchange, with the heavy work
  * map-side (partial aggregation; the pool's top-K as a partial
  * WindowGroupLimit before the shuffle).
  */
class RlvrPlanSpec extends SparkSpec {
  import org.apache.spark.sql.execution.SimpleMode
  private def plan(name: String): String =
    run(name).queryExecution.explainString(SimpleMode)

  test("each RLVR operator is a single hash exchange") {
    for (q <- Seq("q_verify_rewards", "q_grpo_advantage",
        "q_self_consistency")) {
      val p = plan(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"$q: ${p.linesIterator.filter(_.contains("Exchange")).mkString("\n")}")
    }
  }

  test("verify_rewards: conv-keyed exchange; graders aggregate map-side partial") {
    val p = plan("q_verify_rewards")
    assert(p.contains("hashpartitioning(conv_id"), p)
    // the grouping (conv_id, required_kw, assigned_check) must stay
    // satisfiable by the window's conv_id partitioning — adding a
    // non-conv-derived grouping key would insert a second shuffle
    assert(p.contains("partial_count"), p)
    assert(p.contains("partial_max_by"), p)
  }

  test("grpo: the 16-member pool is cut map-side before the exchange") {
    // WindowGroupLimit Partial below the exchange = each task ships at
    // most K rows per group, so the shuffle volume is groups × K, not
    // the corpus — the property that makes the pool selection scale
    val p = plan("q_grpo_advantage")
    val idxPartial = p.indexOf("row_number(), 16, Partial")
    val idxExchange = p.indexOf("Exchange hashpartitioning")
    assert(idxPartial >= 0, p)
    assert(idxExchange >= 0 && idxPartial > idxExchange,
      "partial group-limit must sit BELOW (print after) the exchange")
  }
}
