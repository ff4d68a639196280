package graft

import org.apache.spark.sql.functions._

/** Canary memorization family (text.Memorize: q_canary_plant /
  * q_canary_exposure). The DuckDB oracle hash-checks both end to end;
  * these specs pin the literal exposure table against its defining
  * formula, replay the plant law and the rank law independently in
  * Scala, pin the SEMANTIC claim (enough plantings lift a rare
  * candidate past a frequent one; the unplanted control never lifts)
  * on a designed corpus, and pin the plan (text never shuffles; the
  * candidate pool broadcasts).
  */
class MemorizeSpec extends SparkSpec {

  test("the literal exposure table IS round(1000*log2(16/rank))") {
    val k = text.Memorize.CanaryPoolK
    assert(text.Memorize.ExposureMb.size == k)
    (1 to k).foreach { r =>
      val expect = math.round(1000.0 * math.log(k.toDouble / r) /
        math.log(2.0))
      assert(text.Memorize.ExposureMb(r - 1) == expect, s"rank $r")
    }
    // strictly decreasing, endpoints pinned
    assert(text.Memorize.ExposureMb.head == 4000L)
    assert(text.Memorize.ExposureMb.last == 0L)
    assert(text.Memorize.ExposureMb.sliding(2).forall(p => p(0) > p(1)))
  }

  test("plant law replay: triangular slots, byte-ordered pool, marker format") {
    val docs = spark.read.parquet(sf + "/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pool = docs.values.flatMap(_.split(" ")).toSet.toVector.sorted
      .take(text.Memorize.CanaryPoolK)
    val tri = (0 to 15).map(i => i.toLong * (i + 1) / 2)
    val out = run("q_canary_plant").collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val slot = id % text.Memorize.CanarySlots
      val expectIdx = (1 to 15).find(i =>
        slot >= tri(i - 1) && slot < tri(i)).getOrElse(0).toLong
      assert(r.getAs[Long]("canary_idx") == expectIdx, s"doc $id")
      if (expectIdx == 0L) {
        assert(r.getAs[String]("secret") == "")
        assert(r.getAs[String]("planted") == docs(id))
      } else {
        val sec = pool(expectIdx.toInt)
        assert(r.getAs[String]("secret") == sec)
        assert(r.getAs[String]("planted") ==
          docs(id) + " canarymark " + sec)
      }
    }
  }

  test("exposure replay: counts, the subtraction identity, both rank laws") {
    val planted = run("q_canary_plant").collect()
    val pool = planted.filter(_.getAs[Long]("canary_idx") > 0L)
      .map(r => r.getAs[Long]("canary_idx") -> r.getAs[String]("secret"))
      .toMap
    val allToks = planted.flatMap(_.getAs[String]("planted").split(" "))
    val out = run("q_canary_exposure").collect()
    assert(out.length == text.Memorize.CanaryPoolK)
    val byIdx = out.map(r => r.getAs[Long]("canary_idx") -> r).toMap
    // the control is never planted
    assert(byIdx(0L).getAs[Long]("n_planted") == 0L)
    assert(!byIdx(0L).getAs[Boolean]("lifted"))
    out.foreach { r =>
      val idx = r.getAs[Long]("canary_idx")
      val sec = r.getAs[String]("secret")
      val total = allToks.count(_ == sec).toLong
      assert(r.getAs[Long]("total_cnt") == total, s"canary $idx")
      val nPlanted = planted.count(p =>
        p.getAs[Long]("canary_idx") == idx && idx > 0L).toLong
      assert(r.getAs[Long]("n_planted") == nPlanted)
      assert(r.getAs[Long]("natural_cnt") == total - nPlanted)
      // planted secrets agree with the plant table
      if (idx > 0L) assert(pool(idx) == sec)
    }
    // rank replay over the 16-row set
    val xSorted = out.sortBy(r =>
      (-r.getAs[Long]("total_cnt"), r.getAs[String]("secret")))
    xSorted.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("xrank") == i + 1L)
      assert(r.getAs[Long]("exposure_mb") ==
        text.Memorize.ExposureMb(i))
    }
    val nSorted = out.sortBy(r =>
      (-r.getAs[Long]("natural_cnt"), r.getAs[String]("secret")))
    nSorted.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("natural_rank") == i + 1L)
    }
    out.foreach(r => assert(r.getAs[Boolean]("lifted") ==
      (r.getAs[Long]("xrank") < r.getAs[Long]("natural_rank"))))
    // liveness both ways
    assert(out.exists(_.getAs[Boolean]("lifted")))
    assert(out.exists(!_.getAs[Boolean]("lifted")))
  }

  test("designed corpus: heavy planting lifts a rare candidate past a frequent one") {
    val s = spark
    import s.implicits._
    // vocabulary of exactly 16 byte-ordered tokens t00..t15 = the
    // pool. t15 is rare (one natural occurrence, dead-last
    // naturally); the 15 docs in canary-15 slots (doc_id % 256 in
    // 105..119) each receive one planted copy of t15, lifting its
    // total (16) past the mid-frequency candidates (9 each); doc ids
    // >= 120 are unplanted background.
    val toks = (0 to 15).map(i => f"t$i%02d")
    val bg = (0 until 4).map(i =>
      (200L + i, (toks.take(15) ++ toks.take(15)).mkString(" ")))
    val rareDoc = Seq((199L, (toks.take(15) :+ "t15").mkString(" ")))
    val heavy = (105 to 119).map(sl => (sl.toLong, toks.take(3).mkString(" ")))
    val docs = (bg ++ rareDoc ++ heavy).toDF("doc_id", "text")
    val out = text.Memorize.exposureOf(docs).collect()
      .map(r => r.getAs[Long]("canary_idx") -> r).toMap
    val r15 = out(15L)
    assert(r15.getAs[String]("secret") == "t15")
    assert(r15.getAs[Long]("n_planted") == 15L)
    assert(r15.getAs[Long]("natural_cnt") == 1L)
    assert(r15.getAs[Long]("total_cnt") == 16L)
    // naturally dead-last, lifted well up the ranking by the plants:
    // above every t03..t14 (9 total occurrences each), below the
    // heavy-doc tokens t00..t02 (24 each)
    assert(r15.getAs[Long]("natural_rank") == 16L)
    assert(r15.getAs[Boolean]("lifted"))
    assert(r15.getAs[Long]("xrank") == 4L)
    assert(r15.getAs[Long]("exposure_mb") ==
      text.Memorize.ExposureMb(3))
  }

  test("tiny vocabulary: the plant law stays total — no document drops") {
    val s = spark
    import s.implicits._
    // 3 distinct tokens < CanaryPoolK = 16: slots mapping to canary
    // idx >= 3 have no secret and must stay UNPLANTED, not vanish.
    // Triangular slot law: slot 0 -> idx 1, slot 1 -> idx 2, slot 3
    // -> idx 3 (past the 3-token pool), slot 50 -> idx 10 (past),
    // slot 120 -> idx 0 (the control)
    val docs = Seq(0L, 1L, 3L, 50L, 120L).map(id => (id, "ca cb cc"))
      .toDF("doc_id", "text")
    val out = text.Memorize.plantedOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 5, "a slot past the pool dropped its document")
    // pool by byte order: cidx 0 = ca, 1 = cb, 2 = cc
    assert(out(0L).getAs[Long]("canary_idx") == 1L)
    assert(out(0L).getAs[String]("secret") == "cb")
    assert(out(0L).getAs[String]("planted") == "ca cb cc canarymark cb")
    assert(out(1L).getAs[Long]("canary_idx") == 2L)
    assert(out(1L).getAs[String]("secret") == "cc")
    // idx 3 and 10 sit past the 3-candidate pool; idx 0 is the
    // control — all three publish unplanted
    for (id <- Seq(3L, 50L, 120L)) {
      assert(out(id).getAs[String]("secret") == "")
      assert(out(id).getAs[String]("planted") == "ca cb cc")
    }
  }

  test("canary plan: pool broadcasts, no cartesian, no text in any exchange-feeding window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    for (q <- Seq("q_canary_plant", "q_canary_exposure")) {
      val qe = run(q).queryExecution
      val p = qe.explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(p.contains("BroadcastExchange"), q)
      assert(!p.contains("CartesianProduct"), q)
      // every join is a broadcast join: the pool (16 rows) or the
      // 16-group plant counts — nothing corpus-sized meets a shuffle
      // join here
      assert(!p.contains("SortMergeJoin"), q)
      // the rank windows run over the 16-candidate set only, never
      // over text or planted payloads
      qe.optimizedPlan.collect { case w: LWindow => w }.foreach { w =>
        assert(!w.child.output.exists(a =>
          a.name == "text" || a.name == "planted"),
          q + ": window consumes payload")
      }
      qe.optimizedPlan.collect { case j: Join => j }.foreach { j =>
        assert(j.joinType.sql != "CROSS", q)
      }
    }
  }
}
