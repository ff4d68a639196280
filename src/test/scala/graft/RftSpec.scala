package graft

import org.apache.spark.sql.functions._

/** Rejection-sampling fine-tuning family (text.Rft: q_rft_select /
  * q_rft_dataset). The DuckDB oracle hash-checks both end to end;
  * these specs replay the selection law independently in Scala over
  * the corpus pool, pin branch liveness (pass/fail, dedup, cap
  * truncation and under-full tasks), drive designed pools through the
  * exact production path, replay the render fingerprint byte-for-byte
  * in Scala, and pin the text-free-exchange plan.
  */
class RftSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("selection replay: pass, answer dedup, keep rank, from the raw pool") {
    val pool = text.Sft.samplePool(spark, sf, ":rft")
      .select(col("lang"), col("source"), col("doc_id"), col("s6i"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val out = run("q_rft_select").collect()
    assert(out.length == pool.length)
    val byDoc = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    pool.groupBy(p => (p._1, p._2)).foreach { case (_, members) =>
      // per-answer dedup: best (s6i desc, doc_id) per decile
      val byAns = members.groupBy(_._4 / 100000L)
      byAns.foreach { case (ans, g) =>
        val ordered = g.sortBy(m => (-m._4, m._3))
        ordered.zipWithIndex.foreach { case (m, i) =>
          val r = byDoc(m._3)
          assert(r.getAs[Long]("answer") == ans)
          assert(r.getAs[Long]("arank") == i + 1L, s"doc ${m._3}")
          assert(r.getAs[Boolean]("passed") ==
            (m._4 >= text.Sft.PassThresholdMicro))
          assert(r.getAs[Boolean]("kept") ==
            (i == 0 && m._4 >= text.Sft.PassThresholdMicro))
        }
      }
      // keep ranks are 1..n_kept by (s6i desc, doc_id) over the kept set
      val kept = members.filter(m => byDoc(m._3).getAs[Boolean]("kept"))
        .sortBy(m => (-m._4, m._3))
      kept.zipWithIndex.foreach { case (m, i) =>
        assert(byDoc(m._3).getAs[Long]("keep_rank") == i + 1L)
      }
      members.filter(m => !byDoc(m._3).getAs[Boolean]("kept"))
        .foreach(m => assert(byDoc(m._3).getAs[Long]("keep_rank") == 0L))
    }
    // measured liveness: both pass branches, real dedup collapse
    assert(out.exists(_.getAs[Boolean]("passed")))
    assert(out.exists(!_.getAs[Boolean]("passed")))
    assert(out.exists(_.getAs[Long]("arank") > 1L))
  }

  test("designed pools: dedup collapse, all-fail task, cap truncation") {
    val s = spark
    import s.implicits._
    val thr = text.Sft.PassThresholdMicro
    // task A: two passing samples share answer decile 8 (the worse one
    // collapses), one passing unique answer, one failing
    val a = Seq((1L, thr + 350000, "A"), (2L, thr + 330000, "A"),
      (3L, thr + 250000, "A"), (4L, thr - 100000, "A"))
    // task B: five passing distinct answers — truncates at TopM = 3
    val b = (10L to 14L).zipWithIndex.map { case (id, i) =>
      (id, thr + 50000 + 100000L * i, "B") }
    // task C: all failing — publishes nothing to the dataset
    val c = Seq((20L, thr - 1, "C"), (21L, 1L, "C"))
    val pool = (a ++ b ++ c).zipWithIndex
      .map { case ((id, s6i, t), i) => ("en", t, id, i + 1, s6i) }
      .toDF("lang", "source", "doc_id", "samp", "s6i")
    val sel = text.Rft.selectOf(pool).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // A: doc 1 (answer 9) and doc 2 (answer 8) keep; doc 3 collapses
    // into doc 2's answer; doc 4 fails
    assert(sel(1L).getAs[Boolean]("kept") && sel(2L).getAs[Boolean]("kept"))
    assert(!sel(3L).getAs[Boolean]("kept") &&
      sel(3L).getAs[Long]("arank") == 2L &&
      sel(3L).getAs[Boolean]("passed"))
    assert(!sel(4L).getAs[Boolean]("kept") &&
      !sel(4L).getAs[Boolean]("passed"))
    assert(sel(1L).getAs[Long]("keep_rank") == 1L)
    assert(sel(2L).getAs[Long]("keep_rank") == 2L)
    // B: all five kept, ranks by reward desc
    assert((10L to 14L).forall(sel(_).getAs[Boolean]("kept")))
    assert(sel(14L).getAs[Long]("keep_rank") == 1L)
    assert(sel(10L).getAs[Long]("keep_rank") == 5L)
    // C: nothing kept
    assert(!sel(20L).getAs[Boolean]("kept") &&
      !sel(21L).getAs[Boolean]("kept"))
    // the dataset budget drops B's ranks 4..5 and all of C
    val docs = (a ++ b ++ c).map { case (id, _, _) =>
      (id, s"text of $id") }.toDF("doc_id", "text")
    val ds = text.Rft.datasetOf(text.Rft.selectOf(pool), docs).collect()
    assert(ds.length == 2 + 3)
    assert(!ds.exists(_.getAs[String]("source") == "C"))
    assert(ds.filter(_.getAs[String]("source") == "B")
      .map(_.getAs[Long]("keep_rank")).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("dataset rows are the budgeted kept set; fingerprint replays byte-for-byte") {
    val sel = run("q_rft_select").collect()
    val expected = sel.filter(r => r.getAs[Boolean]("kept") &&
      r.getAs[Long]("keep_rank") <= text.Rft.RftTopM)
    val ds = run("q_rft_dataset").collect()
    assert(ds.length == expected.length)
    // the cap binds somewhere and under-fills somewhere
    val perTask = ds.groupBy(r =>
      (r.getAs[String]("lang"), r.getAs[String]("source")))
    assert(sel.exists(r => r.getAs[Long]("keep_rank") > text.Rft.RftTopM))
    assert(perTask.values.exists(_.length < text.Rft.RftTopM.toInt))
    // fingerprint replay on the full set
    val textOf = spark.read.parquet(sf + "/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    ds.foreach { r =>
      val render = "<|rft|> " + r.getAs[String]("lang") + "/" +
        r.getAs[String]("source") + " rank " +
        r.getAs[Long]("keep_rank") + " reward " +
        r.getAs[Long]("reward_micro") + "\n" +
        textOf(r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("render_fp") == md5hex(render))
      assert(r.getAs[Long]("n_tok") ==
        textOf(r.getAs[Long]("doc_id")).split(" ").length.toLong)
    }
  }

  test("rft plan: text never enters an exchange; the kept set broadcasts") {
    import org.apache.spark.sql.execution.exchange.Exchange
    for (q <- Seq("q_rft_select", "q_rft_dataset")) {
      val qe = run(q).queryExecution
      val p = qe.explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("CartesianProduct"), q)
      qe.executedPlan.collect { case e: Exchange => e }.foreach { e =>
        assert(!e.child.output.exists(_.name == "text"),
          q + ": exchange carries text")
      }
    }
    val p = run("q_rft_dataset").queryExecution
      .explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("BroadcastHashJoin"), "kept set must broadcast")
    assert(!p.contains("SortMergeJoin"), "text side must not shuffle-join")
  }
}
