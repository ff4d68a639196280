package graft

import org.apache.spark.sql.functions._

/** IFEval verifiable-constraint family (text.Ifeval: q_ifeval_check /
  * q_ifeval_report). The DuckDB oracle hash-checks both end to end;
  * these specs replay all six strict laws and the loose transform
  * independently in Scala over the corpus, pin per-kind liveness, pin
  * the loose-flips-strict semantics on designed responses (including
  * the one-token empty-tail edge), replay the report rollup, and pin
  * the projection-only plan.
  */
class IfevalSpec extends SparkSpec {

  private def strictReplay(kind: Long, t: Array[String]): Boolean =
    kind match {
      case 0L => t.length >= text.Ifeval.MinWords
      case 1L => t.count(_ == text.Ifeval.Keyword) >= text.Ifeval.KeywordMin
      case 2L => !t.contains(text.Ifeval.Forbidden)
      case 3L => t.nonEmpty && t.last == text.Ifeval.EndWord
      case 4L => t.distinct.length >= text.Ifeval.MinDistinct
      case _ => t.length - t.distinct.length <= text.Ifeval.RepeatCap
    }

  test("check replay: all six strict laws + the loose transform, per doc") {
    val docs = spark.read.parquet(sf + "/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = run("q_ifeval_check").collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val kind = r.getAs[Long]("kind")
      assert(kind == id % 6L)
      val toks = docs(id).split(" ")
      val strict = strictReplay(kind, toks)
      val loose = strict || strictReplay(kind, toks.drop(1))
      assert(r.getAs[Boolean]("followed_strict") == strict, s"doc $id")
      assert(r.getAs[Boolean]("followed_loose") == loose, s"doc $id")
      assert(r.getAs[String]("instruction") ==
        text.Ifeval.Kinds(kind.toInt)._2)
      // loose >= strict by construction
      assert(!strict || loose)
    }
    // measured liveness: every kind splits both ways under strict
    (0L to 5L).foreach { k =>
      val ks = out.filter(_.getAs[Long]("kind") == k)
      assert(ks.exists(_.getAs[Boolean]("followed_strict")), s"kind $k")
      assert(ks.exists(!_.getAs[Boolean]("followed_strict")), s"kind $k")
    }
  }

  test("designed responses: loose flips strict exactly where the transform can help") {
    val s = spark
    import s.implicits._
    // kind = doc_id % 6. Designed rows:
    //  id 2 (forbidden): the ONLY 'slow' is the leading token — strict
    //    fails, loose passes;
    //  id 8 (forbidden): 'slow' mid-response — both fail;
    //  id 11 (repeat_cap): 44 copies of one token — 43 repeats
    //    strict, 42 after the transform: both fail; id 17: 42 copies
    //    — 41 repeats strict (fail), 40 after the transform (loose
    //    passes). The lead token must itself be a duplicate: dropping
    //    a UNIQUE lead removes one from n and one from distinct, so
    //    repeats would not move;
    //  id 3 (end_phrase): one-token response 'query' — strict passes,
    //    and the EMPTY tail must evaluate safely (false), not error;
    //  id 9 (end_phrase): one-token response 'scan' — both fail, the
    //    empty-tail probe again safe.
    val rows = Seq(
      (2L, "slow scan filter"),
      (8L, "scan slow filter"),
      (11L, Seq.fill(44)("dup").mkString(" ")),
      (17L, Seq.fill(42)("dup").mkString(" ")),
      (3L, "query"),
      (9L, "scan")).toDF("doc_id", "text")
    val out = text.Ifeval.checksOf(rows).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def flags(id: Long) = (out(id).getAs[Boolean]("followed_strict"),
      out(id).getAs[Boolean]("followed_loose"))
    assert(flags(2L) == (false, true))
    assert(flags(8L) == (false, false))
    assert(flags(11L) == (false, false)) // 44 dups: 43 repeats, tail 42
    assert(flags(17L) == (false, true)) // 42 dups: 41 strict, tail 40
    assert(flags(3L) == (true, true))
    assert(flags(9L) == (false, false))
  }

  test("report rollup replays from the check table") {
    val checks = run("q_ifeval_check").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val srcOf = spark.read.parquet(sf + "/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rep = run("q_ifeval_report").collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum == checks.size.toLong)
    rep.foreach { r =>
      val cell = checks.values.filter(c =>
        srcOf(c.getAs[Long]("doc_id")) == r.getAs[String]("source") &&
          c.getAs[Long]("kind") == r.getAs[Long]("kind"))
      assert(r.getAs[Long]("n_docs") == cell.size.toLong)
      val ns = cell.count(_.getAs[Boolean]("followed_strict")).toLong
      val nl = cell.count(_.getAs[Boolean]("followed_loose")).toLong
      assert(r.getAs[Long]("n_strict") == ns)
      assert(r.getAs[Long]("n_loose") == nl)
      assert(nl >= ns)
      assert(r.getAs[Long]("strict_pm") == ns * 1000 / cell.size)
      assert(r.getAs[Long]("loose_pm") == nl * 1000 / cell.size)
    }
  }

  test("ifeval plan: projection-only checks — no join, no window, no text past the split") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    for (q <- Seq("q_ifeval_check", "q_ifeval_report")) {
      val qe = run(q).queryExecution
      assert(qe.optimizedPlan.collect { case j: Join => j }.isEmpty, q)
      assert(qe.optimizedPlan.collect { case w: LWindow => w }.isEmpty, q)
      val p = qe.explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("CartesianProduct"), q)
    }
    // the report's single hash exchange carries thin boolean rows,
    // never text
    val rep = run("q_ifeval_report").queryExecution
    rep.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.foreach { a =>
      assert(!a.child.output.exists(_.name == "text"),
        "report aggregate consumes text")
    }
  }
}
