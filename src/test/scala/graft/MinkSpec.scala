package graft

import org.apache.spark.sql.functions._

/** Min-K% membership family (text.TextOps: q_mink_prob /
  * q_dataset_infer). The DuckDB oracle hash-checks both end to end;
  * these specs pin the ranking law by independent replay, the
  * self-calibrated flag's exact cross-multiplication, the SEMANTIC
  * claim (a duplicated/member document scores above a unique
  * out-of-distribution one) on a designed corpus, and the
  * doc→source aggregation consistency.
  */
class MinkSpec extends SparkSpec {

  test("bottom-k ranking law: independent Scala replay over the corpus") {
    val toks = spark.read.parquet(sf + "/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val freq = toks.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val out = run("q_mink_prob").collect()
    assert(out.length == toks.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val ts = toks(id)
      val n = ts.length.toLong
      assert(r.getAs[Long]("n_tok") == n)
      val k = (n * text.TextOps.MinKPct + 99) / 100
      assert(r.getAs[Long]("k_cnt") == k)
      // the replay: occurrences sorted by (corpus count, token, pos),
      // bottom-k count mass
      val mass = ts.zipWithIndex
        .map { case (t, p) => (freq(t), t, p) }
        .sorted.take(k.toInt).map(_._1).sum
      assert(r.getAs[Long]("mink_mass") == mass, s"doc $id")
    }
    // self-calibration replayed exactly in BigInt
    val gmass = out.map(r => BigInt(r.getAs[Long]("mink_mass"))).sum
    val gk = out.map(r => BigInt(r.getAs[Long]("k_cnt"))).sum
    out.foreach { r =>
      val expect = BigInt(r.getAs[Long]("mink_mass")) * gk >=
        gmass * BigInt(r.getAs[Long]("k_cnt"))
      assert(r.getAs[Boolean]("suspect") == expect)
    }
    assert(out.exists(_.getAs[Boolean]("suspect")))
    assert(out.exists(!_.getAs[Boolean]("suspect")))
  }

  test("a planted member (duplicated doc) outscores a unique non-member") {
    val s = spark
    import s.implicits._
    // background: 8 docs over a small shared vocabulary; the MEMBER
    // text appears 3 times (training-set duplication — its tokens are
    // corpus-frequent even at their rarest); the NON-MEMBER is pure
    // unseen vocabulary (every token count 1 — the lowest possible
    // bottom-k mass)
    val bg = (1L to 8L).map(i =>
      (i, Seq.fill(10)(Seq("the", "cat", "sat", "on", "mat")((i % 5).toInt))
        .mkString(" ")))
    val member = Seq(100L, 101L, 102L)
      .map(i => (i, "the cat sat on mat the cat sat on mat"))
    val nonMember = Seq((200L,
      "zyx wvu tsr qpo nml kji hgf edc ba9 876"))
    val docs = (bg ++ member ++ nonMember).toDF("doc_id", "text")
    val per = text.TextOps.minkPerDocOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // equal length and k across the probes, so mass compares directly
    assert(per(100L).getAs[Long]("k_cnt") == per(200L).getAs[Long]("k_cnt"))
    assert(per(100L).getAs[Long]("mink_mass") >
      per(200L).getAs[Long]("mink_mass"))
    // the non-member's bottom-k tokens are all singletons: mass = k
    assert(per(200L).getAs[Long]("mink_mass") ==
      per(200L).getAs[Long]("k_cnt"))
  }

  test("dataset inference aggregates the doc table consistently") {
    val docs = run("q_mink_prob").collect()
    val srcOf = spark.read.parquet(sf + "/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySrc = run("q_dataset_infer").collect()
    assert(bySrc.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong)
    val grouped = docs.groupBy(r => srcOf(r.getAs[Long]("doc_id")))
    bySrc.foreach { r =>
      val ms = grouped(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == ms.length.toLong)
      assert(r.getAs[Long]("src_mass") ==
        ms.map(_.getAs[Long]("mink_mass")).sum)
      assert(r.getAs[Long]("src_k") == ms.map(_.getAs[Long]("k_cnt")).sum)
      // the per-doc suspect flags roll up exactly
      assert(r.getAs[Long]("n_suspect") ==
        ms.count(_.getAs[Boolean]("suspect")).toLong)
      assert(r.getAs[Long]("suspect_share_pm") ==
        r.getAs[Long]("n_suspect") * 1000 / r.getAs[Long]("n_docs"))
    }
    assert(bySrc.exists(_.getAs[Boolean]("flagged")))
    assert(bySrc.exists(!_.getAs[Boolean]("flagged")))
  }

  test("mink plan: frequency model broadcasts; the ranking window is doc-keyed and text-free") {
    // the q_lm_unigram_score scale shape: the corpus-wide token
    // frequency table joins the occurrence stream as a BROADCAST
    // build side (the occurrence stream never shuffles on tok), and
    // the bottom-k ranking window runs under doc_id locality over
    // thin (doc_id, pos, tok, cnt) rows — raw text dies at the
    // explode. The global calibration row broadcasts (1-row agg).
    import org.apache.spark.sql.catalyst.plans.logical.Window
    for (q <- Seq("q_mink_prob", "q_dataset_infer")) {
      val qe = run(q).queryExecution
      val p = qe.explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(p.contains("BroadcastExchange HashedRelationBroadcastMode"), q)
      assert(!p.contains("CartesianProduct"), q)
      qe.optimizedPlan.collect { case w: Window => w }.foreach { w =>
        assert(!w.child.output.exists(_.name == "text"),
          q + ": window consumes text")
        assert(w.partitionSpec.exists(
          _.references.exists(_.name == "doc_id")),
          q + ": window not doc-keyed")
      }
    }
  }
}
