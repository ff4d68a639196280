package graft

import org.apache.spark.sql.functions._

/** Watermark-detection family (text.Watermark: q_watermark_detect /
  * q_watermark_audit). The DuckDB oracle hash-checks both end to end;
  * these specs replay the green-parity law corpus-wide in Scala, pin
  * doc-level flag liveness and the natural-corpus NULL result at
  * source level, PLANT a green-chain source through the exact
  * production path and show pooling flags it decisively, and pin the
  * projection-only plan.
  */
class WatermarkSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def isGreen(prev: String, tok: String): Boolean =
    java.lang.Long.parseLong(
      md5hex(prev + " " + tok + text.Watermark.WmSalt).substring(0, 8),
      16) % 2 == 0

  test("green-parity law replays corpus-wide; doc flags live both ways") {
    val docs = spark.read.parquet(sf + "/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = run("q_watermark_detect").collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ")
      val n = toks.length - 1L
      val g = toks.sliding(2).count(p => isGreen(p(0), p(1))).toLong
      assert(r.getAs[Long]("n_bigrams") == n)
      assert(r.getAs[Long]("n_green") == g, s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("green_pm") ==
        (if (n > 0) g * 1000 / n else 0L))
      val excess = 2 * g - n
      assert(r.getAs[Long]("excess") == excess)
      assert(r.getAs[Boolean]("watermarked") ==
        (excess > 0 && excess * excess > 4 * n))
    }
    // the detector's ≈2.3% false-positive rate at z > 2 keeps both
    // branches live on natural text
    assert(out.exists(_.getAs[Boolean]("watermarked")))
    assert(out.exists(!_.getAs[Boolean]("watermarked")))
  }

  test("natural corpus: NO source pools past z > 2 — the audit's null result") {
    val audit = run("q_watermark_audit").collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(!r.getAs[Boolean]("source_flagged"),
        r.getAs[String]("source"))
      // rollup consistency against the doc table
      assert(r.getAs[Long]("pooled_excess") ==
        2 * r.getAs[Long]("pooled_green") - r.getAs[Long]("pooled_bigrams"))
      assert(r.getAs[Long]("flagged_pm") ==
        r.getAs[Long]("n_flagged") * 1000 / r.getAs[Long]("n_docs"))
    }
    // doc-level flags DO appear somewhere even though no source pools
    assert(audit.map(_.getAs[Long]("n_flagged")).sum > 0L)
  }

  test("a planted green-chain source flags decisively under pooling") {
    val s = spark
    import s.implicits._
    // build watermarked text the way the generator would: from a
    // 6-token vocabulary, at each step append a token making the new
    // bigram GREEN (greedy over the hash — the vocabulary is large
    // enough that a green successor always exists here, asserted)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def greenChain(seed: String, len: Int): String = {
      val sb = Vector.newBuilder[String]
      var prev = seed
      sb += prev
      (1 until len).foreach { _ =>
        val next = vocab.find(isGreen(prev, _))
        assert(next.nonEmpty, s"no green successor of $prev")
        sb += next.get
        prev = next.get
      }
      sb.result().mkString(" ")
    }
    // 10 watermarked docs of 40 tokens + 10 natural-ish docs whose
    // bigrams mix
    val planted = (0 until 10).map(i =>
      (100L + i, "synthetic", greenChain(vocab(i % 6), 40)))
    val natural = (0 until 10).map(i =>
      (200L + i, "human", Seq.fill(20)(vocab((i + 1) % 6) + " " +
        vocab(i % 6)).mkString(" ")))
    val det = text.Watermark.detectOf(
      (planted ++ natural).toDF("doc_id", "source", "text"))
    val audit = text.Watermark.auditOf(det).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // every planted doc is all-green: n_green = n_bigrams
    val perDoc = det.collect()
    perDoc.filter(_.getAs[Long]("doc_id") < 200L).foreach { r =>
      assert(r.getAs[Long]("n_green") == r.getAs[Long]("n_bigrams"))
      assert(r.getAs[Boolean]("watermarked"))
    }
    assert(audit("synthetic").getAs[Boolean]("source_flagged"))
    assert(audit("synthetic").getAs[Long]("n_flagged") == 10L)
    assert(!audit("human").getAs[Boolean]("source_flagged"))
  }

  test("watermark plan: detection is projection-only; audit adds one thin aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    for (q <- Seq("q_watermark_detect", "q_watermark_audit")) {
      val qe = run(q).queryExecution
      assert(qe.optimizedPlan.collect { case j: Join => j }.isEmpty, q)
      assert(qe.optimizedPlan.collect { case w: LWindow => w }.isEmpty, q)
      val p = qe.explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(!p.contains("CartesianProduct"), q)
      qe.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.foreach { e =>
        assert(!e.child.output.exists(a => a.name == "text" || a.name == "l"),
          q + ": exchange carries text")
      }
    }
  }
}
