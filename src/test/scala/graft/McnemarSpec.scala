package graft

import org.apache.spark.sql.functions._

/** Filter A/B comparison (text.Quality: q_filter_mcnemar). The DuckDB
  * oracle hash-checks it end to end; these specs replay the 2×2
  * table and the χ² law from the two filters' own (already-oracled)
  * outputs, pin significance liveness both ways, and drive the
  * zero-discordant and exact-boundary cases through the production
  * path.
  */
class McnemarSpec extends SparkSpec {

  test("2x2 table and chi-square replay from the two filter outputs") {
    val g = run("q_quality_gopher").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val l = run("q_quality_logistic").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("label") == "keep")).toMap
    val srcOf = spark.read.parquet(sf + "/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = run("q_filter_mcnemar").collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == g.size.toLong)
    out.foreach { r =>
      val docs = srcOf.filter(_._2 == r.getAs[String]("source")).keys
      val b = docs.count(id => g(id) && !l(id)).toLong
      val c = docs.count(id => !g(id) && l(id)).toLong
      val a = docs.count(id => g(id) && l(id)).toLong
      val dd = docs.count(id => !g(id) && !l(id)).toLong
      assert(r.getAs[Long]("both_keep") == a)
      assert(r.getAs[Long]("gopher_only") == b)
      assert(r.getAs[Long]("logistic_only") == c)
      assert(r.getAs[Long]("both_drop") == dd)
      assert(r.getAs[Long]("agree_pm") == (a + dd) * 1000 / docs.size)
      assert(r.getAs[Long]("discordant") == b + c)
      if (b + c > 0) {
        assert(r.getAs[Long]("chi2_milli") ==
          (b - c) * (b - c) * 1000 / (b + c))
        // the verdict is the exact cross-multiplied p < 0.05 bound
        assert(r.getAs[Boolean]("significant") ==
          (BigInt(text.Quality.McNemarChi2Den) * (b - c) * (b - c) >
            BigInt(text.Quality.McNemarChi2Num) * (b + c)))
      } else assert(!r.getAs[Boolean]("significant"))
    }
    // measured liveness: the verdict splits both ways in-corpus
    assert(out.exists(_.getAs[Boolean]("significant")))
    assert(out.exists(!_.getAs[Boolean]("significant")))
  }

  test("designed pairs: zero-discordant source and the exact significance boundary") {
    val s = spark
    import s.implicits._
    // source Z: filters agree on every doc (b = c = 0) — chi2 0,
    // never significant, agree_pm 1000;
    // source E: b = 5, c = 0 → chi2 = 5000 milli > 3841.5 —
    // significant; source F: b = 2, c = 0 → chi2 = 2000 milli — not
    val rows =
      (1 to 4).map(i => ("Z", true, true)) ++
        (5 to 8).map(i => ("Z", false, false)) ++
        (1 to 5).map(i => ("E", true, false)) ++
        Seq(("E", true, true)) ++
        (1 to 2).map(i => ("F", true, false)) ++
        Seq(("F", false, false))
    val out = text.Quality.mcnemarOf(
      rows.toDF("source", "g", "l")).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("Z").getAs[Long]("discordant") == 0L)
    assert(out("Z").getAs[Long]("chi2_milli") == 0L)
    assert(!out("Z").getAs[Boolean]("significant"))
    assert(out("Z").getAs[Long]("agree_pm") == 1000L)
    assert(out("E").getAs[Long]("chi2_milli") == 5000L)
    assert(out("E").getAs[Boolean]("significant"))
    assert(out("F").getAs[Long]("chi2_milli") == 2000L)
    assert(!out("F").getAs[Boolean]("significant"))
  }

  test("mcnemar plan: id-width join of two kernel projections; no text in exchanges") {
    val qe = run("q_filter_mcnemar").queryExecution
    val p = qe.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("CartesianProduct"))
    qe.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.foreach { e =>
      assert(!e.output.exists(a =>
        a.name == "text" || a.name == "words" || a.name == "lines"),
        e.toString)
    }
  }
}
