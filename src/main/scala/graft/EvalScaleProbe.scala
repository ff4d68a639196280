package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale evidence for the round's eval/privacy/batching families at a
  * derived decade: one measured pass of each new query at the base
  * dir and at the ×`factor` derived corpus (ScaleProbe2's fixture),
  * recording wall seconds, the static exchange counts (shuffle +
  * broadcast, AQE-off fully-prepared plan — the PipelineRehearsal
  * discipline), and the payload audit (no exchange may output
  * `text`/`planted`). BASELINE.md records the exponents: a family
  * whose plan is corpus-shaped shows exp ≈ 1 wall growth with an
  * SF-independent exchange count; a metadata-shaped readout (arena,
  * batch plan) should grow sub-linearly.
  *
  * Usage: `runMain graft.EvalScaleProbe [baseDir] [factor]` (defaults
  * /root/testdata/sf0.1, ×50). Prints one JSON line per (dir, query).
  */
object EvalScaleProbe {

  private val Families = Seq(
    "q_mink_prob", "q_dataset_infer",
    "q_canary_plant", "q_canary_exposure",
    "q_ifeval_check", "q_ifeval_report",
    "q_rft_select", "q_rft_dataset",
    "q_batch_bucketize", "q_batch_plan",
    "q_arena_battles", "q_arena_leaderboard",
    "q_watermark_detect", "q_watermark_audit",
    "q_mcq_build", "q_length_bias", "q_epoch_plan")

  private def sec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def withAqeOff[T](s: SparkSession)(f: => T): T = {
    val prior = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally s.conf.set("spark.sql.adaptive.enabled", prior)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaled = ScaleProbe2.ensureScaled(spark, baseDir, factor)
    val walls = collection.mutable.Map[(String, String), Double]()

    Seq(baseDir, scaled).foreach { d =>
      val nDocs = Tables.documents(spark, d).count()
      Families.foreach { q =>
        def build = SparkEntry.queries(q)(spark, d)
        val (sh, bc, payload) = withAqeOff(spark) {
          val plan = build.queryExecution.executedPlan
          (plan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
          }.length,
            plan.collect {
              case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike => e
            }.length,
            plan.collect {
              case e: org.apache.spark.sql.execution.exchange.Exchange
                  if e.output.exists(a =>
                    a.name == "text" || a.name == "planted") => e
            }.length)
        }
        val warm = sec(noop(build)) // first run pays codegen/JIT
        val wall = sec(noop(build))
        walls((d, q)) = math.min(warm, wall)
        println(f"""{"probe":"eval_scale","dir":"$d","n_docs":$nDocs,"query":"$q","sec":${math.min(warm, wall)}%.3f,"shuffle_ex":$sh,"broadcast_ex":$bc,"payload_ex":$payload}""")
      }
    }
    Families.foreach { q =>
      val e = math.log(walls((scaled, q)) / walls((baseDir, q))) /
        math.log(factor.toDouble)
      println(f"""{"probe":"eval_scale_exp","query":"$q","factor":$factor,"exp":$e%.2f}""")
    }
    spark.stop()
  }
}
