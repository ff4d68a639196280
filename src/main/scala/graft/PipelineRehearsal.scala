package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end pipeline rehearsal at a derived scale decade: ONE
  * measured pass of the composed production chain behind
  * q_pipeline_export — near-dup dedup (cluster representatives) →
  * Gopher quality filter → two-phase sequence packing → shard-law
  * export — on the ×`factor` derived corpus (ScaleProbe2's fixture).
  *
  * Every individual stage law already has measured decades; what has
  * never been recorded in one pass is the COMPOSITION: the composed
  * wall-clock, the per-stage exchange counts, and whether any stage's
  * plan changes shape when its input is the previous stage's live
  * dataflow instead of a materialized table. This main records all
  * three:
  *
  *  - each stage is timed twice: ISOLATED (input checkpointed, so the
  *    stage's own plan is measured alone) and as part of the COMPOSED
  *    single dataflow ending in the shard-assigned table;
  *  - exchange counts come from the FULLY-PREPARED physical plan
  *    (`executedPlan` with AQE off — `sparkPlan` alone misses the
  *    EnsureRequirements-inserted shuffles; see [[exchanges]]),
  *    isolated vs composed — shape drift under composition would
  *    show as composed ≠ Σ isolated beyond the expected keep-set
  *    reuse;
  *  - the payload discipline is re-checked at this scale: no exchange
  *    in the composed plan may output a `text` column.
  *
  * Usage: `runMain graft.PipelineRehearsal [baseDir] [factor]`
  * (defaults /root/testdata/sf0.1, ×50 — the fourth text decade).
  * Prints one JSON line per dir (base then scaled), BASELINE.md
  * records the result.
  */
object PipelineRehearsal {

  private def sec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** (shuffle, broadcast) exchange counts from the FULLY-PREPARED
    * physical plan — `sparkPlan` is the planner output BEFORE
    * EnsureRequirements inserts the requirement-driven shuffles, so
    * counting there sees only explicit repartitions. Planning with
    * AQE off (runtime conf, restored after) yields the complete
    * static plan without the AdaptiveSparkPlanExec wrapper.
    */
  private def withAqeOff[T](s: SparkSession)(f: => T): T = {
    val prior = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally s.conf.set("spark.sql.adaptive.enabled", prior)
  }

  private def exchanges(s: SparkSession, build: => DataFrame): (Int, Int) =
    withAqeOff(s) {
      val plan = build.queryExecution.executedPlan
      val sh = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }.length
      val bc = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike => e
      }.length
      (sh, bc)
    }

  private def payloadExchanges(s: SparkSession, build: => DataFrame): Int =
    withAqeOff(s) {
      build.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange
            if e.output.exists(_.name == "text") => e
      }.length
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

    Seq(baseDir, scaled).foreach { d =>
      val nDocs = Tables.documents(spark, d).count()

      // write-once layouts make "cold" honest only on a fresh dir:
      // record whether this run actually paid the builds
      val wh = new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath
      def layoutExists(name: String) = java.nio.file.Files.exists(
        java.nio.file.Paths.get(wh,
          s"${name}_${sources.Layouts.sfSuffix(d)}", "_SUCCESS"))
      val preexisting = Seq("dedup_cluster_labels", "pipeline_shards")
        .filter(layoutExists)

      // --- stage 1: the CC label layout (write-once; the first wall
      // is the per-corpus ingest cost IF the layout was absent, the
      // second the per-query re-read cost)
      val labelsColdSec = sec(dedup.Dedup.clusterLabels(spark, d).count())
      val labelsSec = sec(dedup.Dedup.clusterLabels(spark, d).count())

      // --- stage 2 (dedup reps ∩ gopher keeps): isolated plan + wall
      val survivors = text.Corpus.pipelineSurvivors(spark, d)
      val svEx = exchanges(spark, text.Corpus.pipelineSurvivors(spark, d))
      val svSec = sec(noop(survivors))
      val nSurvivors = survivors.count()

      // --- stage 3 (pack): isolated = packing over the CHECKPOINTED
      // keep set, so the prefix-sum plan is measured alone
      val svCp = survivors.localCheckpoint(true)
      val docsThin = Tables.documents(spark, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      def packIso = text.Corpus.seqPackedOf(
        docsThin.join(svCp, Seq("doc_id"), "leftsemi"))
      val packIsoEx = exchanges(spark, packIso)
      val packIsoSec = sec(noop(packIso))

      // --- stage 4 (export shard assignment): isolated over the
      // checkpointed pack
      val packCp = packIso.localCheckpoint(true)
      def expIso = text.Corpus.withDerivedShard(packCp, "n_tok", packCp)
      val expIsoEx = exchanges(spark, expIso)
      val expIsoSec = sec(noop(expIso))

      // --- the COMPOSED single dataflow (what q_pipeline_export's
      // layout build actually runs): survivors → pack → shard in one
      // plan, no materialization between stages
      def composed = {
        val packedLive = text.Corpus.pipelinePacked(spark, d)
        text.Corpus.withDerivedShard(packedLive, "n_tok", packedLive)
      }
      val composedEx = exchanges(spark, composed)
      val payloadLeak = payloadExchanges(spark, composed)
      val composedSec = sec(noop(composed))

      // --- the shipped artifact: layout write + manifest read (the
      // registered query end to end, including the parquet write)
      val t0 = System.nanoTime()
      val manifest = SparkEntry.queries("q_pipeline_export")(spark, d)
        .collect()
      val exportSec = (System.nanoTime() - t0) / 1e9
      val nShards = manifest.length.toLong
      val nTokens = manifest.map(_.getLong(3)).sum
      val nKept = manifest.map(_.getLong(2)).sum
      require(nKept == nSurvivors,
        s"manifest docs $nKept != survivors $nSurvivors")

      println(
        s"""{"dir":"$d","factor":${if (d == baseDir) 1 else factor},""" +
        s""""n_docs":$nDocs,"n_survivors":$nSurvivors,""" +
        s""""n_shards":$nShards,"n_tokens":$nTokens,""" +
        s""""layouts_preexisting":${preexisting.map("\"" + _ + "\"")
          .mkString("[", ",", "]")},""" +
        f""""labels_first_sec":$labelsColdSec%.3f,"labels_reread_sec":$labelsSec%.3f,""" +
        f""""survivors_sec":$svSec%.3f,"pack_iso_sec":$packIsoSec%.3f,""" +
        f""""export_iso_sec":$expIsoSec%.3f,"composed_sec":$composedSec%.3f,""" +
        f""""export_write_sec":$exportSec%.3f,""" +
        s""""shuffles":{"survivors":${svEx._1},"pack_iso":${packIsoEx._1},""" +
        s""""export_iso":${expIsoEx._1},"composed":${composedEx._1}},""" +
        s""""broadcasts":{"survivors":${svEx._2},"pack_iso":${packIsoEx._2},""" +
        s""""export_iso":${expIsoEx._2},"composed":${composedEx._2}},""" +
        s""""payload_exchanges":$payloadLeak}""")
    }
    spark.stop()
  }
}
