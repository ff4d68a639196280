package graft

import org.apache.spark.sql.execution.FormattedMode

/** Formatted-plan snapshot tool for the optimization rounds: writes
  * `.explain("formatted")` of each named query to
  * `plans/r17/<query>_<tag>.txt` so before/after plan-shape claims in
  * OPTIMIZATION_r17.md are checkable without running Spark.
  *
  * `runMain graft.PlanDumpF <tag> q_foo q_bar ...` (tag = "before" /
  * "after"). Dev tool only; not part of the driver contract. Uses the
  * bench session shape (local[32], shuffle=32, AQE on) so the dumped
  * plan is the one the bench actually runs, at sf0.1 — plan SHAPE is
  * what these files pin; AQE runtime re-planning is noted where a
  * claim depends on it.
  */
object PlanDumpF {
  def main(args: Array[String]): Unit = {
    val tag = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans", "r17")
    java.nio.file.Files.createDirectories(outDir)
    for (q <- args.tail) {
      val txt = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${q}_$tag.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${q}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
