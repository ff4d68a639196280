package graft

import org.apache.spark.sql.execution.SimpleMode

/** Plan-shape inspection helper: prints the physical plan of each
  * named query at sf0.001 — the iterate-on-.explain loop behind every
  * PlanSpec pin (`runMain graft.PlanDump q_foo q_bar`). Dev tool only;
  * not part of the driver contract.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(SimpleMode))
    }
    spark.stop()
  }
}
