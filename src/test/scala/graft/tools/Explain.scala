package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.SimpleMode

/** Ad-hoc plan printer (test scope): print the physical plan of the
  * named queries at sf0.001. `sbt "Test/runMain graft.tools.Explain q_x"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.create("local[4]", 4)
    s.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (n <- args) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(s, d).queryExecution.explainString(SimpleMode))
    }
    s.stop()
  }
}
