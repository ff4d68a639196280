package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc smoke runner (test scope, not part of the library): run the
  * named queries once at sf0.01 and print row counts + timings.
  * `sbt "Test/runMain graft.tools.Smoke q_foo q_bar"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.create("local[8]", 8)
    s.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.get("SPARK_GRAFT_SMOKE_OUT")
    for (n <- args) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(s, d)
      val rows = df.collect()
      println(f"=== $n rows=${rows.length} in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      rows.take(8).foreach(r => println("    " + r))
      outDir.foreach(o =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$o/$n.parquet"))
    }
    s.stop()
  }
}
