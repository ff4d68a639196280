package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Streaming fixed-cost profiler: drains the heaviest stream-stream
  * join twice and prints per-batch durationMs + stateOperators
  * timings — the instrument behind BASELINE.md's round-7 streaming
  * cost table. Env: PROF_PROVIDER / PROF_CHANGELOG / PROF_PARTS to
  * A/B state-store provider and partitioning.
  * `runMain graft.StreamProf`.
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = Tables.t(spark, d, "events").schema
    val dir3 = java.nio.file.Paths.get("/tmp", "graft_stream3_" + Tables.cacheKey(d))
    def ev = Tables.normalizeTs(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(dir3.toString))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "30 minutes")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "30 minutes")
    val joined = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("c_id"), col("p_id"), col("c_user").as("user_id"))
    sys.env.get("PROF_PROVIDER").foreach { pc =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", pc)
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        sys.env.getOrElse("PROF_CHANGELOG", "false"))
    }
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROF_PARTS", "4"))
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(s"prof_$i")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime()-t0)/1e9
      println(s"== run $i wall ${f"$wall%.2f"}s nbatches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        println(s"batch ${p.batchId}: rows=${p.numInputRows} dur=${p.durationMs}")
        p.stateOperators.foreach(so => println(s"   state: updates=${so.allUpdatesTimeMs}ms removes=${so.allRemovalsTimeMs}ms commit=${so.commitTimeMs}ms rows=${so.numRowsTotal}"))
      }
    }
    spark.stop()
  }
}
