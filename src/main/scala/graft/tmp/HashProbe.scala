package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary probe: dump xxhash64-of-string + minhash16 ground truth
  * for oracle development. Deleted before commit.
  */
object HashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.HashFunctions.register(spark)
    import spark.implicits._
    val strs = (0 to 100).map(n => ("x" * 0 + ("abcdefgh" * 16).take(n))) ++
      Seq("", "a", "hello world", "the quick brown fox jumps over the lazy dog")
    val df = strs.toDF("s")
    df.select(col("s"), length(col("s")).as("n"), xxhash64(col("s")).as("h"),
        expr("minhash16(array(s))").as("m1"),
        xxhash64(lit(1L), lit(2L), lit(3L), lit(4L)).as("band_demo"))
      .coalesce(1).write.mode("overwrite").json("/tmp/hashprobe")
    spark.stop()
  }
}
