package graft
import org.apache.spark.sql.functions._
import graft.Exact._
object RepartProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def q1(base: org.apache.spark.sql.DataFrame) = base
      .filter(col("l_shipdate") <= lit("1999-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(money(col("l_extendedprice")) * (one - rate(col("l_discount")))
          * (one + rate(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(money(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    def time(label: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime()-t0)/1e9
      }
      println(f"[probe] $label min=${ts.min}%.3f all=${ts.map(t=>f"$t%.2f").mkString(",")}")
    }
    time("q1 plain      ", () => q1(Tables.lineitem(s, d)))
    time("q1 repart32   ", () => q1(Tables.lineitem(s, d).repartition(32)))
    time("q1 repartkey  ", () => q1(Tables.lineitem(s, d).repartition(col("l_orderkey"))))
    s.stop()
  }
}
