package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Recall probe: KNN-graph and ANN-LSH recall vs the brute-force
  * top-5 at an arbitrary sf dir — the companion to ScaleProbe, so the
  * adaptive-signature-width trade (candidate exponent vs recall) stays
  * measured on BOTH axes whenever the width formula or probe shells
  * change. `runMain graft.RecallProbe [sfDir]`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.VectorFunctions.register(spark)
    val e = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vid")).orderBy(col("cos_sim").desc, col("nid"))
    val brute = e.select(col("vec_id").as("vid"), col("embedding").as("va"))
      .join(e.select(col("vec_id").as("nid"), col("embedding").as("vb")),
        col("vid") =!= col("nid"))
      .select(col("vid"), col("nid"), expr("cosine_sim(va, vb)").as("cos_sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("vid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val knn = SparkEntry.queries("q_sim_knn_graph")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    println(s"knn_recall=${(brute intersect knn).size.toDouble / brute.size}")
    val qs = brute.groupBy(_._1).filter(_._1 < sim.Similarity.QueryBatch)
    val bq = qs.values.flatten.toSet
    val lsh = SparkEntry.queries("q_sim_ann_lsh")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    println(s"ann_lsh_recall=${(bq intersect lsh).size.toDouble / bq.size}")
    spark.stop()
  }
}
