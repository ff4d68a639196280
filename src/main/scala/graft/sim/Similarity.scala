package graft.sim

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over `embeddings.embedding`.
  *
  *  - `q_sim_topk`: brute-force cosine top-k — the correctness
  *    baseline. The (small) query set is broadcast against the corpus,
  *    so the corpus never shuffles; per-query top-k is a windowed
  *    rank inside each query partition. At 100 TB this is the shape
  *    you run for a bounded query batch.
  *  - `q_sim_ann_lsh`: the scale path — 16 random-hyperplane sign bits
  *    bucket the corpus (shuffle on bucket id only); candidates are
  *    same-bucket pairs, scored exactly within the bucket. Recall < 1
  *    by construction → rows-only check.
  *
  * Scoring uses the codegen'd CosineSim expression
  * (graft.functions.CosineSim).
  */
object Similarity {

  /** Sign bucket of `v` against the shared seeded hyperplane set
    * (graft.functions.Planes — potpot itself seeds its hasher,
    * reference `src/hashtable.rs:95-96`). 6 bits = 64 buckets — sized
    * so test-corpus buckets stay populated; at real scale the bit
    * count grows with corpus size (bits ≈ log2(n/target bucket size)).
    * One band of 6 bits through the codegen'd `plane_sigs` kernel —
    * a single fused pass instead of 6 interpreted HOF folds.
    */
  private val LshBits = 6

  private def lshBucket(s: SparkSession, v: String): Column = {
    VectorFunctions.register(s)
    element_at(expr(s"plane_sigs($v, $LshBits, $LshBits)"), 1)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force exact top-5 cosine neighbors for a query subset.
    "q_sim_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc, col("nid"))
      broadcast(q).join(e, col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          VectorFunctions.cosineSim(s, "qv", "embedding").as("cos_sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("nid"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("qid"), col("rk"))
    }),

    // IVF-style ANN: a KMeans coarse quantizer (seeded, k=16) cells
    // the corpus; each query searches only its own cell (nprobe=1).
    // At 100 TB the cell assignment is a one-time layout (like
    // bucketing) and query cost drops by ~k×. Rows-only (approximate
    // by design).
    "q_sim_ann_ivf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
          array_to_vector(col("embedding")).as("features"))
      val model = new KMeans().setK(16).setSeed(42L).setMaxIter(5)
        .setFeaturesCol("features").fit(e)
      val celled = model.transform(e)
        .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
      val q = celled.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("cell").as("qcell"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc, col("nid"))
      broadcast(q)
        .join(celled, col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          VectorFunctions.cosineSim(s, "qv", "embedding").as("cos_sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("nid"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("qid"), col("rk"))
    }),

    // LSH-bucketed ANN with multi-probe: the query searches its own
    // sign bucket plus every 1-bit-flip neighbor (sign bits near a
    // hyperplane are the ones most likely to disagree between true
    // neighbors). Probing stays an equi-join on bucket id — the
    // scale-friendly shape — while recall rises several-fold vs
    // single-bucket probing. Rows-only (approximate by design).
    "q_sim_ann_lsh" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
        .withColumn("bucket", lshBucket(s, "embedding"))
      val probes = array(lit(0) +: (0 until LshBits).map(b => lit(1 << b)): _*)
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          explode(transform(probes, m => col("bucket").bitwiseXOR(m)))
            .as("qbucket"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos_sim").desc, col("nid"))
      broadcast(q)
        .join(e, col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          VectorFunctions.cosineSim(s, "qv", "embedding").as("cos_sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("rk"), col("nid"),
          round(col("cos_sim"), 6).as("cos_sim"))
        .orderBy(col("qid"), col("rk"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_sim_topk" ->
      """SELECT qid, rk, nid, round(cos_sim, 6) AS cos_sim FROM (
        |  SELECT qid, nid, cos_sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rk
        |  FROM (
        |    SELECT q.vec_id AS qid, e.vec_id AS nid,
        |      list_sum(list_transform(generate_series(1, len(q.embedding)),
        |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
        |      / sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
        |           * list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS cos_sim
        |    FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
        |    WHERE q.vec_id % 100 = 0) pairs) ranked
        |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin
  )
}
