package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second-decade scale evidence for the dedup/ANN candidate laws.
  *
  * The driver corpus caps at sf0.1 (read-only, TESTDATA.md), so every
  * "survives 100×" claim rested on ONE measured decade
  * (ScaleProbe, sf0.01 → sf0.1). This probe adds the next decade on a
  * DERIVED ~10× corpus built deterministically from sf0.1 — the
  * existing `/tmp/graft_*` fixture discipline — and re-measures the
  * candidate/knob exponents sf0.1 → sf1-equivalent.
  *
  * Fixture construction (no RNG anywhere — byte-reproducible):
  *
  *  - `documents` ×10: copy k ∈ 0..9 re-keys `doc_id` by
  *    k·10^7 and, for k ≥ 1, drops every m_k-th word
  *    (m_k = 3 + ((k−1) mod 8), offset k mod m_k). Copies SHARE the
  *    vocabulary — shingle document frequency grows with the corpus
  *    exactly as a larger crawl's would, so the DF-cap that never
  *    binds at sf0.1 (max DF 25 < cap 32) genuinely BINDS at 10× and
  *    is measured doing its job — while differing drop patterns keep
  *    cross-copy shingle overlap partial, so each original document
  *    seeds a bounded near-dup group (≤ C(10,2) intra-group pairs),
  *    never a quadratic blob. This is the honest shape of "10× more
  *    data from the same distribution, near-dup-heavy like a crawl".
  *
  *  - `embeddings` ×10: copy k re-keys `vec_id` and cyclically
  *    rotates the 64 dimensions by k. A rotation is a coordinate
  *    permutation: within-copy geometry (norms, dot products, and so
  *    every kNN/IVF/cell structure) is preserved EXACTLY, while
  *    cross-copy cosines decorrelate — so sign-LSH bucket occupancy
  *    is pushed up 10× unless the adaptive-bits law re-derives a
  *    deeper code, which is precisely the knob under test.
  *
  * All other tables symlink to the base sfDir so the derived dir is a
  * complete sfDir for any code path that touches them.
  *
  * Usage: `runMain graft.ScaleProbe2 [baseDir] [factor]` (defaults
  * /root/testdata/sf0.1, ×10). Prints one JSON line per dir plus a
  * trailing exponent line, exactly like ScaleProbe.
  */
object ScaleProbe2 {

  private val IdStride = 10L * 1000 * 1000

  /** Distinct word-drop pattern (m, off) for copy `k >= 1`. k <= 9
    * reproduces the committed ×10 construction byte-for-byte
    * (m = 3 + ((k−1) mod 8), off = k mod m — the 9 patterns are
    * pairwise distinct). k >= 10 walks the REMAINING (m, off) space in
    * a fixed enumeration: extending the original rule directly would
    * collide immediately (k = 10 gives (4, 2) = k = 2's pattern, an
    * EXACT duplicate copy that would quadratically inflate the
    * near-dup pair law being measured). 52 patterns total, so the
    * text fixture supports factors up to 53 — enough for the ×30
    * third-decade probe.
    */
  private[graft] def dropPattern(k: Int): (Int, Int) =
    if (k <= 9) { val m = 3 + ((k - 1) % 8); (m, k % m) }
    else {
      val used = (1 to 9).map(dropPattern).toSet
      val free = for (m <- 3 to 10; off <- 0 until m
        if !used((m, off))) yield (m, off)
      require(k - 10 < free.size,
        s"copy $k exceeds the ${free.size + 9} distinct drop patterns")
      free(k - 10)
    }

  /** Build (once) the ×`factor` derived corpus for `baseDir`; returns
    * its directory. Write-once with a `_SUCCESS` marker; a
    * half-written dir (killed build) is cleared and rebuilt.
    *
    * `vecsOnly`: scale ONLY the embeddings (documents symlink to the
    * base like the other tables). The dimension-rotation construction
    * supports factors up to 64 (one distinct rotation per copy of a
    * 64-dim vector), so the vector families can be probed a further
    * decade than the ×10 text corpus — the third measured decade for
    * the ANN/IVF adaptive laws.
    */
  private[graft] def ensureScaled(s: SparkSession, baseDir: String,
      factor: Int, vecsOnly: Boolean = false): String = {
    require(!vecsOnly || factor <= 64,
      s"vecsOnly factor $factor exceeds the 64 distinct dimension rotations")
    val tag = if (vecsOnly) "xv" else "x"
    val dir = java.nio.file.Paths.get(
      s"/tmp/graft_scale$factor${tag}_${Tables.cacheKey(baseDir)}")
    synchronized {
      if (!java.nio.file.Files.exists(dir.resolve("_SUCCESS"))) {
        if (java.nio.file.Files.exists(dir)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.delete)
        }
        java.nio.file.Files.createDirectories(dir)
        if (!vecsOnly) {
          val docs = Tables.documents(s, baseDir)
            .select("doc_id", "text", "lang", "source", "n_chars")
          val docCopies = (0 until factor).map { k =>
            if (k == 0) docs
            else {
              val (m, off) = dropPattern(k)
              docs.select(
                (col("doc_id") + lit(k * IdStride)).as("doc_id"),
                array_join(filter(split(col("text"), " "),
                  (_, i) => (i + lit(off)) % m =!= 0), " ").as("text"),
                col("lang"), col("source"))
                .withColumn("n_chars", length(col("text")).cast("long"))
            }
          }
          docCopies.reduce(_ unionAll _).repartition(32)
            .write.parquet(s"$dir/documents.parquet")
        }
        val vecs = Tables.embeddings(s, baseDir)
          .select("vec_id", "embedding", "label")
        val vecCopies = (0 until factor).map { k =>
          if (k == 0) vecs
          else vecs.select(
            (col("vec_id") + lit(k * IdStride)).as("vec_id"),
            expr(s"concat(slice(embedding, ${k + 1}, size(embedding) - $k)," +
              s" slice(embedding, 1, $k))").as("embedding"),
            col("label"))
        }
        vecCopies.reduce(_ unionAll _).repartition(32)
          .write.parquet(s"$dir/embeddings.parquet")
        Tables.names
          .filterNot(n => n == "embeddings" || (n == "documents" && !vecsOnly))
          .foreach { n =>
            java.nio.file.Files.createSymbolicLink(
              dir.resolve(s"$n.parquet"),
              java.nio.file.Paths.get(s"$baseDir/$n.parquet"))
          }
        java.nio.file.Files.createFile(dir.resolve("_SUCCESS"))
      }
    }
    dir.toString
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // "vecs" mode: scale ONLY the embeddings (the rotation fixture
    // supports factors up to 64, past the ×10 the text corpus allows)
    // and probe only the vector families — the THIRD measured decade
    // for the ANN/IVF adaptive laws
    val vecsMode = args.length > 2 && args(2) == "vecs"
    val scaled = ensureScaled(spark, baseDir, factor, vecsMode)
    val dirs = Seq(baseDir, scaled)

    // the six families the one-decade probe left extrapolated: the
    // four canonical candidate generators, SemDeDup, and the IVF path
    val timed =
      if (vecsMode) Seq("q_sim_knn_graph", "q_dedup_semantic", "q_sim_ann_ivf")
      else Seq(
        "q_dedup_ngram_jaccard", "q_dedup_minhash", "q_dedup_fuzzy_edit",
        "q_sim_knn_graph", "q_dedup_semantic", "q_sim_ann_ivf")

    def bestOf2(f: => Unit): Double = {
      def once: Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }

    val rows = dirs.map { d =>
      val docs = Tables.documents(spark, d).count()
      val vecs = Tables.embeddings(spark, d).count()
      // canonical candidate generators (production knobs untouched):
      // the DF cap binds at the scaled dir (witness printed), so the
      // canonical jaccard exponent here measures the CAPPED regime —
      // the regime 100 TB actually runs in
      val cands = (if (vecsMode) Map.empty[String, Long] else Map(
        "q_dedup_ngram_jaccard" -> dedup.Dedup.jaccardCandidates(spark, d).count(),
        "q_dedup_minhash" -> dedup.Dedup.minhashCandidates(spark, d).count(),
        "q_dedup_fuzzy_edit" -> dedup.Dedup.fuzzyCandidates(spark, d).count())) ++
        Map("q_sim_knn_graph" -> sim.Similarity.knnCandidates(spark, d).count())
      val overCap = if (vecsMode) -1L else dedup.Dedup.shinglesOverCap(spark, d,
        dedup.Dedup.ShingleDfCap)
      // the established capped-regime methodology (round-7): probe
      // with a cap that BINDS at both dirs, so the flattening the cap
      // provides is measured in-regime, not mid-transition
      val probeCap = 6
      val jacCapped = if (vecsMode) -1L
        else dedup.Dedup.jaccardCandidates(spark, d, cap = probeCap).count()
      val overCap6 = if (vecsMode) -1L
        else dedup.Dedup.shinglesOverCap(spark, d, probeCap)
      // the frozen-width counterfactual is exactly quadratic (measured
      // 2.00 at the ×10 decade); materializing it past ~30k vectors
      // would count billions of pairs — the loud −1 sentinel marks it
      // deliberately skipped, the linkpred-uncapped precedent
      val knnFixed6 = if (vecs > 30000) -1L
        else sim.Similarity.knnCandidates(spark, d, tables = 8, bits = 6).count()
      val annBits = sim.Similarity.adaptiveBits(spark, d)
      // SemDeDup: the adaptive cell-count law with the floor lifted
      // (k tracks ceil(n/128)) — per-cell occupancy should stay flat
      val ivfK = sim.Similarity.adaptiveIvfK(spark, d)
      val kNoFloor = math.max(2, ((vecs + 127) / 128).toInt)
      val semScaled = sim.Similarity.semanticCandidates(spark, d, kNoFloor).count()
      // IVF probe path: two-level candidates + partition occupancy,
      // and the hybrid dense leg at a floor-lifting cell target
      val ivf2Cands = sim.Ivf2.ivf2Candidates(spark, d).count()
      val ivf2Parts = sim.Ivf2.ivf2Index(spark, d)
        .select("cell", "fine").distinct().count()
      val div2MaxT8 = sim.Ivf2.fineMaxStratumFor(spark, d, 8)
      val hybridK16 = math.max(8, ((vecs + 15) / 16).toInt)
      val hybridT16 =
        sim.Similarity.hybridDenseCandidatesAt(spark, d, hybridK16)
      val decontamCands = if (vecsMode) -1L
        else text.Corpus.decontamFuzzyCandidates(spark, d).count()
      val secs = timed.map { q =>
        q -> bestOf2(SparkEntry.queries(q)(spark, d)
          .write.format("noop").mode("overwrite").save())
      }.toMap
      val fields = timed.map(q =>
        s""""$q":{${cands.get(q).map(c => s""""candidates":$c,""").getOrElse("")}"sec":${f"${secs(q)}%.3f"}}""") ++ Seq(
        s""""shingles_over_cap${dedup.Dedup.ShingleDfCap}":$overCap""",
        s""""jaccard_capped${probeCap}_candidates":$jacCapped""",
        s""""shingles_over_cap$probeCap":$overCap6""",
        s""""knn_candidates_fixed6bits":$knnFixed6""",
        s""""ann_bits":$annBits""",
        s""""ivf_k":$ivfK""",
        s""""semdedup_candidates_k$kNoFloor":$semScaled""",
        s""""ivf2_candidates":$ivf2Cands""",
        s""""ivf2_partitions":$ivf2Parts""",
        s""""ivf2_mean_occupancy":${vecs / math.max(1L, ivf2Parts)}""",
        s""""diversity2_max_stratum_target8":$div2MaxT8""",
        s""""hybrid_dense_candidates_target16":$hybridT16""",
        s""""decontam_fuzzy_candidates":$decontamCands""")
      println(s"""{"dir":"$d","docs":$docs,"vectors":$vecs,${fields.mkString(",")}}""")
      (docs, vecs,
        cands ++ Map("jaccard_capped" -> jacCapped,
          "knn_fixed6" -> knnFixed6,
          "sem_scaled" -> semScaled, "ivf2_cands" -> ivf2Cands,
          "div2_max_t8" -> div2MaxT8, "hybrid_t16" -> hybridT16,
          "decontam_fuzzy" -> decontamCands),
        secs)
    }

    val (d1docs, d1vecs, c1, s1) = rows.head
    val (d2docs, d2vecs, c2, s2) = rows.last
    def exp(n1: Long, n2: Long, y1: Double, y2: Double): Double =
      if (y1 <= 0 || n2 == n1) Double.NaN
      else math.log(y2 / y1) / math.log(n2.toDouble / n1)
    // semantic dedup is embeddings-based despite the q_dedup_ prefix
    def isVec(q: String): Boolean =
      q.startsWith("q_sim") || q == "q_dedup_semantic"
    val fields = timed.map { q =>
      val (n1, n2) = if (isVec(q)) (d1vecs, d2vecs) else (d1docs, d2docs)
      val ce = c1.get(q).map(v =>
        s""""candidate_exp":${f"${exp(n1, n2, v.toDouble, c2(q).toDouble)}%.2f"},""").getOrElse("")
      val te = exp(n1, n2, s1(q), s2(q))
      s""""$q":{$ce"time_exp":${f"$te%.2f"}}"""
    } ++ (if (vecsMode) Seq.empty[String] else Seq(
      s""""jaccard_capped_exp":${f"${exp(d1docs, d2docs, c1("jaccard_capped").toDouble, c2("jaccard_capped").toDouble)}%.2f"}""",
      s""""decontam_fuzzy_exp":${f"${exp(d1docs, d2docs, c1("decontam_fuzzy").toDouble, c2("decontam_fuzzy").toDouble)}%.2f"}""")
    ) ++ (if (c1("knn_fixed6") < 0 || c2("knn_fixed6") < 0) Seq.empty[String]
      else Seq(
        s""""knn_fixed6_exp":${f"${exp(d1vecs, d2vecs, c1("knn_fixed6").toDouble, c2("knn_fixed6").toDouble)}%.2f"}""")
    ) ++ Seq(
      s""""semdedup_adaptive_exp":${f"${exp(d1vecs, d2vecs, c1("sem_scaled").toDouble, c2("sem_scaled").toDouble)}%.2f"}""",
      s""""ivf2_candidates_exp":${f"${exp(d1vecs, d2vecs, c1("ivf2_cands").toDouble, c2("ivf2_cands").toDouble)}%.2f"}""",
      s""""diversity2_max_stratum_target8_exp":${f"${exp(d1vecs, d2vecs, c1("div2_max_t8").toDouble, c2("div2_max_t8").toDouble)}%.2f"}""",
      s""""hybrid_dense_candidates_target16_exp":${f"${exp(d1vecs, d2vecs, c1("hybrid_t16").toDouble, c2("hybrid_t16").toDouble)}%.2f"}""")
    val label = if (vecsMode) "growth_exponents_vecs" else "growth_exponents_decade2"
    println(s"""{"metric":"$label",${fields.mkString(",")}}""")
    spark.stop()
  }
}
