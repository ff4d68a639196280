package graft

import org.apache.spark.sql.SparkSession

/** Scale probe for the dedup/ANN family: measures candidate-pair
  * counts and steady-state wall time at two scale factors, so the
  * sub-quadratic claims in SURVEY §9 (DF-capped inverted index, LSH
  * banding) are empirical, not asserted. The growth exponent
  * log(y2/y1)/log(n2/n1) should sit near 1 (linear in corpus size)
  * for every candidate generator — an all-pairs design would show ~2.
  *
  * Usage: `runMain graft.ScaleProbe [sfDir1 sfDir2 ...]`
  * (default sf0.01 + sf0.1). Prints one JSON line per sfDir plus a
  * trailing exponent line comparing the last two dirs.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val probed = Seq(
      "q_dedup_ngram_jaccard", "q_dedup_minhash", "q_dedup_fuzzy_edit",
      "q_sim_knn_graph")

    def bestOf2(f: => Unit): Double = {
      def once: Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }

    val rows = dirs.map { d =>
      val docs = Tables.documents(spark, d).count()
      val vecs = Tables.embeddings(spark, d).count()
      val cands = Map(
        "q_dedup_ngram_jaccard" -> dedup.Dedup.jaccardCandidates(spark, d).count(),
        "q_dedup_minhash" -> dedup.Dedup.minhashCandidates(spark, d).count(),
        "q_dedup_fuzzy_edit" -> dedup.Dedup.fuzzyCandidates(spark, d).count(),
        "q_sim_knn_graph" -> sim.Similarity.knnCandidates(spark, d).count())
      // the log(n) knob the KNN comments promise — now the DEFAULT
      // (adaptiveBits); keep the frozen-6-bit reading for contrast so
      // the adaptive-vs-fixed gap stays measured, not remembered
      val knnFixed6 = sim.Similarity.knnCandidates(spark, d,
        tables = 8, bits = 6).count()
      val annBits = sim.Similarity.adaptiveBits(spark, d)
      // CAPPED-regime Jaccard: ShingleDfCap=32 never binds at these
      // SFs (max DF 25 at sf0.1 — the 1.99 exponent above is pre-cap).
      // Probe with cap=6, which BINDS at both SFs (over-cap count
      // printed as the witness), to measure the flattening the cap is
      // there to provide.
      val probeCap = 6
      val jacCapped = dedup.Dedup.jaccardCandidates(spark, d, cap = probeCap).count()
      val overCap = dedup.Dedup.shinglesOverCap(spark, d, probeCap)
      // SemDeDup cell-count knob: the canonical index sits at the
      // 16-cell floor through sf0.1 (so floor-regime growth reads ~2,
      // like knn_fixed6); with k tracking ceil(n/128) — the adaptive
      // law with the floor lifted — per-cell occupancy is flat and
      // candidate growth should read ~linear.
      val ivfK = sim.Similarity.adaptiveIvfK(spark, d)
      val semFloor = sim.Similarity.semanticCandidates(spark, d).count()
      val kNoFloor = math.max(2, ((vecs + 127) / 128).toInt)
      val semScaled = sim.Similarity.semanticCandidates(spark, d, kNoFloor).count()
      // cross-corpus fuzzy decontamination: banded-MinHash candidates
      // against the paraphrased bench fixture — should track the bench
      // size (~docs/83), i.e. ~linear in corpus
      val decontamCands = text.Corpus.decontamFuzzyCandidates(spark, d).count()
      // two-level IVF: probed candidate rows per query batch and mean
      // (cell, fine) partition occupancy — the per-cell bound the
      // two-level composition exists to hold past the flat-k ceiling
      // (candidates ≈ batch · nprobe · FineNProbe · occupancy, so the
      // exponent should read ~0 once kf leaves its floor)
      val ivf2Cands = sim.Ivf2.ivf2Candidates(spark, d).count()
      // triangle counting: oriented-wedge candidates vs edge count —
      // degree orientation promises wedges = O(|E|^1.5) worst case;
      // the wedge-vs-edge exponent below should sit at or under 1.5
      val (triEdges, triWedges) = operators.Graph.wedgeStats(spark, d)
      // link-prediction witness cap on a deliberately SKEWED graph
      // (one hub on ~10% of edges — absent from the TPC-H-derived
      // co-purchase graph, whose max degree is 62): capped candidates
      // run through the real wedge join (linear); the uncapped count
      // comes from the exact closed form Σ C(deg, 2) — materializing
      // a quadratic set just to count it would itself be the bug
      val skewN = docs * 4
      val skew = operators.Graph.skewedAdj(spark, skewN).localCheckpoint()
      val lpCap = operators.Graph.LinkpredWitnessCap
      val lpCapped = operators.Graph.wedgeCandidates(skew, lpCap).count()
      val lpUncapped = operators.Graph.wedgeCandidateCount(skew, 0)
      val ivf2Parts = sim.Ivf2.ivf2Index(spark, d)
        .select("cell", "fine").distinct().count()
      // round-13: the two claims behind q_diversity_sample2 and
      // q_shard_export, measured. (a) the MAX (cell, fine) stratum —
      // the biggest rank-window partition the two-level sampler ever
      // sorts — should be flat across SFs (exp ~0); (b) occupied
      // shard count grows linearly (exp ~1) while the heaviest
      // shard's token mass stays near the budget (exp ~0) — files
      // stay loader-sized no matter the corpus.
      import org.apache.spark.sql.functions.{count => cnt, lit,
        max => mx, sum => sm}
      val div2MaxOcc = sim.Ivf2.ivf2Index(spark, d)
        .groupBy("cell", "fine")
        .agg(cnt(lit(1)).as("n")).agg(mx("n")).head.getLong(0)
      // adaptive regime: at these SFs the canonical 128-target leaves
      // kf floored (cells ≤ 256 members), so the canonical reading
      // above is floor-regime by construction (like semdedup_floor16);
      // a target of 8 lifts kf off its floor at BOTH SFs and measures
      // the bound the two-level law actually provides (exp ~0)
      val div2MaxOccAdaptive = sim.Ivf2.fineMaxStratumFor(spark, d, 8)
      val shardRow = text.Corpus.shardLayout(spark, d).groupBy("shard")
        .agg(sm("n_tok").as("t"))
        .agg(mx("t").as("m"), cnt(lit(1)).as("c")).head
      val (shardCount, shardMaxTok) =
        (shardRow.getAs[Long]("c"), shardRow.getAs[Long]("m"))
      // round-14 claims, measured. (a) wrapped packing emits a BOUNDED
      // explode — segments ≈ docs + corpus_tokens/2048 (exp ~1, never
      // super-linear); the wrapped shard layout obeys the same
      // file-count law as the flat exporter with the heaviest shard
      // flat. (b) the ANN-composed hybrid's dense leg scores
      // nprobe·cell rows per query — its candidate exponent vs corpus
      // size should sit far below the brute leg's definitional 1.0.
      // (c) overlap chunking is a bounded explode like (a).
      val wrapSegs = text.Corpus.wrapPacked(spark, d).count()
      val wrapShardRow = text.Corpus.wrapShardLayout(spark, d)
        .groupBy("shard").agg(sm("seg_tokens").as("t"))
        .agg(mx("t").as("m"), cnt(lit(1)).as("c")).head
      val (wrapShardCount, wrapShardMaxTok) =
        (wrapShardRow.getAs[Long]("c"), wrapShardRow.getAs[Long]("m"))
      val hybridDense = sim.Similarity.ivfProbes(spark, d)
        .filter(org.apache.spark.sql.functions.col("qid") <
          sim.Similarity.HybridQueries)
        .join(sim.Similarity.ivfIndex(spark, d), Seq("cell")).count()
      // canonical reading above is floor-regime by construction (the
      // 16-cell floor binds through sf0.1, so cells — and with them
      // nprobe·cell candidates — grow with n); a 16-member cell
      // target lifts the floor at BOTH SFs and measures the flat
      // per-query bound the ANN composition exists to provide
      val hybridK16 = math.max(8, ((vecs + 15) / 16).toInt)
      val hybridDenseAdaptive =
        sim.Similarity.hybridDenseCandidatesAt(spark, d, hybridK16)
      val chunkRows = SparkEntry.queries("q_chunk_overlap")(spark, d).count()
      // round-15: the graph-iterate shuffle claims, measured — each
      // PageRank/HITS round joins `pr_edges` rows against the
      // pre-partitioned edge layout (exchange-free on the edge side)
      // and exchanges only ~`pr_nodes` thin rank rows; LPA likewise
      // over the co-purchase adjacency. Exponents ≈ 1 certify that
      // per-iteration shuffle volume is linear in the corpus.
      val (prEdges, prNodes) = operators.Graph.pagerankIterStats(spark, d)
      val (lpaAdj, lpaNodes) = operators.Graph.lpaIterStats(spark, d)
      val secs = probed.map { q =>
        q -> bestOf2(SparkEntry.queries(q)(spark, d)
          .write.format("noop").mode("overwrite").save())
      }.toMap
      // PCA fit = the one-pass moment aggregate (constant 2145-double
      // result); its wall should grow ~linearly with the corpus while
      // the shuffle stays one ~17 KB buffer per partition
      val pcaFitSec = bestOf2 { sim.Pca.momentPass(spark, d); () }
      val fields = probed.map(q =>
        s""""$q":{"candidates":${cands(q)},"sec":${f"${secs(q)}%.3f"}}""") ++ Seq(
        s""""knn_candidates_fixed6bits":$knnFixed6""",
        s""""ann_bits":$annBits""",
        s""""jaccard_capped${probeCap}_candidates":$jacCapped""",
        s""""shingles_over_cap$probeCap":$overCap""",
        s""""ivf_k":$ivfK""",
        s""""semdedup_candidates_floor16":$semFloor""",
        s""""semdedup_candidates_k$kNoFloor":$semScaled""",
        s""""decontam_fuzzy_candidates":$decontamCands""",
        s""""ivf2_candidates":$ivf2Cands""",
        s""""ivf2_partitions":$ivf2Parts""",
        s""""ivf2_mean_occupancy":${vecs / math.max(1L, ivf2Parts)}""",
        s""""diversity2_max_stratum":$div2MaxOcc""",
        s""""diversity2_max_stratum_target8":$div2MaxOccAdaptive""",
        s""""shard_count":$shardCount""",
        s""""shard_max_tokens":$shardMaxTok""",
        s""""triangle_edges":$triEdges""",
        s""""triangle_wedges":$triWedges""",
        s""""linkpred_skew_nodes":$skewN""",
        s""""linkpred_skew_capped_candidates":$lpCapped""",
        s""""linkpred_skew_uncapped_candidates":$lpUncapped""",
        s""""wrap_segments":$wrapSegs""",
        s""""wrap_shard_count":$wrapShardCount""",
        s""""wrap_shard_max_tokens":$wrapShardMaxTok""",
        s""""hybrid_dense_candidates":$hybridDense""",
        s""""hybrid_dense_candidates_target16":$hybridDenseAdaptive""",
        s""""chunk_rows":$chunkRows""",
        s""""pagerank_edges":$prEdges""",
        s""""pagerank_nodes":$prNodes""",
        s""""lpa_adj_rows":$lpaAdj""",
        s""""lpa_nodes":$lpaNodes""",
        s""""pca_fit_sec":${f"$pcaFitSec%.3f"}""")
      println(s"""{"sf":"$d","docs":$docs,"vectors":$vecs,${fields.mkString(",")}}""")
      (d, docs, vecs, cands ++ Map("jaccard_capped" -> jacCapped,
        "knn_fixed6" -> knnFixed6, "sem_floor" -> semFloor,
        "sem_scaled" -> semScaled, "decontam_fuzzy" -> decontamCands,
        "ivf2_cands" -> ivf2Cands, "div2_max" -> div2MaxOcc,
        "div2_max_t8" -> div2MaxOccAdaptive,
        "shard_count" -> shardCount, "shard_max_tok" -> shardMaxTok,
        "tri_edges" -> triEdges,
        "tri_wedges" -> triWedges, "lp_skew_nodes" -> skewN,
        "lp_skew_capped" -> lpCapped, "lp_skew_uncapped" -> lpUncapped,
        "wrap_segs" -> wrapSegs, "wrap_shard_count" -> wrapShardCount,
        "wrap_shard_max_tok" -> wrapShardMaxTok,
        "hybrid_dense" -> hybridDense,
        "hybrid_dense_t16" -> hybridDenseAdaptive,
        "chunk_rows" -> chunkRows,
        "pr_edges" -> prEdges, "pr_nodes" -> prNodes,
        "lpa_adj" -> lpaAdj, "lpa_nodes" -> lpaNodes),
        secs + ("pca_fit" -> pcaFitSec))
    }

    if (rows.size >= 2) {
      val (_, d1docs, d1vecs, c1, s1) = rows(rows.size - 2)
      val (_, d2docs, d2vecs, c2, s2) = rows.last
      def exp(n1: Long, n2: Long, y1: Double, y2: Double): Double =
        if (y1 <= 0 || n2 == n1) Double.NaN
        else math.log(y2 / y1) / math.log(n2.toDouble / n1)
      val fields = probed.map { q =>
        val n1 = if (q.startsWith("q_sim")) d1vecs else d1docs
        val n2 = if (q.startsWith("q_sim")) d2vecs else d2docs
        val ce = exp(n1, n2, c1(q).toDouble, c2(q).toDouble)
        val te = exp(n1, n2, s1(q), s2(q))
        s""""$q":{"candidate_exp":${f"$ce%.2f"},"time_exp":${f"$te%.2f"}}"""
      } ++ Seq(
        s""""jaccard_capped_exp":${f"${exp(d1docs, d2docs, c1("jaccard_capped").toDouble, c2("jaccard_capped").toDouble)}%.2f"}""",
        s""""knn_fixed6_exp":${f"${exp(d1vecs, d2vecs, c1("knn_fixed6").toDouble, c2("knn_fixed6").toDouble)}%.2f"}""",
        s""""semdedup_floor16_exp":${f"${exp(d1vecs, d2vecs, c1("sem_floor").toDouble, c2("sem_floor").toDouble)}%.2f"}""",
        s""""semdedup_adaptive_exp":${f"${exp(d1vecs, d2vecs, c1("sem_scaled").toDouble, c2("sem_scaled").toDouble)}%.2f"}""",
        s""""decontam_fuzzy_exp":${f"${exp(d1docs, d2docs, c1("decontam_fuzzy").toDouble, c2("decontam_fuzzy").toDouble)}%.2f"}""",
        s""""ivf2_candidates_exp":${f"${exp(d1vecs, d2vecs, c1("ivf2_cands").toDouble, c2("ivf2_cands").toDouble)}%.2f"}""",
        s""""diversity2_max_stratum_exp":${f"${exp(d1vecs, d2vecs, c1("div2_max").toDouble, c2("div2_max").toDouble)}%.2f"}""",
        s""""diversity2_max_stratum_target8_exp":${f"${exp(d1vecs, d2vecs, c1("div2_max_t8").toDouble, c2("div2_max_t8").toDouble)}%.2f"}""",
        s""""shard_count_exp":${f"${exp(d1docs, d2docs, c1("shard_count").toDouble, c2("shard_count").toDouble)}%.2f"}""",
        s""""shard_max_tokens_exp":${f"${exp(d1docs, d2docs, c1("shard_max_tok").toDouble, c2("shard_max_tok").toDouble)}%.2f"}""",
        s""""triangle_wedge_vs_edge_exp":${f"${exp(c1("tri_edges"), c2("tri_edges"), c1("tri_wedges").toDouble, c2("tri_wedges").toDouble)}%.2f"}""",
        s""""linkpred_skew_capped_exp":${f"${exp(c1("lp_skew_nodes"), c2("lp_skew_nodes"), c1("lp_skew_capped").toDouble, c2("lp_skew_capped").toDouble)}%.2f"}""",
        s""""linkpred_skew_uncapped_exp":${f"${exp(c1("lp_skew_nodes"), c2("lp_skew_nodes"), c1("lp_skew_uncapped").toDouble, c2("lp_skew_uncapped").toDouble)}%.2f"}""",
        s""""wrap_segments_exp":${f"${exp(d1docs, d2docs, c1("wrap_segs").toDouble, c2("wrap_segs").toDouble)}%.2f"}""",
        s""""wrap_shard_count_exp":${f"${exp(d1docs, d2docs, c1("wrap_shard_count").toDouble, c2("wrap_shard_count").toDouble)}%.2f"}""",
        s""""wrap_shard_max_tokens_exp":${f"${exp(d1docs, d2docs, c1("wrap_shard_max_tok").toDouble, c2("wrap_shard_max_tok").toDouble)}%.2f"}""",
        s""""hybrid_dense_candidates_exp":${f"${exp(d1vecs, d2vecs, c1("hybrid_dense").toDouble, c2("hybrid_dense").toDouble)}%.2f"}""",
        s""""hybrid_dense_candidates_target16_exp":${f"${exp(d1vecs, d2vecs, c1("hybrid_dense_t16").toDouble, c2("hybrid_dense_t16").toDouble)}%.2f"}""",
        s""""chunk_rows_exp":${f"${exp(d1docs, d2docs, c1("chunk_rows").toDouble, c2("chunk_rows").toDouble)}%.2f"}""",
        s""""pagerank_edges_exp":${f"${exp(d1docs, d2docs, c1("pr_edges").toDouble, c2("pr_edges").toDouble)}%.2f"}""",
        s""""pagerank_nodes_exp":${f"${exp(d1docs, d2docs, c1("pr_nodes").toDouble, c2("pr_nodes").toDouble)}%.2f"}""",
        s""""lpa_adj_rows_exp":${f"${exp(d1docs, d2docs, c1("lpa_adj").toDouble, c2("lpa_adj").toDouble)}%.2f"}""",
        s""""lpa_nodes_exp":${f"${exp(d1docs, d2docs, c1("lpa_nodes").toDouble, c2("lpa_nodes").toDouble)}%.2f"}""",
        s""""pca_fit_time_exp":${f"${exp(d1vecs, d2vecs, s1("pca_fit"), s2("pca_fit"))}%.2f"}""")
      println(s"""{"metric":"growth_exponents",${fields.mkString(",")}}""")
    }
    spark.stop()
  }
}
