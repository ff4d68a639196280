package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents.text`: tokenization, quality
  * scoring, language-ID heuristic, and document fingerprinting — the
  * per-document stages of a training-data pipeline.
  *
  * All of it is array-lambda built-ins (`split`/`filter`/`transform`/
  * `aggregate`) evaluated per-row with no explode/shuffle: embarrassingly
  * parallel map work, the shape that scales linearly to 100 TB. Integer
  * arithmetic throughout keeps DuckDB oracle parity exact.
  */
object TextOps {

  private def toks(c: Column): Column = split(c, " ")

  /** Min-K%: the bottom share of a document's tokens that scores its
    * membership signal (Shi et al. 2023 use K = 20 as the robust
    * default). k_cnt = ⌈n·K/100⌉ in exact integers.
    */
  val MinKPct = 20L

  /** The per-document min-k% table (doc_id, n_tok, k_cnt, mink_mass)
    * shared by q_mink_prob and q_dataset_infer — exposed so the spec
    * can replay the ranking law. Token "probability" under the corpus
    * unigram LM is cnt/total, so the bottom-K%-by-logprob selection ≡
    * bottom-K%-by-count under the TOTAL order (cnt, tok, pos) — exact
    * in both engines, no ln() anywhere. The ranking window and the
    * per-doc aggregate share the doc_id key (one exchange); only thin
    * (doc_id, pos, tok, cnt) rows enter it.
    */
  private[graft] def minkPerDoc(s: SparkSession, d: String): DataFrame =
    minkPerDocOf(Tables.documents(s, d))

  /** [[minkPerDoc]] over ANY (doc_id, text) table — exposed so the
    * spec can plant a duplicated (member) document and a unique
    * (non-member) one and assert the signal separates them, the
    * paper's claim in miniature.
    */
  private[graft] def minkPerDocOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toksDf = docs
      .select(col("doc_id"),
        posexplode(toks(col("text"))).as(Seq("pos", "tok")))
    val freq = toksDf.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("doc_id"))
    toksDf.join(freq, "tok")
      .withColumn("rnk", row_number().over(
        w.orderBy(col("cnt"), col("tok"), col("pos"))))
      .withColumn("n_tok", count(lit(1)).over(w))
      .groupBy(col("doc_id"))
      .agg(max(col("n_tok")).as("n_tok"),
        max(expr(s"(n_tok * $MinKPct + 99) div 100")).as("k_cnt"),
        sum(when(col("rnk") <= expr(s"(n_tok * $MinKPct + 99) div 100"),
          col("cnt")).otherwise(0L)).as("mink_mass"))
  }

  /** The fixed-weight logistic quality MODEL — weights and feature
    * formulas live here only, shared by `q_quality_logistic` (the
    * filter) and `Sft.q_pref_pairs` (the preference-pair miner): one
    * codegen'd projection per row producing (doc_id, lang, source,
    * stop_ratio, avg_len, dup_ratio, score). The sigmoid is one exp +
    * divide mirrored operand-for-operand by [[qualityScoredSql]].
    */
  private[graft] def qualityScored(s: SparkSession, d: String): DataFrame = {
    graft.functions.TextFunctions.register(s)
    val z = lit(1.3) + lit(3.0) * col("stop_ratio") +
      lit(0.15) * col("avg_len") - lit(4.0) * col("dup_ratio")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("text_stats(split(text, ' '))").as("st"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("n_distinct"))
      .select(col("doc_id"), col("lang"), col("source"),
        (col("st.n_stop").cast("double") / col("st.n_tokens"))
          .as("stop_ratio"),
        (col("st.char_sum").cast("double") / col("st.n_tokens"))
          .as("avg_len"),
        (lit(1.0) - col("n_distinct").cast("double") / col("st.n_tokens"))
          .as("dup_ratio"))
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-z)))
  }

  /** Tokens present in a tiny English function-word list — the signal
    * for both the quality score and the language-ID heuristic (single
    * source of truth in graft.functions.GraftText).
    */
  private val stopwords: Seq[String] = graft.functions.GraftText.Stopwords.toSeq

  /** q_feature_hash vector width. Real hashing-trick vectorizers use
    * 2^18-2^20 buckets; the width is a constant in the per-row
    * expression, so it is a quality knob, not a scale one.
    */
  val FeatureDim = 16

  /** q_vocab_coverage vocabulary size (real tokenizers: 32k-256k; the
    * vocab stays broadcast-size at any corpus scale either way).
    */
  val VocabCoverageK = 500

  /** q_bm25 query terms — a bounded user search query (the filtered-
    * search contract; a query is words, not a corpus). Mid-frequency
    * corpus terms so idf and tf-saturation both exercise.
    */
  val Bm25Terms: Seq[String] = Seq("spark", "vector", "merge")

  /** q_phrase_search query phrase — a bounded exact phrase with
    * multiple corpus occurrences (so the position scan is exercised).
    */
  val PhraseTerms: Seq[String] = Seq("join", "part", "filter")

  /** q_doremi_weights iteration budget and step size. The iterate is
    * a fixed-point toward score-equalized mixture weights; both are
    * quality knobs (the per-step cost is one aggregate over the
    * ≤ |domains| table regardless).
    */
  val DoremiIters = 8
  val DoremiEtaPm = 500L

  /** The DoReMi multiplicative-weights iterate (see q_doremi_weights)
    * — shared by the weights query and the mixture plan, written ONCE
    * as a layout (the q_sim_knn_graph precedent: the iterate is a
    * deterministic pure function of the corpus, and a mixture-weight
    * table is a per-corpus ARTIFACT every consumer re-reads, not a
    * per-query recomputation). Returns (source, n_tokens, share_ppm,
    * score_pm, w_ppm), unordered.
    */
  private[graft] def doremiWeights(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.ensureLayout(s, d, "doremi_weights") {
      doremiIterate(s, d)
    }

  private[graft] def doremiIterate(s: SparkSession, d: String): DataFrame = {
    graft.functions.TextFunctions.register(s)
    val dom = Tables.documents(s, d)
      .select(col("source"), expr("text_stats(split(text, ' '))").as("st"))
      .groupBy(col("source"))
      .agg(sum(col("st.n_tokens")).as("n_tokens"),
        sum(col("st.n_stop")).as("n_stop"))
      .select(col("source"), col("n_tokens"),
        expr("n_stop * 1000 div n_tokens").as("score_pm"))
      .localCheckpoint()
    // |domains| is bounded (the broadcast-dim class); the 1-row
    // count seeds the uniform start
    val nDom = math.max(1L, dom.count())
    var w = dom.withColumn("w", lit(1000000L / nDom))
    for (_ <- 1 to DoremiIters) {
      val ref = w.agg(expr("sum(w * score_pm) div sum(w)").as("ref"))
      val u = w.crossJoin(broadcast(ref))
        .withColumn("u", col("w").cast("decimal(38,0)") *
          (lit(1000000L) +
            lit(DoremiEtaPm) * (col("score_pm") - col("ref"))))
        .localCheckpoint()
      val tot = u.agg(sum(col("u")).as("tot_u"))
      w = u.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens"), col("score_pm"),
          expr("CAST(u * 1000000 div tot_u AS BIGINT)").as("w"))
        .localCheckpoint()
    }
    w.crossJoin(broadcast(dom.agg(
        sum(col("n_tokens")).cast("decimal(38,0)").as("tot_tok"))))
      .select(col("source"), col("n_tokens"),
        expr("""CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000
               div tot_tok AS BIGINT)""").as("share_ppm"),
        col("score_pm"), col("w").as("w_ppm"))
  }

  /** The per-doc fluency-tercile table (doc_id, lang, score_pm,
    * bucket) behind q_perplexity_buckets — shared with the curriculum
    * schedule. Unordered.
    */
  private[graft] def pplBuckets(s: SparkSession, d: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val bigrams = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), toks(col("text")).as("l"))
        .filter(size(col("l")) >= 2)
        .select(col("doc_id"), col("lang"), explode(expr(
          """transform(sequence(1, size(l) - 1),
            |  i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"""
            .stripMargin)).as("bg"))
      val freq = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      // localCheckpoint: the thin (doc_id, lang, score_pm) table feeds
      // BOTH the cutoff derivation and the final bucketing join —
      // without the barrier Catalyst replays the corpus-wide bigram
      // aggregate once per consumer (the q_market_basket lesson)
      val score = bigrams.join(freq, "bg")
        .groupBy(col("doc_id"), col("lang"))
        .agg(expr("sum(CASE WHEN cnt >= 3 THEN 1 ELSE 0 END) * 1000" +
          " div count(1)").as("score_pm"))
        .localCheckpoint()
      val hist = score.groupBy(col("lang"), col("score_pm"))
        .agg(count(lit(1)).as("n"))
      val wCum = Window.partitionBy(col("lang"))
        .orderBy(col("score_pm").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cuts = hist
        .withColumn("cum", sum(col("n")).over(wCum))
        .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("lang"))))
        .groupBy(col("lang"))
        .agg(max(when(col("cum") * 3 >= col("tot"), col("score_pm")))
            .as("h1"),
          max(when(col("cum") * 3 >= col("tot") * 2, col("score_pm")))
            .as("h2"))
      score.join(broadcast(cuts), "lang")
        .select(col("doc_id"), col("lang"), col("score_pm"),
          when(col("score_pm") >= col("h1"), "head")
            .when(col("score_pm") >= col("h2"), "middle")
            .otherwise("tail").as("bucket"))
  }

  /** The shared BM25 scoring expression — one Column tree used by
    * both the rescan form (q_bm25) and the index-served form
    * (q_index_search), so their doubles are identical by
    * construction. Expects columns tf_<t>, dl, n_docs, sum_dl,
    * df_<t>.
    */
  private def bm25ScoreCol(terms: Seq[String]): Column = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    terms.map { t =>
      val idf = (col("n_docs") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5))
      idf * (col(s"tf_$t") * lit(2.2)) /
        (col(s"tf_$t") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    }.reduceLeft(_ + _)
  }

  /** Write-once INVERTED INDEX layout: (term, doc_id, tf) postings,
    * term-sorted within term-hashed files so a term-IN predicate
    * prunes parquet row groups via min/max stats — the posting-list
    * read pattern of a search engine, paid once per corpus at ingest.
    */
  private[graft] def textIndex(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.ensureLayout(s, d, "text_index") {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
        .repartition(col("term"))
        .sortWithinPartitions(col("term"), col("doc_id"))
    }

  /** Write-once per-doc length table — the tiny sidecar every
    * length-normalized scorer needs without touching text.
    */
  private[graft] def docStats(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.ensureLayout(s, d, "doc_stats") {
      Tables.documents(s, d)
        .select(col("doc_id"), size(toks(col("text"))).cast("long").as("dl"))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Vocabulary building: corpus-wide token frequencies, top 100.
    // Explode → partial-agg → TakeOrderedAndProject: the map-side
    // combine collapses each partition to its distinct tokens before
    // the single shuffle, and top-k never sorts globally — the shape
    // that builds a BPE/vocab table from 100 TB of text.
    "q_vocab_topk" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(toks(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(100)),

    // Tokenizer-vocabulary COVERAGE: what share of corpus token
    // occurrences a top-K vocabulary covers, per source and overall —
    // the OOV-rate measurement that decides a vocab size (and flags a
    // domain the tokenizer underserves: a low-coverage source will
    // fragment into more pieces per word). The vocab is the exact
    // top-K frequency head (deterministic tiebreak); coverage counts
    // via ONE pass over the exploded tokens with the K-row vocab
    // BROADCAST into a map-combined conditional sum — no second
    // corpus scan, no per-token shuffle beyond the (source, sums)
    // aggregate. Integer per-mille output; fully oracled.
    "q_vocab_coverage" -> ((s, d) => {
      val vocab = Tables.documents(s, d)
        .select(explode(toks(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token")).limit(VocabCoverageK)
        .select(col("token"), lit(1).as("in_vocab"))
      val per = Tables.documents(s, d)
        .select(col("source"), explode(toks(col("text"))).as("token"))
        .join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(coalesce(col("in_vocab"), lit(0)).cast("long")).as("n_covered"))
      per.unionAll(per.agg(sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_covered")).as("n_covered"))
        .select(lit("(all)").as("source"), col("n_tokens"), col("n_covered")))
        .select(col("source"), col("n_tokens"), col("n_covered"),
          (col("n_covered") * 1000L / col("n_tokens")).cast("long")
            .as("coverage_pm"))
        .orderBy(col("source"))
    }),

    // Sketch-based heavy hitters: approx_top_k (DataSketches frequent
    // items) over the token stream — ONE constant-size sketch per
    // partition merged once, vs the exact form's full-vocabulary
    // shuffle. At 100 TB the exact groupBy exchanges every distinct
    // token; the sketch exchanges kilobytes per partition and is the
    // single-pass answer when the vocabulary outgrows the shuffle.
    // Published ranks come from a DETERMINISTIC re-rank of the
    // sketch's items ((freq DESC, token) — the sketch's own emission
    // order on count ties is engine internals), which is what lets
    // the operator carry a hard oracle (round 12): in the sketch's
    // exact regime (distinct tokens ≪ the 4096-slot map — the spec
    // pins sketch == exact head at test scale) the estimates ARE the
    // exact counts, so the DuckDB exact top-20 matches hash-for-hash.
    "q_heavy_hitters" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("freq").desc, col("token"))
      Tables.documents(s, d)
        .select(explode(toks(col("text"))).as("token"))
        .agg(expr("approx_top_k(token, 20, 4096)").as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e.item").as("token"),
          col("e.count").cast("long").as("freq"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .select(col("rk"), col("token"), col("freq"))
        .orderBy(col("rk"))
    }),

    // Whitespace token counts (total + distinct) per document.
    "q_text_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks(col("text"))).cast("long").as("n_tokens"),
          size(array_distinct(toks(col("text")))).cast("long").as("n_distinct"))
        .orderBy(col("doc_id"))),

    // Quality scoring: stopword ratio + mean token length via the
    // single-pass TextStats kernel (no explode → no shuffle).
    "q_text_quality" -> ((s, d) => {
      graft.functions.TextFunctions.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          expr("text_stats(split(text, ' '))").as("st"))
        .select(col("doc_id"), col("lang"),
          col("st.n_tokens").as("n_tokens"), col("st.n_stop").as("n_stop"),
          (col("st.n_stop").cast("double") / col("st.n_tokens")).as("stop_ratio"),
          (col("st.char_sum").cast("double") / col("st.n_tokens")).as("avg_token_len"))
        .orderBy(col("doc_id"))
    }),

    // MODEL-BASED quality filter — the fixed-weight logistic
    // classifier standing in for CCNet/GPT-3's fastText quality model:
    // score = σ(b + w·x) over interpretable, integer-derived features
    // (stopword ratio, mean token length, duplicate-token ratio), all
    // from the single-pass TextStats kernel + one array_distinct —
    // zero shuffle, one codegen'd projection per row at any corpus
    // size; the learned-weights swap is a constant edit, the pipeline
    // is the real shape. Feature arithmetic is single IEEE ops off
    // integer counts, the sigmoid is one exp + divide mirrored
    // operand-for-operand in DuckDB, and the keep/drop decision
    // thresholds the ROUND-9 score (the q_dedup_embed lesson: a
    // last-ulp exp divergence must not flip a boundary label) —
    // fully oracled.
    "q_quality_logistic" -> ((s, d) =>
      qualityScored(s, d)
        .select(col("doc_id"),
          round(col("stop_ratio"), 6).as("stop_ratio"),
          round(col("avg_len"), 6).as("avg_len"),
          round(col("dup_ratio"), 6).as("dup_ratio"),
          round(col("score"), 6).as("score"),
          when(round(col("score"), 9) >= 0.5, "keep").otherwise("drop")
            .as("label"))
        .orderBy(col("doc_id"))),

    // Language-ID heuristic: function-word density → 'en-like' vs
    // 'unknown'. (The corpus `lang` column is the labeled comparison.)
    "q_lang_guess" -> ((s, d) => {
      graft.functions.TextFunctions.register(s)
      val ratio = col("st.n_stop").cast("double") / col("st.n_tokens")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          expr("text_stats(split(text, ' '))").as("st"))
        .select(col("doc_id"), col("lang"),
          round(ratio, 6).as("stop_ratio"),
          when(ratio >= 0.05, "en-like").otherwise("unknown").as("guess"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprint: md5 over whitespace-normalized lowercase
    // text — the exact-dedup key.
    "q_text_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), "\\s+", " ")).cast("binary"))
            .as("fp"))
        .orderBy(col("doc_id"))),

    // Rolling-hash (Rabin-Karp) fingerprint over normalized text —
    // order-sensitive, one kernel pass. Fully oracled (round 12): the
    // polynomial mod-2^64 fold mirrors exactly in DuckDB as a HUGEINT
    // list_reduce (all-integer, wrap made explicit), so the kernel's
    // signed-long output round-trips hash-for-hash.
    "q_text_rollhash" -> ((s, d) => {
      graft.functions.HashFunctions.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("rolling_fp(lower(text))").as("roll_fp"))
        .orderBy(col("doc_id"))
    }),

    // CROSS-SOURCE content overlap — the corpus-composition question a
    // mixture plan starts from ("how much of crawl source A is already
    // inside source B?"): for each source pair, the distinct 3-grams
    // they share, as per-mille containment in BOTH directions (overlap
    // is asymmetric when sources differ in size). Shape: thin distinct
    // (source, gram) rows; the pair join keys on the gram with ≤
    // |sources|² fan-out per gram (sources are a catalog-bounded set,
    // 20 here — never corpus-scale); per-source gram counts are a
    // bounded broadcast. Fully oracled.
    "q_source_overlap" -> ((s, d) => {
      graft.functions.HashFunctions.register(s)
      val g = Tables.documents(s, d)
        .select(col("source"),
          explode(expr("shingles3(split(text, ' '))")).as("gram"))
        .distinct()
      val sizes = g.groupBy(col("source")).agg(count(lit(1)).as("n"))
      g.as("x").join(g.as("y"),
          col("x.gram") === col("y.gram") &&
            col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("source_a"),
          col("y.source").as("source_b"))
        .agg(count(lit(1)).as("shared_grams"))
        .join(broadcast(sizes.select(col("source").as("source_a"),
          col("n").as("n_a"))), "source_a")
        .join(broadcast(sizes.select(col("source").as("source_b"),
          col("n").as("n_b"))), "source_b")
        .select(col("source_a"), col("source_b"), col("shared_grams"),
          expr("shared_grams * 1000 div n_a").as("a_in_b_pm"),
          expr("shared_grams * 1000 div n_b").as("b_in_a_pm"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // BPE-ish regex tokenizer: letter runs / digit runs / single
    // punctuation, counted per document.
    "q_token_regex" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
            .cast("long").as("n_alpha"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_num"),
          size(regexp_extract_all(col("text"), lit("[^a-z0-9 ]"), lit(0)))
            .cast("long").as("n_other"))
        .orderBy(col("doc_id"))),

    // Feature hashing (the "hashing trick", Weinberger et al. 2009 —
    // the fastText/Vowpal-Wabbit input vectorizer): each document
    // becomes a fixed FeatureDim-bucket bag-of-words count histogram,
    // bucket = md5-derived hash of the token. No vocabulary pass and
    // no dictionary join — the vectorizer is ONE zero-shuffle map
    // over the corpus at any scale (the trade vs q_tfidf's
    // corpus-wide IDF: accepted collisions buy statelessness). The
    // md5 construction is the shared hashBucket parity idiom, so the
    // whole vector compares exactly in DuckDB — fully oracled.
    // (explode → codegen'd md5 per token → map-combined (doc, bucket)
    // counts → vector rebuild from a per-doc map: the exchange
    // carries only thin (doc_id, bucket, count) rows, and each token
    // hashes exactly once in compiled code — a per-row HOF first cut
    // evaluated the digests interpreted and was 5 s at sf0.1)
    "q_feature_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
        .select(col("doc_id"),
          pmod(conv(substring(md5(col("t").cast("binary")), 1, 4), 16, 10)
            .cast("long"), lit(FeatureDim.toLong)).as("b"))
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(map_from_entries(collect_list(struct(col("b"), col("c"))))
          .as("m"))
        .select(col("doc_id"),
          // Published as a ','-joined string, not a raw array: the
          // driver's pandas row-sort crashes on ndarray cells, and
          // integer→string renders identically in Spark and DuckDB.
          array_join(transform(sequence(lit(0), lit(FeatureDim - 1)),
            b => coalesce(element_at(col("m"), b.cast("long")), lit(0L))
              .cast("string")), ",").as("fv"))
        .orderBy(col("doc_id"))),

    // Within-document repetition scoring (Gopher/MassiveText-style
    // quality filter): duplicate-token and duplicate-bigram ratios per
    // document. Pure per-row array work (split/distinct/transform) —
    // zero shuffle; one IEEE division per ratio keeps oracle parity
    // exact. Bigram construction guards len<2 (Spark's sequence(1,0)
    // runs DESCENDING — reference: spark4-env-quirks).
    "q_repetition" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .withColumn("bg", expr(
          """CASE WHEN size(l) >= 2
            |  THEN transform(sequence(1, size(l) - 1),
            |       i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))
            |  ELSE array() END""".stripMargin))
        .select(col("doc_id"),
          size(col("l")).cast("long").as("n_tok"),
          (lit(1.0) - size(array_distinct(col("l"))).cast("double")
            / size(col("l"))).as("dup_tok_ratio"),
          when(size(col("bg")) > 0,
            lit(1.0) - size(array_distinct(col("bg"))).cast("double")
              / size(col("bg"))).otherwise(0.0).as("dup_big_ratio"))
        .withColumn("repetitive", col("dup_big_ratio") > 0.2)
        .orderBy(col("doc_id"))),

    // Context-window chunking: overlapping character windows (256-char
    // window, 192-char stride) — the stage that slices documents into
    // model context windows. sequence+explode fans each row out to
    // ~n_chars/stride rows with ZERO shuffle: embarrassingly parallel,
    // and at 100 TB the chunks stream straight back out to parquet
    // without ever concentrating on any node.
    "q_doc_chunks" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0L),
            greatest(col("n_chars") - 1L, lit(0L)), lit(192L))).as("chunk_start"))
        .select(col("doc_id"), col("chunk_start"),
          col("text").substr(col("chunk_start") + 1L, lit(256L)).as("chunk"))
        .withColumn("chunk_len", length(col("chunk")).cast("long"))
        .orderBy(col("doc_id"), col("chunk_start"))),

    // TF-IDF term ranking with a *linear* IDF (score = tf·N/df): one
    // IEEE division instead of libm ln(), so the doubles are
    // bit-identical across engines while preserving the ranking
    // monotonicity that matters. Corpus stats (df, N) aggregate once
    // over thin (doc_id, term) pairs; the bounded per-doc top-10 is a
    // windowed head, not a global sort.
    "q_tfidf" -> ((s, d) => {
      val toksDf = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      val tf = toksDf.filter(col("doc_id") < 50)
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dft = toksDf.select(col("doc_id"), col("term")).distinct()
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDf = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      tf.join(dft, "term").crossJoin(broadcast(nDf))
        .withColumn("score",
          (col("tf") * col("n_docs")).cast("double") / col("df"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("score"), col("rnk"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // Unigram language-model quality score (CCNet-style filtering
    // shape): score each document by how typical its tokens are under
    // the corpus's own unigram distribution — mean token probability
    // plus the rare-token ratio (cnt ≤ 2 ⇒ likely noise/OCR junk).
    // All-linear math (mean_prob = Σcnt / (n_tok·total) — one IEEE
    // division, no ln()) keeps the doubles bit-identical to the
    // oracle, exactly like q_tfidf's linear IDF. The model build is
    // one token-frequency agg (map-side combined), the scoring join
    // shuffles thin (doc_id, tok) pairs on tok, and the corpus total
    // is a broadcast single-row aggregate.
    "q_lm_unigram_score" -> ((s, d) => {
      val toksDf = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      val freq = toksDf.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val tot = freq.agg(sum(col("cnt")).as("total"))
      toksDf.join(freq, "tok").crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          sum(col("cnt")).as("cnt_sum"),
          sum(when(col("cnt") <= 2, 1L).otherwise(0L)).as("n_rare"),
          first(col("total")).as("total"))
        .select(col("doc_id"), col("n_tok"),
          (col("cnt_sum").cast("double") / (col("n_tok") * col("total")))
            .as("mean_prob"),
          (col("n_rare").cast("double") / col("n_tok")).as("rare_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Bigram coherence score — the context-sensitive sibling of the
    // unigram LM filter (a doc whose TOKENS are all common can still
    // be incoherent; its word PAIRS betray it — shuffled or generated
    // text has rare bigrams). Per document: bigram count, occurrences
    // whose corpus-wide bigram frequency ≥ 3 (corpus-typical pairs),
    // their ratio, and mean bigram frequency — all-integer sums with
    // one IEEE division per ratio, the q_lm_unigram_score parity
    // recipe. Model build is one map-combined bigram-frequency agg;
    // scoring shuffles thin (doc_id, bigram) pairs. Fully oracled.
    "q_lm_bigram_score" -> ((s, d) => {
      val bigrams = Tables.documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("l"))
        .filter(size(col("l")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(l) - 1),
            |  i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"""
            .stripMargin)).as("bg"))
      val freq = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
      bigrams.join(freq, "bg")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("cnt") >= 3, 1L).otherwise(0L)).as("n_common"),
          sum(col("cnt")).as("cnt_sum"))
        .select(col("doc_id"), col("n_bigrams"), col("n_common"),
          (col("n_common").cast("double") / col("n_bigrams"))
            .as("common_ratio"),
          (col("cnt_sum").cast("double") / col("n_bigrams"))
            .as("mean_bigram_freq"))
        .orderBy(col("doc_id"))
    }),

    // CCNet PERPLEXITY BUCKETS (head/middle/tail) — the language-model
    // quality terciles CCNet/LLaMA-style pipelines split each language
    // into before sampling (head = most LM-fluent third). The fluency
    // stand-in is the bigram common-ratio in integer per-mille (the
    // q_lm_bigram_score signal — a KenLM would slot in at the same
    // column). Bucketing is THRESHOLD-based, not ntile: per-language
    // tercile cutoffs derive from the bounded (lang, score_pm) count
    // table (≤ 1001 distinct scores per language — the cumulative
    // window runs over THAT, never over documents, so no per-language
    // document sort exists at any scale; the q_quantile_bucket
    // lesson), cutoffs broadcast back, and tied scores land in the
    // same bucket in both engines by construction. Cutoffs cumulate
    // from the TOP (most fluent first) so tie mass at a boundary
    // lands in the BETTER bucket — the corpus's mode sits at the top
    // score, and bottom-up cumulation would label the entire fluent
    // mode "tail". Fully oracled.
    "q_perplexity_buckets" -> ((s, d) =>
      pplBuckets(s, d).orderBy(col("doc_id"))),

    // CURRICULUM ordering — the training-schedule artifact (Bengio et
    // al. 2009 easy-to-hard): documents ordered into stages by the
    // LM-fluency terciles (head = most fluent trains first, then
    // middle, then tail), with a deterministic within-stage shuffle —
    // the same hash-shard + per-shard dense positions as
    // q_corpus_shuffle (a loader reads stage 1 shards in any order,
    // then stage 2 …; no RNG state, stable under retries, and no
    // global row_number ever serializes the corpus through one task).
    // Composes the oracled bucket table, so the whole schedule is
    // FULLY ORACLED. One thin (doc_id, stage) table + one bounded
    // per-(stage, shard) window.
    "q_curriculum_order" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wPos = Window.partitionBy(col("stage_no"), col("shard"))
        .orderBy(col("skey"), col("doc_id"))
      pplBuckets(s, d)
        .select(col("doc_id"),
          when(col("bucket") === "head", 1L)
            .when(col("bucket") === "middle", 2L)
            .otherwise(3L).as("stage_no"))
        .withColumn("skey",
          md5(concat(col("doc_id").cast("string"), lit(":cur"))
            .cast("binary")))
        .withColumn("shard",
          pmod(conv(substring(col("skey"), 1, 3), 16, 10).cast("long"),
            lit(Corpus.ShuffleShards.toLong)))
        .withColumn("pos", row_number().over(wPos).cast("long"))
        .select(col("doc_id"), col("stage_no"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))
    }),


    // COLLOCATION mining — top bigram phrases by LIFT over
    // independence (observed/expected ratio, the rational PMI twin —
    // the word2phrase / "New York" detector every tokenizer-prep and
    // phrase-vocabulary pass runs): lift = n_ab·N / (n_a·n_b), in
    // integer cpm with the big products in DECIMAL(38,0) so the
    // arithmetic never wraps at corpus scale (N ~ 1e13 tokens at
    // 100 TB; a BIGINT product would overflow). Min support 5 kills
    // the noise tail; top-50 via TakeOrderedAndProject. Shape: two
    // map-combined aggregates (unigram + adjacent-bigram counts); the
    // vocabulary-bounded unigram table is checkpointed once and joins
    // back under the measured-size broadcast gate (the Bpe rule); N
    // folds in as a broadcast 1-row aggregate. Fully oracled.
    "q_collocations" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(toks(col("text")).as("l"))
      val uni = tok.select(explode(col("l")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
        .localCheckpoint()
      val ntot = uni.agg(sum(col("n_w")).as("n_tok"))
      val bg = tok.filter(size(col("l")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(l) - 1),
            |  i -> struct(element_at(l, i) AS w1,
            |              element_at(l, i + 1) AS w2))""".stripMargin))
          .as("p"))
        .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 5)
      val vocabRows = uni.count()
      def dict = if (vocabRows <= 4L * 1000 * 1000) broadcast(uni) else uni
      bg.join(dict.select(col("w").as("w1"), col("n_w").as("n_a")), "w1")
        .join(dict.select(col("w").as("w2"), col("n_w").as("n_b")), "w2")
        .crossJoin(broadcast(ntot))
        .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
          expr("""CAST(n_ab AS DECIMAL(38,0)) * n_tok * 100
                 | div (CAST(n_a AS DECIMAL(38,0)) * n_b)""".stripMargin)
            .as("lift_cpm"))
        .orderBy(col("lift_cpm").desc, col("n_ab").desc,
          col("w1"), col("w2"))
        .limit(50)
    }),

    // N-GRAM NOVELTY — the memorization-risk / informativeness signal
    // (Lee et al. 2022 tie duplicated spans to verbatim memorization;
    // novelty is that measure's per-document complement): the share
    // of a document's 8-token windows that appear in NO other
    // document. Windows travel as 16-byte md5 digests (never the
    // window text — the span-dedup exchange discipline, and the
    // reason the oracle mirrors exactly); per-gram distinct-doc
    // counts are one map-combined aggregate, novelty is a thin
    // semi-aggregate per doc, integer per-mille. Fully oracled.
    "q_ngram_novelty" -> ((s, d) => {
      graft.functions.TextFunctions.register(s)
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("l"))
        .filter(size(col("l")) >= 8)
        // one codegen'd kernel call emits the per-document DISTINCT
        // digest set (functions.GramDigests), so (doc_id, gh) is
        // unique by construction — the round-14 rewrite removed both
        // the interpreted per-window md5 transform and the
        // DataFrame-level distinct's hash exchange (1.93 -> 1.33 s at
        // sf0.1; the digests are byte-identical, oracle unchanged)
        .select(col("doc_id"), explode(expr("gram_digests(l, 8)")).as("gh"))
        // localCheckpoint: the (doc_id, gh) table feeds both the
        // per-gram doc counts and the per-doc join — the barrier
        // materializes the digest table once for both consumers
        .localCheckpoint()
      val docsPerGram = grams.groupBy(col("gh"))
        .agg(count(lit(1)).as("n_docs"))
      grams.join(docsPerGram, "gh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("n_docs") === 1, 1L).otherwise(0L)).as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          expr("n_novel * 1000 div n_grams").as("novelty_pm"))
        .orderBy(col("doc_id"))
    }),

    // PII scrubbing: redact email-like tokens and long digit runs with
    // sentinels, counting redactions per document. The corpus has no
    // digits, so deterministic synthetic PII (an email + a numeric ref
    // derived from doc_id) is injected first on BOTH sides — the scrub
    // itself is then real regex work with exact oracle parity. Pure
    // per-row map: zero shuffle at any scale.
    "q_pii_scrub" -> ((s, d) => {
      val emailPat = "[a-z0-9._-]+@[a-z0-9.-]+"
      val idPat = "[0-9]{4,}"
      Tables.documents(s, d)
        .withColumn("raw",
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"), lit("@example.com ref "),
            ((col("doc_id") + 1000L) * 7919L).cast("string")))
        .select(col("doc_id"),
          size(regexp_extract_all(col("raw"), lit(emailPat), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("raw"), lit(idPat), lit(0)))
            .cast("long").as("n_ids"),
          regexp_replace(
            regexp_replace(col("raw"), lit(emailPat), lit("<EMAIL>")),
            lit(idPat), lit("<NUM>")).as("scrubbed"))
        .orderBy(col("doc_id"))
    }),

    // Domain-level quality aggregation (the FineWeb/RefinedWeb web-
    // pipeline stage: quality is judged per DOMAIN, not only per
    // document, because spammy hosts produce individually-plausible
    // pages). `source` plays the domain role. One pass: text_stats per
    // row feeds a map-combined per-source aggregate, so document text
    // never enters the exchange — only ~|domains| thin partial rows
    // shuffle. All-integer per-mille arithmetic (BIGINT div) keeps
    // DuckDB parity exact and never drifts with summation order the
    // way a double average would. Sums fit int64 to ~9e15 tokens per
    // domain (1000× headroom over a 100 TB corpus's largest domain).
    "q_domain_stats" -> ((s, d) => {
      graft.functions.TextFunctions.register(s)
      Tables.documents(s, d)
        .select(col("source"), col("n_chars"),
          expr("text_stats(split(text, ' '))").as("st"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("st.n_tokens")).as("n_tokens"),
          sum(col("st.n_stop")).as("n_stop"),
          sum(col("n_chars")).as("sum_chars"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_stop"),
          expr("n_stop * 1000 div n_tokens").as("stop_pm"),
          expr("sum_chars div n_docs").as("avg_chars"))
        .orderBy(col("source"))
    }),

    // DoReMi-STYLE mixture reweighting (Xie et al. 2023, the
    // domain-weight iteration of the sampling family): multiplicative-
    // weights updates over the ≤ |domains| table, starting uniform,
    // each step boosting domains whose quality score EXCEEDS the
    // current mixture-weighted reference and shrinking the rest —
    // w ∝ w · (1e6 + η·(score − ref(w))) with renormalization to ppm.
    // The reference moves WITH the weights (DoReMi's proxy-loss
    // feedback, stood in by the engine's own per-domain stop-density
    // score since no proxy model trains here), so the iterate is a
    // genuine fixed point toward score-equalized excess, not a closed
    // form. ALL arithmetic is integer (ppm weights, per-mille scores,
    // DECIMAL(38,0) products) — no exp/libm, the engine's no-libm
    // rule — so every iterate is bit-identical cross-engine and the
    // operator is FULLY ORACLED (the DuckDB side unrolls the same 8
    // steps as chained CTEs). Cost class: the BPE merge loop — a
    // bounded driver loop where each step is one 1-row aggregate +
    // one projection over the bounded domain table; the corpus is
    // touched exactly once (the per-domain score aggregate).
    "q_doremi_weights" -> ((s, d) =>
      doremiWeights(s, d).orderBy(col("source"))),

    // MIXTURE PLAN — the practical step after the weights: given the
    // training token budget, the per-domain token allocation
    // (budget · w_ppm / 1e6) and the implied epoch count over the
    // domain's available tokens in centi-epochs — the "how many
    // repeats of each domain does this mixture actually mean" table a
    // run config is generated from (epochs > 1 flags upsampling, the
    // memorization-risk knob). Pure integer arithmetic over the
    // bounded weight table (DECIMAL(38,0) products so a 1e13-token
    // budget never wraps); fully oracled by composing the doremi SQL.
    "q_mixture_plan" -> ((s, d) =>
      doremiWeights(s, d)
        .select(col("source"), col("n_tokens"), col("w_ppm"))
        .withColumn("alloc_tokens", expr(
          s"""CAST(CAST(${Corpus.BudgetTokens} AS DECIMAL(38,0)) * w_ppm
             div 1000000 AS BIGINT)"""))
        .withColumn("epochs_cpm", expr(
          """CAST(CAST(alloc_tokens AS DECIMAL(38,0)) * 100
             div n_tokens AS BIGINT)"""))
        .withColumn("upsampled", col("epochs_cpm") > 100L)
        .orderBy(col("source"))),

    // INCREMENTAL index maintenance — q_sim_ivf_append's retrieval
    // twin: an arriving document batch (the %17 delta fixture) is
    // tokenized ONCE and its posting rows are exactly what the
    // written inverted index gains on ingest — history is never
    // re-tokenized. The `agrees` audit column certifies the
    // incremental path against the batch-built index at every
    // (term, doc_id): a row absent from the index coalesces to an
    // explicit false (the q_sim_knn_append lesson), and since the
    // layout content is deterministic the audit is provably all-true
    // — which is what lets the query stay FULLY ORACLED (the oracle
    // publishes literal true). Both joins broadcast (semi-prefilter,
    // then the thin filtered postings as the outer build side); the
    // postings index itself never shuffles.
    "q_index_append" -> ((s, d) => {
      val delta = Tables.documents(s, d)
        .filter(col("doc_id") % 17 === 3)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      val idx = textIndex(s, d)
        .select(col("term"), col("doc_id"), col("tf").as("g_tf"))
      // Spark can only build the RIGHT side of a LeftOuter broadcast
      // join, so a hint on the preserved delta side would silently
      // degrade to a shuffle over the full postings index. Instead the
      // index is prefiltered to the delta's (term, doc_id) keys with a
      // broadcast LEFT SEMI (one streaming pass over the postings, no
      // index shuffle), and the resulting ≤|delta| thin rows broadcast
      // as the outer join's build side — only thin rows ever move.
      val idxThin = idx.join(
        broadcast(delta.select(col("term"), col("doc_id"))),
        Seq("term", "doc_id"), "leftsemi")
      delta.join(broadcast(idxThin), Seq("term", "doc_id"), "left")
        .select(col("term"), col("doc_id"), col("tf"),
          coalesce(col("tf") === col("g_tf"), lit(false)).as("agrees"))
        .orderBy(col("term"), col("doc_id"))
    }),

    // Domain-level filtering: keep every document whose domain's
    // stop-density (per-mille, integer) is at or above the corpus-wide
    // density — the "drop below-average domains" cut of the web
    // pipelines, with a data-derived threshold instead of a magic
    // constant (the weighted mean guarantees at least one domain
    // always survives). Same one-pass per-source aggregate as
    // q_domain_stats; the corpus-wide row is a broadcast 1-row
    // aggregate and the kept-domain list broadcasts back onto the
    // fact scan, so the documents table itself NEVER shuffles — at
    // 100 TB this is a metadata-sized exchange plus a streaming pass.
    "q_domain_filter" -> ((s, d) => {
      graft.functions.TextFunctions.register(s)
      val perSrc = Tables.documents(s, d)
        .select(col("source"), expr("text_stats(split(text, ' '))").as("st"))
        .groupBy(col("source"))
        .agg(sum(col("st.n_stop")).as("s_stop"),
          sum(col("st.n_tokens")).as("s_tok"))
      val global = perSrc
        .agg(expr("sum(s_stop) * 1000 div sum(s_tok)").as("corpus_pm"))
      val kept = perSrc.crossJoin(broadcast(global))
        .select(col("source"), expr("s_stop * 1000 div s_tok").as("src_pm"),
          col("corpus_pm"))
        .filter(col("src_pm") >= col("corpus_pm"))
      Tables.documents(s, d)
        .join(broadcast(kept), "source")
        .select(col("doc_id"), col("source"), col("src_pm"), col("corpus_pm"))
        .orderBy(col("doc_id"))
    }),

    // CCNet-style text NORMALIZATION — the canonicalization that runs
    // BEFORE line dedup and LM scoring (Wenzek et al. 2020): lowercase,
    // digits → 0, strip non-alphanumeric runs, collapse whitespace.
    // Runs over the PII-injected raw fixture (the corpus itself has no
    // digits or punctuation, so q_pii_scrub's synthetic raw column
    // makes every rule do real work on both sides). Pure per-row regex
    // map — zero shuffle at any scale; published as fingerprints so
    // only 16-byte hashes leave the row.
    "q_text_normalize" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("raw",
          concat(col("text"), lit(" Contact User"),
            col("doc_id").cast("string"), lit("@example.com REF "),
            ((col("doc_id") + 1000L) * 7919L).cast("string")))
        .select(col("doc_id"),
          size(regexp_extract_all(col("raw"), lit("[0-9]"), lit(0)))
            .cast("long").as("n_digits"),
          trim(regexp_replace(regexp_replace(regexp_replace(
            lower(col("raw")), "[0-9]", "0"), "[^a-z0 ]+", " "), " +", " "))
            .as("norm"))
        .select(col("doc_id"), col("n_digits"),
          length(col("norm")).cast("long").as("n_chars_norm"),
          md5(col("norm").cast("binary")).as("norm_fp"))
        .orderBy(col("doc_id"))),

    // Positional PHRASE search — the exact-match retrieval primitive a
    // positional inverted index serves: every (document, position) at
    // which a bounded query phrase occurs verbatim. The position scan
    // is a per-row filtered sequence over the token array — ZERO
    // shuffle, occurrences stream straight out (at 100 TB the phrase
    // postings land as rows, the building block for snippet windows
    // and co-occurrence stats). Fully oracled via the same 1-based
    // window test in DuckDB.
    "q_phrase_search" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("tk"))
        .filter(size(col("tk")) >= 3)
        .select(col("doc_id"), explode(expr(
          s"""filter(sequence(1, size(tk) - 2),
             |  i -> element_at(tk, i) = '${PhraseTerms(0)}'
             |   AND element_at(tk, i + 1) = '${PhraseTerms(1)}'
             |   AND element_at(tk, i + 2) = '${PhraseTerms(2)}')"""
            .stripMargin)).as("pos0"))
        .select(col("doc_id"), col("pos0").cast("long").as("pos"))
        .orderBy(col("doc_id"), col("pos"))),

    // Okapi BM25 lexical retrieval for a bounded query (Robertson et
    // al., TREC-3): idf × tf-saturation × doc-length normalization,
    // the scoring the hybrid-RRF lexical leg approximates with raw
    // shingle overlap. The query term set is BOUNDED (a search query),
    // so each term's tf is a per-row array count in ONE codegen'd
    // projection — ZERO shuffle on the corpus; the only exchange is
    // the 1-row corpus-stats aggregate (N, Σdl, per-term df)
    // broadcast back, and top-20 is TakeOrderedAndProject. The
    // many-query form is q_tfidf's exploded thin-pair shape. The idf
    // is the LINEAR (N−df+½)/(df+½) form — one IEEE division instead
    // of libm ln() (which is not cross-engine bit-stable), the same
    // dodge as q_tfidf's linear IDF; k1=1.2, b=0.75 fold into
    // literal-identical double expressions in both engines, so the
    // scores hash-match exactly.
    "q_bm25" -> ((s, d) => {
      val terms = Bm25Terms
      val tfCols = terms.map(t =>
        size(filter(col("tk"), x => x === t)).cast("long").as(s"tf_$t"))
      val base = Tables.documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("tk"))
        .select(col("doc_id") +: size(col("tk")).cast("long").as("dl") +: tfCols: _*)
      base.crossJoin(broadcast(
          base.agg(count(lit(1)).as("n_docs"),
            (sum(col("dl")).as("sum_dl") +:
              terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
                .as(s"df_$t"))): _*)))
        .filter(terms.map(t => col(s"tf_$t")).reduceLeft(_ + _) > 0)
        .select(col("doc_id") +: col("dl") +:
          terms.map(t => col(s"tf_$t")) :+
            round(bm25ScoreCol(terms), 6).as("bm25"): _*)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    }),

    // INDEX-SERVED retrieval — q_bm25 answered from the WRITTEN
    // inverted index instead of a corpus rescan: at 100 TB a search
    // engine never re-tokenizes text per query; it reads the posting
    // lists of the query terms from the term-sorted postings layout
    // (predicate pushdown + parquet row-group term min/max prune the
    // scan to the queried terms' groups) and the per-doc lengths from
    // the thin doc-stats layout. df/tf come from the pruned postings,
    // n_docs/avgdl from the stats layout's 1-row aggregate, and the
    // scoring expression is the SAME Column tree q_bm25 builds, so
    // the scores are double-identical and the oracle is LITERALLY
    // q_bm25's (both registered to one SQL string). The corpus text
    // is never touched. Fully oracled + IndexSearchSpec pins
    // row-for-row equality with q_bm25 and the index-only scan.
    "q_index_search" -> ((s, d) => {
      val terms = Bm25Terms
      // no checkpoint: the tf pivot and the df aggregate each take
      // their own PRUNED posting read (KB-scale after the term
      // filter) — keeping the scans in the plan is what lets the
      // spec pin the pushdown, and re-reading a pruned posting list
      // twice is exactly what a search engine does
      val post = textIndex(s, d).filter(col("term").isin(terms: _*))
      val aggs = terms.map(t =>
        coalesce(max(when(col("term") === t, col("tf"))), lit(0L))
          .as(s"tf_$t"))
      val tfp = post.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      val dls = docStats(s, d)
      val dfAgg = post.agg(
        terms.map(t => countDistinct(when(col("term") === t, col("doc_id")))
          .as(s"df_$t")).head,
        terms.map(t => countDistinct(when(col("term") === t, col("doc_id")))
          .as(s"df_$t")).tail: _*)
      val stats = dls.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl"))
      tfp.join(dls, "doc_id")
        .crossJoin(broadcast(stats.crossJoin(dfAgg)))
        .select(col("doc_id") +: col("dl") +:
          terms.map(t => col(s"tf_$t")) :+
            round(bm25ScoreCol(terms), 6).as("bm25"): _*)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    }),

    // Per-document token diversity — the repetition/quality features a
    // Shannon-entropy filter wants, in RATIONAL form so the doubles
    // never touch libm: Simpson concentration Σ(c/n)² surfaces as the
    // integer-ppm Simpson DIVERSITY index (1−Σp², the Rényi order-2
    // entropy's monotone twin — ranking by it IS ranking by H₂ =
    // −ln Σp², without the ln), plus type-token ratio and top-token
    // concentration. One thin (doc_id, token) count shuffle with
    // map-side combine; all-integer per-mille/ppm output is
    // summation-order independent, so AQE re-plans can't move a bit.
    // Σc²·10⁶ ≤ n²·10⁶ stays inside int64 to n ≈ 3M tokens per doc —
    // far past any training-document cap.
    "q_doc_diversity" -> ((s, d) => {
      val counts = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
      counts.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tok"),
          count(lit(1)).as("n_types"),
          sum(col("c") * col("c")).as("sum_c2"),
          max(col("c")).as("max_c"))
        .select(col("doc_id"), col("n_tok"), col("n_types"),
          expr("1000000 - (sum_c2 * 1000000 div (n_tok * n_tok))")
            .as("simpson_ppm"),
          expr("n_types * 1000 div n_tok").as("ttr_pm"),
          expr("max_c * 1000 div n_tok").as("top_pm"))
        .orderBy(col("doc_id"))
    }),

    // MIN-K% PROB membership inference — the pretraining-data
    // detection signal (Shi et al. 2023, "Detecting Pretraining Data
    // from Large Language Models"): a document the model trained on
    // has suspiciously HIGH probability on even its least-likely
    // tokens, so the score is the mean probability of the bottom K%
    // of its tokens. Under the corpus unigram LM the logprob ORDER is
    // the frequency-count order, so the bottom-K% selection is exact
    // integer ranking (cnt, tok, pos — total) and the score is the
    // exact bottom-K count mass; the published ppb ratio and the
    // suspect flag are both integer arithmetic (flag = the doc's
    // mass/k against the corpus-mean mass/k, CROSS-MULTIPLIED in
    // DECIMAL(38,0) — self-calibrated, so it survives any corpus
    // scale where a fixed threshold drifts; measured live both ways
    // at every SF: 359/500 · 374/500 · 4737/5000 suspect). Scale
    // shape = the q_lm_unigram_score recipe: one token-key join
    // against the map-combined frequency model, then ONE doc-key
    // exchange shared by the ranking window and the aggregate; text
    // never enters either (thin (doc_id, pos, tok) rows). Fully
    // oracled — no float anywhere.
    "q_mink_prob" -> ((s, d) => {
      val per = minkPerDoc(s, d)
      val g = per.agg(sum(col("mink_mass")).as("gmass"),
        sum(col("k_cnt")).as("gk"), sum(col("n_tok")).as("gtotal"))
      per.crossJoin(broadcast(g))
        .select(col("doc_id"), col("n_tok"), col("k_cnt"), col("mink_mass"),
          expr("""CAST(CAST(mink_mass AS DECIMAL(38,0)) * 1000000000
                 div (CAST(k_cnt AS DECIMAL(38,0)) * gtotal)
                 AS BIGINT)""").as("mink_ppb"),
          expr("""CAST(mink_mass AS DECIMAL(38,0)) * gk >=
                 CAST(gmass AS DECIMAL(38,0)) * k_cnt""").as("suspect"))
        .orderBy(col("doc_id"))
    }),

    // DATASET INFERENCE — the collection-level aggregation of min-k%
    // (Maini et al. 2024, "LLM Dataset Inference": one document's
    // membership signal is noisy, a SOURCE's aggregate is decisive):
    // per source, the pooled bottom-K mass over pooled k, the count
    // and share of member-suspect documents, and the source-level
    // flag — the same cross-multiplied self-calibrated comparison at
    // source granularity (measured live both ways: 12/20 · 8/20 ·
    // 11/20 sources flagged). Adds one thin source-key exchange above
    // the per-doc table; the global calibration row broadcasts. Fully
    // oracled, all-integer.
    "q_dataset_infer" -> ((s, d) => {
      val per = minkPerDoc(s, d)
        .join(Tables.documents(s, d).select(col("doc_id"), col("source")),
          "doc_id")
      val g = per.agg(sum(col("mink_mass")).as("gmass"),
        sum(col("k_cnt")).as("gk"), sum(col("n_tok")).as("gtotal"))
      per.crossJoin(broadcast(g))
        .withColumn("doc_suspect",
          expr("""CAST(mink_mass AS DECIMAL(38,0)) * gk >=
                 CAST(gmass AS DECIMAL(38,0)) * k_cnt"""))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("k_cnt")).as("src_k"),
          sum(col("mink_mass")).as("src_mass"),
          sum(when(col("doc_suspect"), 1L).otherwise(0L)).as("n_suspect"),
          max(col("gmass")).as("gmass"), max(col("gk")).as("gk"),
          max(col("gtotal")).as("gtotal"))
        .select(col("source"), col("n_docs"), col("src_k"), col("src_mass"),
          expr("""CAST(CAST(src_mass AS DECIMAL(38,0)) * 1000000000
                 div (CAST(src_k AS DECIMAL(38,0)) * gtotal)
                 AS BIGINT)""").as("src_ppb"),
          col("n_suspect"),
          expr("n_suspect * 1000 div n_docs").as("suspect_share_pm"),
          expr("""CAST(src_mass AS DECIMAL(38,0)) * gk >=
                 CAST(gmass AS DECIMAL(38,0)) * src_k""").as("flagged"))
        .orderBy(col("source"))
    })
  )

  private val stopSql = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** DuckDB mirror of [[qualityScored]] — the single SQL home of the
    * model's weights and feature formulas (operand-for-operand the
    * Spark expressions above). Yields
    * (doc_id, lang, source, stop_ratio, avg_len, dup_ratio, score).
    */
  private[graft] lazy val qualityScoredSql: String =
    s"""SELECT doc_id, lang, source, stop_ratio, avg_len, dup_ratio,
       |  1.0 / (1.0 + exp(-(1.3 + 3.0 * stop_ratio
       |    + 0.15 * avg_len - 4.0 * dup_ratio))) AS score
       |FROM (SELECT doc_id, lang, source,
       |        CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
       |        CAST(char_sum AS DOUBLE) / n_tokens AS avg_len,
       |        1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_ratio
       |      FROM (SELECT doc_id, lang, source,
       |              CAST(len(string_split(text, ' ')) AS BIGINT)
       |                AS n_tokens,
       |              CAST(len(list_filter(string_split(text, ' '),
       |                x -> list_contains($stopSql, x))) AS BIGINT)
       |                AS n_stop,
       |              CAST(list_sum(list_transform(string_split(text, ' '),
       |                x -> len(x))) AS BIGINT) AS char_sum,
       |              CAST(len(list_distinct(string_split(text, ' ')))
       |                AS BIGINT) AS n_distinct
       |            FROM documents) f) feats""".stripMargin

  private val bm25TermSql = Bm25Terms.map { t =>
    // Per-term factors mirror the Spark column expressions token for
    // token: linear idf × saturated tf × length norm, left-assoc. The
    // ::DOUBLE casts matter: DuckDB keeps integer±decimal-literal
    // subexpressions in exact DECIMAL (Spark computes IEEE doubles),
    // and e.g. exact 3·2.2 = 6.6 converts to a DIFFERENT double than
    // IEEE 3·double(2.2) — forcing the literals to DOUBLE makes every
    // operation the same IEEE op in the same order in both engines.
    s"""(n_docs - df_$t + 0.5::DOUBLE) / (df_$t + 0.5::DOUBLE)
       |    * (tf_$t * 2.2::DOUBLE)
       |    / (tf_$t + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl))"""
      .stripMargin
  }.mkString("\n  + ")

  /** The DoReMi oracle SQL (no ORDER BY) — the same DoremiIters
    * multiplicative-weights steps, unrolled as chained MATERIALIZED
    * CTEs (recursive CTEs cannot aggregate the recursive term, and
    * INLINED chained CTEs double the scan tree per level — measured:
    * file-handle exhaustion at 8 levels); integer floors match
    * Spark's div exactly. Shared by the q_doremi_weights and
    * q_mixture_plan oracles.
    */
  private[graft] val doremiSql: String = {
    val steps = (1 to DoremiIters).map { t =>
      s"""r$t AS MATERIALIZED (
         |  SELECT CAST(sum(w * score_pm) // sum(w) AS BIGINT)
         |  AS ref FROM w${t - 1}),
         |u$t AS MATERIALIZED (SELECT source, n_tokens, score_pm,
         |  CAST(w AS HUGEINT) * (1000000 + $DoremiEtaPm
         |    * (score_pm - (SELECT ref FROM r$t))) AS u
         |  FROM w${t - 1}),
         |w$t AS MATERIALIZED (SELECT source, n_tokens, score_pm,
         |  CAST(u * 1000000 // (SELECT sum(u) FROM u$t) AS BIGINT)
         |    AS w FROM u$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH dom AS MATERIALIZED (
       |  SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       |    CAST(sum(len(list_filter(string_split(text, ' '),
       |      x -> list_contains($stopSql, x)))) AS BIGINT) AS n_stop
       |  FROM documents GROUP BY source),
       |w0 AS MATERIALIZED (
       |  SELECT source, n_tokens,
       |    CAST(n_stop * 1000 // n_tokens AS BIGINT) AS score_pm,
       |    CAST(1000000 // (SELECT count(*) FROM dom) AS BIGINT) AS w
       |  FROM dom),
       |$steps
       |SELECT source, n_tokens,
       |  CAST(CAST(n_tokens AS HUGEINT) * 1000000
       |    // (SELECT sum(n_tokens) FROM dom) AS BIGINT) AS share_ppm,
       |  score_pm, w AS w_ppm
       |FROM w$DoremiIters""".stripMargin
  }

  /** The fluency-tercile oracle SQL (no ORDER BY) — shared by the
    * q_perplexity_buckets and q_curriculum_order oracles.
    */
  private[graft] val pplBucketsSql: String =
    """WITH bg AS (
        |  SELECT doc_id, lang, unnest(list_transform(
        |    generate_series(1, len(l) - 1),
        |    i -> l[i] || ' ' || l[i + 1])) AS bg
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS l
        |        FROM documents) t
        |  WHERE len(l) >= 2),
        |freq AS (SELECT bg, count(*) AS cnt FROM bg GROUP BY bg),
        |score AS (
        |  SELECT doc_id, lang,
        |    CAST(sum(CASE WHEN cnt >= 3 THEN 1 ELSE 0 END) * 1000
        |      // count(*) AS BIGINT) AS score_pm
        |  FROM bg JOIN freq USING (bg) GROUP BY doc_id, lang),
        |hist AS (
        |  SELECT lang, score_pm, count(*) AS n FROM score GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, score_pm,
        |    sum(n) OVER (PARTITION BY lang ORDER BY score_pm DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n) OVER (PARTITION BY lang) AS tot
        |  FROM hist),
        |cuts AS (
        |  SELECT lang,
        |    max(CASE WHEN cum * 3 >= tot THEN score_pm END) AS h1,
        |    max(CASE WHEN cum * 3 >= tot * 2 THEN score_pm END) AS h2
        |  FROM cum GROUP BY lang)
        |SELECT s.doc_id, s.lang, s.score_pm,
        |  CASE WHEN s.score_pm >= c.h1 THEN 'head'
        |       WHEN s.score_pm >= c.h2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM score s JOIN cuts c USING (lang)""".stripMargin

  /** BM25 oracle SQL — shared verbatim by q_bm25 and the
    * index-served q_index_search (same result by construction).
    */
  private[graft] val bm25Sql: String =
    s"""WITH base AS (
         |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
         |${Bm25Terms.map(t =>
             s"    CAST(len(list_filter(tk, x -> x = '$t')) AS BIGINT) AS tf_$t")
             .mkString(",\n")}
         |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) t
         |), st AS (
         |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
         |${Bm25Terms.map(t =>
             s"    CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
             .mkString(",\n")},
         |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
         |  FROM base
         |)
         |SELECT doc_id, dl, ${Bm25Terms.map(t => s"tf_$t").mkString(", ")},
         |  round($bm25TermSql, 6) AS bm25
         |FROM base, st
         |WHERE ${Bm25Terms.map(t => s"tf_$t").mkString(" + ")} > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  val oracle: Map[String, String] = Map(
    // exact top-20: equal to the sketch's answer while the sketch is
    // in its exact regime (spec-pinned at test scale); the re-ranked
    // (freq DESC, token) publish order is shared by construction
    "q_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
        |      FROM t GROUP BY token),
        |top AS (SELECT token, freq FROM c
        |        ORDER BY freq DESC, token LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY freq DESC, token)
        |    AS BIGINT) AS rk,
        |  token, freq
        |FROM top ORDER BY rk""".stripMargin,
    // the kernel's h = h*B + byte fold mod 2^64, replayed over HUGEINT
    // with an explicit wrap to the signed BIGINT the kernel returns;
    // codepoints == UTF-8 bytes because the mirror runs on the same
    // ASCII text the kernel consumed (lower() agrees byte-for-byte)
    "q_text_rollhash" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN h >= 9223372036854775808
        |       THEN h - 18446744073709551616 ELSE h END AS BIGINT)
        |    AS roll_fp
        |FROM (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(0::HUGEINT,
        |        list_transform(range(1, strlen(lt) + 1),
        |          i -> ord(substr(lt, i, 1))::HUGEINT)),
        |      (acc, b) -> (acc * 1000000007 + b) % 18446744073709551616)
        |      AS h
        |  FROM (SELECT doc_id, lower(text) AS lt FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "q_source_overlap" ->
      s"""WITH sets AS (
         |  SELECT source, CASE WHEN len(l) >= 3
         |      THEN list_distinct(list_transform(
         |        generate_series(1, len(l) - 2),
         |        i -> array_to_string(l[i:i+2], ' ')))
         |      ELSE [array_to_string(l, ' ')] END AS sh
         |  FROM (SELECT source, string_split(text, ' ') AS l
         |        FROM documents) toks),
         |g AS (SELECT DISTINCT source, unnest(sh) AS gram FROM sets),
         |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
         |          FROM g GROUP BY source),
         |shared AS (
         |  SELECT x.source AS source_a, y.source AS source_b,
         |    CAST(count(*) AS BIGINT) AS shared_grams
         |  FROM g x JOIN g y ON x.gram = y.gram AND x.source < y.source
         |  GROUP BY 1, 2)
         |SELECT s.source_a, s.source_b, s.shared_grams,
         |  CAST(s.shared_grams * 1000 // a.n AS BIGINT) AS a_in_b_pm,
         |  CAST(s.shared_grams * 1000 // b.n AS BIGINT) AS b_in_a_pm
         |FROM shared s
         |JOIN sizes a ON s.source_a = a.source
         |JOIN sizes b ON s.source_b = b.source
         |ORDER BY s.source_a, s.source_b""".stripMargin,
    "q_text_normalize" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw, '[0-9]')) AS BIGINT) AS n_digits,
        |  CAST(length(norm) AS BIGINT) AS n_chars_norm,
        |  md5(norm) AS norm_fp
        |FROM (SELECT doc_id, raw,
        |    trim(regexp_replace(regexp_replace(regexp_replace(
        |      lower(raw), '[0-9]', '0', 'g'), '[^a-z0 ]+', ' ', 'g'),
        |      ' +', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id,
        |      text || ' Contact User' || doc_id || '@example.com REF '
        |           || ((doc_id + 1000) * 7919) AS raw
        |    FROM documents) t) n
        |ORDER BY doc_id""".stripMargin,
    "q_phrase_search" ->
      s"""SELECT doc_id, CAST(i AS BIGINT) AS pos
         |FROM (SELECT doc_id, tk,
         |    unnest(generate_series(1, len(tk) - 2)) AS i
         |  FROM (SELECT doc_id, string_split(text, ' ') AS tk
         |    FROM documents) t
         |  WHERE len(tk) >= 3) u
         |WHERE tk[i] = '${PhraseTerms(0)}'
         |  AND tk[i + 1] = '${PhraseTerms(1)}'
         |  AND tk[i + 2] = '${PhraseTerms(2)}'
         |ORDER BY doc_id, pos""".stripMargin,
    "q_bm25" -> bm25Sql,
    "q_index_search" -> bm25Sql,
    "q_index_append" ->
      """SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
        |  true AS agrees
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |      FROM documents WHERE doc_id % 17 = 3) t
        |GROUP BY term, doc_id ORDER BY term, doc_id""".stripMargin,
    "q_doc_diversity" ->
      """SELECT doc_id, n_tok, n_types,
        |  CAST(1000000 - (sum_c2 * 1000000 // (n_tok * n_tok)) AS BIGINT)
        |    AS simpson_ppm,
        |  CAST(n_types * 1000 // n_tok AS BIGINT) AS ttr_pm,
        |  CAST(max_c * 1000 // n_tok AS BIGINT) AS top_pm
        |FROM (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
        |    count(*) AS n_types, CAST(sum(c * c) AS BIGINT) AS sum_c2,
        |    CAST(max(c) AS BIGINT) AS max_c
        |  FROM (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents) x GROUP BY doc_id, tok) cnt
        |  GROUP BY doc_id) agg
        |ORDER BY doc_id""".stripMargin,
    "q_feature_hash" ->
      s"""SELECT doc_id,
         |  array_to_string(list_transform(generate_series(0, ${FeatureDim - 1}),
         |    b -> CAST(len(list_filter(bks, x -> x = b)) AS BIGINT)), ',') AS fv
         |FROM (SELECT doc_id, list_transform(string_split(text, ' '),
         |    t -> ('0x' || substr(md5(t), 1, 4))::BIGINT % $FeatureDim) AS bks
         |  FROM documents) hashed
         |ORDER BY doc_id""".stripMargin,
    "q_quality_logistic" ->
      s"""SELECT doc_id, round(stop_ratio, 6) AS stop_ratio,
         |  round(avg_len, 6) AS avg_len, round(dup_ratio, 6) AS dup_ratio,
         |  round(score, 6) AS score,
         |  CASE WHEN round(score, 9) >= 0.5 THEN 'keep' ELSE 'drop' END AS label
         |FROM ($qualityScoredSql) scored
         |ORDER BY doc_id""".stripMargin,
    "q_doremi_weights" -> s"$doremiSql\nORDER BY source",
    "q_mixture_plan" ->
      s"""SELECT source, n_tokens, w_ppm,
         |  CAST(CAST(${Corpus.BudgetTokens} AS HUGEINT) * w_ppm
         |    // 1000000 AS BIGINT) AS alloc_tokens,
         |  CAST(CAST(CAST(${Corpus.BudgetTokens} AS HUGEINT) * w_ppm
         |    // 1000000 AS HUGEINT) * 100 // n_tokens AS BIGINT)
         |    AS epochs_cpm,
         |  CAST(CAST(CAST(${Corpus.BudgetTokens} AS HUGEINT) * w_ppm
         |    // 1000000 AS HUGEINT) * 100 // n_tokens AS BIGINT) > 100
         |    AS upsampled
         |FROM ($doremiSql) t ORDER BY source""".stripMargin,

    "q_domain_stats" ->
      s"""SELECT source, n_docs, n_tokens, n_stop,
         |  CAST(n_stop * 1000 // n_tokens AS BIGINT) AS stop_pm,
         |  CAST(sum_chars // n_docs AS BIGINT) AS avg_chars
         |FROM (SELECT source, count(*) AS n_docs,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |    CAST(sum(len(list_filter(string_split(text, ' '),
         |      x -> list_contains($stopSql, x)))) AS BIGINT) AS n_stop,
         |    CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |  FROM documents GROUP BY source) t
         |ORDER BY source""".stripMargin,
    "q_domain_filter" ->
      s"""WITH st AS (
         |  SELECT source,
         |    CAST(sum(len(list_filter(string_split(text, ' '),
         |      x -> list_contains($stopSql, x)))) AS BIGINT) AS s_stop,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS s_tok
         |  FROM documents GROUP BY source),
         |g AS (SELECT CAST(sum(s_stop) * 1000 // sum(s_tok) AS BIGINT)
         |        AS corpus_pm FROM st),
         |kept AS (
         |  SELECT source, CAST(s_stop * 1000 // s_tok AS BIGINT) AS src_pm,
         |    corpus_pm
         |  FROM st, g WHERE s_stop * 1000 // s_tok >= corpus_pm)
         |SELECT d.doc_id, d.source, k.src_pm, k.corpus_pm
         |FROM documents d JOIN kept k USING (source)
         |ORDER BY d.doc_id""".stripMargin,
    "q_lm_bigram_score" ->
      """WITH bg AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(l) - 1),
        |    i -> l[i] || ' ' || l[i + 1])) AS bg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l
        |        FROM documents) t
        |  WHERE len(l) >= 2),
        |freq AS (SELECT bg, count(*) AS cnt FROM bg GROUP BY bg)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(CASE WHEN cnt >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_common,
        |  CAST(sum(CASE WHEN cnt >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS common_ratio,
        |  CAST(sum(cnt) AS DOUBLE) / count(*) AS mean_bigram_freq
        |FROM bg JOIN freq USING (bg)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_collocations" ->
      """WITH tok AS (
        |  SELECT string_split(text, ' ') AS l FROM documents),
        |uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM (
        |    SELECT unnest(l) AS w FROM tok) t GROUP BY w),
        |ntot AS (SELECT CAST(sum(n_w) AS BIGINT) AS n_tok FROM uni),
        |bg AS (
        |  SELECT l[i] AS w1, l[i + 1] AS w2,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM tok, unnest(generate_series(1, len(l) - 1)) AS g(i)
        |  WHERE len(l) >= 2
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT b.w1, b.w2, b.n_ab, ua.n_w AS n_a, ub.n_w AS n_b,
        |  CAST(CAST(b.n_ab AS HUGEINT) * n.n_tok * 100
        |    // (CAST(ua.n_w AS HUGEINT) * ub.n_w) AS BIGINT) AS lift_cpm
        |FROM bg b
        |JOIN uni ua ON b.w1 = ua.w
        |JOIN uni ub ON b.w2 = ub.w
        |CROSS JOIN ntot n
        |ORDER BY lift_cpm DESC, n_ab DESC, w1, w2 LIMIT 50""".stripMargin,
    "q_perplexity_buckets" -> s"$pplBucketsSql\nORDER BY doc_id",
    "q_curriculum_order" ->
      s"""WITH bk AS ($pplBucketsSql),
         |cur AS (
         |  SELECT doc_id,
         |    CAST(CASE bucket WHEN 'head' THEN 1 WHEN 'middle' THEN 2
         |      ELSE 3 END AS BIGINT) AS stage_no,
         |    md5(CAST(doc_id AS VARCHAR) || ':cur') AS skey
         |  FROM bk),
         |sh AS (
         |  SELECT doc_id, stage_no,
         |    ('0x' || substr(skey, 1, 3))::BIGINT % ${Corpus.ShuffleShards}
         |      AS shard, skey
         |  FROM cur)
         |SELECT doc_id, stage_no, CAST(shard AS BIGINT) AS shard,
         |  CAST(row_number() OVER (PARTITION BY stage_no, shard
         |    ORDER BY skey, doc_id) AS BIGINT) AS pos
         |FROM sh ORDER BY doc_id""".stripMargin,
    "q_ngram_novelty" ->
      """WITH g0 AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(l) - 7),
        |    i -> md5(array_to_string(l[i:i+7], ' ')))) AS gh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l
        |        FROM documents) t
        |  WHERE len(l) >= 8),
        |grams AS (SELECT DISTINCT doc_id, gh FROM g0),
        |dpg AS (SELECT gh, count(*) AS n_docs FROM grams GROUP BY gh)
        |SELECT g.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  CAST(sum(CASE WHEN d.n_docs = 1 THEN 1 ELSE 0 END) * 1000
        |    // count(*) AS BIGINT) AS novelty_pm
        |FROM grams g JOIN dpg d USING (gh)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "q_vocab_coverage" ->
      s"""WITH vocab AS (
         |  SELECT token FROM (
         |    SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
         |  GROUP BY token ORDER BY count(*) DESC, token LIMIT $VocabCoverageK),
         |tok AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN token IN (SELECT token FROM vocab)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
         |  FROM tok GROUP BY source),
         |em AS (
         |  SELECT source, n_tokens, n_covered FROM per
         |  UNION ALL
         |  SELECT '(all)', CAST(sum(n_tokens) AS BIGINT),
         |    CAST(sum(n_covered) AS BIGINT) FROM per)
         |SELECT source, n_tokens, n_covered,
         |  CAST(n_covered * 1000 // n_tokens AS BIGINT) AS coverage_pm
         |FROM em ORDER BY source""".stripMargin,
    "q_vocab_topk" ->
      """SELECT token, freq FROM (
        |  SELECT token, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token FROM documents) toks
        |  GROUP BY token) f
        |ORDER BY freq DESC, token LIMIT 100""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""SELECT doc_id, lang, n_tokens, n_stop,
         |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
         |  CAST(char_sum AS DOUBLE) / n_tokens AS avg_token_len
         |FROM (SELECT doc_id, lang,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |        CAST(len(list_filter(string_split(text, ' '),
         |          x -> list_contains($stopSql, x))) AS BIGINT) AS n_stop,
         |        CAST(list_sum(list_transform(string_split(text, ' '),
         |          x -> len(x))) AS BIGINT) AS char_sum
         |      FROM documents) t
         |ORDER BY doc_id""".stripMargin,
    "q_lang_guess" ->
      s"""SELECT doc_id, lang, round(stop_ratio, 6) AS stop_ratio,
         |  CASE WHEN stop_ratio >= 0.05 THEN 'en-like' ELSE 'unknown' END AS guess
         |FROM (SELECT doc_id, lang,
         |        CAST(len(list_filter(string_split(text, ' '),
         |          x -> list_contains($stopSql, x))) AS DOUBLE)
         |          / len(string_split(text, ' ')) AS stop_ratio
         |      FROM documents) t
         |ORDER BY doc_id""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_token_regex" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num,
        |  CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) AS n_other
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tok,
        |  1.0 - CAST(len(list_distinct(l)) AS DOUBLE) / len(l) AS dup_tok_ratio,
        |  CASE WHEN len(bg) > 0
        |       THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
        |       ELSE 0.0 END AS dup_big_ratio,
        |  (CASE WHEN len(bg) > 0
        |        THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
        |        ELSE 0.0 END) > 0.2 AS repetitive
        |FROM (
        |  SELECT doc_id, l,
        |    CASE WHEN len(l) >= 2
        |      THEN list_transform(generate_series(1, len(l) - 1),
        |           i -> l[i] || ' ' || l[i + 1])
        |      ELSE [] END AS bg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) t) b
        |ORDER BY doc_id""".stripMargin,
    "q_doc_chunks" ->
      """SELECT doc_id, chunk_start, chunk,
        |  CAST(len(chunk) AS BIGINT) AS chunk_len
        |FROM (
        |  SELECT doc_id, chunk_start, substring(text, chunk_start + 1, 256) AS chunk
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(0, greatest(n_chars - 1, 0), 192)) AS chunk_start
        |        FROM documents) spans) chunks
        |ORDER BY doc_id, chunk_start""".stripMargin,
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks WHERE doc_id < 50
        |  GROUP BY doc_id, term
        |), dft AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
        |), n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, term, tf, df, score, rnk FROM (
        |  SELECT doc_id, term, tf, df,
        |    CAST(tf * n_docs AS DOUBLE) / df AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(tf * n_docs AS DOUBLE) / df DESC, term) AS rnk
        |  FROM tf JOIN dft USING (term), n) ranked
        |WHERE rnk <= 10 ORDER BY doc_id, rnk""".stripMargin,
    "q_lm_unigram_score" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |), freq AS (
        |  SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        |), tot AS (SELECT sum(cnt) AS total FROM freq)
        |SELECT doc_id, count(*) AS n_tok,
        |  CAST(sum(cnt) AS DOUBLE) / (count(*) * total) AS mean_prob,
        |  CAST(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS rare_ratio
        |FROM toks JOIN freq USING (tok), tot
        |GROUP BY doc_id, total ORDER BY doc_id""".stripMargin,
    "q_pii_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw, '[a-z0-9._-]+@[a-z0-9.-]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(raw, '[0-9]{4,}')) AS BIGINT) AS n_ids,
        |  regexp_replace(
        |    regexp_replace(raw, '[a-z0-9._-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]{4,}', '<NUM>', 'g') AS scrubbed
        |FROM (SELECT doc_id,
        |        text || ' contact user' || doc_id || '@example.com ref '
        |             || ((doc_id + 1000) * 7919) AS raw
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "q_mink_prob" ->
      (s"WITH $minkSql\n" +
      """SELECT doc_id, n_tok, k_cnt, mink_mass,
        |  CAST(CAST(mink_mass AS HUGEINT) * 1000000000
        |    // (CAST(k_cnt AS HUGEINT) * gtotal) AS BIGINT) AS mink_ppb,
        |  CAST(mink_mass AS HUGEINT) * gk
        |    >= CAST(gmass AS HUGEINT) * k_cnt AS suspect
        |FROM k, g ORDER BY doc_id""".stripMargin),
    "q_dataset_infer" ->
      (s"WITH $minkSql,\n" +
      """d AS (
        |  SELECT dd.source, k.*,
        |    CAST(mink_mass AS HUGEINT) * gk
        |      >= CAST(gmass AS HUGEINT) * k_cnt AS doc_suspect
        |  FROM k JOIN documents dd USING (doc_id), g),
        |s AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(k_cnt) AS BIGINT) AS src_k,
        |    CAST(sum(mink_mass) AS BIGINT) AS src_mass,
        |    CAST(sum(CASE WHEN doc_suspect THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_suspect
        |  FROM d GROUP BY source)
        |SELECT source, n_docs, src_k, src_mass,
        |  CAST(CAST(src_mass AS HUGEINT) * 1000000000
        |    // (CAST(src_k AS HUGEINT) * gtotal) AS BIGINT) AS src_ppb,
        |  n_suspect,
        |  CAST(n_suspect * 1000 // n_docs AS BIGINT) AS suspect_share_pm,
        |  CAST(src_mass AS HUGEINT) * gk
        |    >= CAST(gmass AS HUGEINT) * src_k AS flagged
        |FROM s, g ORDER BY source""".stripMargin)
  )

  /** The min-k% CTE chain (mirrors [[minkPerDoc]]) through `k` (the
    * per-doc table) and `g` (the one-row global calibration sums).
    * Margin-stripped here; concatenate, don't re-interpolate.
    */
  private lazy val minkSql: String =
    s"""mtoks AS (
       |  SELECT doc_id, CAST(i - 1 AS INT) AS pos, l[i] AS tok
       |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
       |        FROM (SELECT doc_id, string_split(text, ' ') AS l
       |              FROM documents) t0) t1),
       |mfreq AS (SELECT tok, count(*) AS cnt FROM mtoks GROUP BY tok),
       |mr AS (
       |  SELECT t.doc_id, f.cnt,
       |    row_number() OVER (PARTITION BY t.doc_id
       |      ORDER BY f.cnt, t.tok, t.pos) AS rnk,
       |    count(*) OVER (PARTITION BY t.doc_id) AS n_tok
       |  FROM mtoks t JOIN mfreq f USING (tok)),
       |k AS (
       |  SELECT doc_id, CAST(max(n_tok) AS BIGINT) AS n_tok,
       |    CAST(max((n_tok * $MinKPct + 99) // 100) AS BIGINT) AS k_cnt,
       |    CAST(sum(CASE WHEN rnk <= (n_tok * $MinKPct + 99) // 100
       |      THEN cnt ELSE 0 END) AS BIGINT) AS mink_mass
       |  FROM mr GROUP BY doc_id),
       |g AS (
       |  SELECT CAST(sum(mink_mass) AS BIGINT) AS gmass,
       |    CAST(sum(k_cnt) AS BIGINT) AS gk,
       |    CAST(sum(n_tok) AS BIGINT) AS gtotal
       |  FROM k)""".stripMargin
}
