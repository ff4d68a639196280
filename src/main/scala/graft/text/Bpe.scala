package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and ENCODING (Sennrich et
  * al. 2016, the GPT-2/Llama tokenizer construction) — the tokenizer
  * operators a training-data engine owes the pipeline beyond token
  * counting: learn the first `Merges` merge rules from the corpus
  * (`q_bpe_merges`), then apply them to measure the corpus as the
  * tokenizer would see it (`q_bpe_encode`).
  *
  * The scale design is the same one that makes BPE training feasible
  * anywhere: the merge loop never touches the corpus. The ONLY
  * corpus-wide pass is the initial word-frequency aggregate
  * (map-side combined, shuffling (word, count) pairs); every
  * iteration after that operates on the WORD-FREQUENCY table, whose
  * size is the corpus VOCABULARY — bounded in the millions at any
  * corpus scale, and independent of token count. Per iteration: one
  * thin (left, right, Σcount) pair aggregate over the vocabulary, a
  * single-row driver collect of the argmax pair (deterministic
  * tiebreak: count desc, then left, then right), and a per-row
  * left-to-right merge fold applied to the symbol arrays (a
  * higher-order `aggregate` over arrays that average a handful of
  * symbols — no UDF, no corpus shuffle). `localCheckpoint` truncates
  * the 8-deep lambda lineage, the standard iterative-algorithm
  * pattern (same as the connected-components fixpoint).
  *
  * Encoding is the reverse trade: the learned rules are a
  * CONSTANT-SIZE table (8 here, ≤100k for a real tokenizer), so the
  * encode pass folds them into a per-row expression over the
  * documents scan — zero shuffle at any corpus size, the
  * decode-free analog of "tokenize with a broadcast vocabulary".
  *
  * FULLY ORACLED: the DuckDB oracle GENERATES the training loop as an
  * unrolled $Merges-step CTE chain (the q_doremi_weights technique) —
  * per step one pair aggregate, one deterministic argmax, and the
  * greedy merge pass expressed via run parity (see [[oracleStep]]) —
  * so merges, BPE encode, and the WordPiece greedy scan (a recursive
  * CTE) are all hash-checked end to end. BpeSpec additionally replays
  * the algorithms in plain Scala and pins the greedy merge-pass
  * semantics on adversarial symbol runs ("aaa" + (a,a) → [aa, a]).
  */
object Bpe {

  /** Number of merge rules to learn. Real tokenizers run 30k-100k
    * merges; each is the same bounded iteration, so the count is a
    * budget knob, not a scale limit.
    */
  val Merges = 8

  /** WordPiece greedy-scan round cap: each round is one blocking
    * vocabulary-table checkpoint pass, so the round count must be
    * bounded by a constant, not by the corpus's longest "word" (one
    * kilobyte-long unbroken string would otherwise mean a thousand
    * sequential rounds). Tails past the cap fall back to single-char
    * pieces; this corpus's max word length is 8, so the cap never
    * binds at test scale.
    */
  val WpScanCap = 32

  /** Unigram-LM (SentencePiece) knobs: candidate pieces are all
    * substrings up to this length; the vocabulary keeps every single
    * character (open vocabulary) plus the top-K multi-char pieces by
    * occurrence mass, deterministic (mass desc, piece asc) cutoff.
    */
  val UniMaxPieceLen = 4
  val UniVocabK = 512

  /** Unigram candidate-piece table with occurrence mass: for every
    * distinct word, every substring of length 1..UniMaxPieceLen at
    * every position, weighted by the word's corpus frequency — the
    * seed-vocabulary statistic of the unigram-LM tokenizer (Kudo
    * 2018; the full EM re-weights these, but the frequency-seeded
    * one-step model is deterministic and already separates fluent
    * pieces). Kept set: all single chars + top-K multi-char;
    * prob_ppm is integer per-mille-of-a-thousand over the KEPT mass.
    * One vocabulary-bounded explode + map-combined aggregate — the
    * corpus is touched only through wordFreq's one pass.
    */
  /** The trained unigram-LM piece model as a WRITE-ONCE layout — a
    * tokenizer model is a per-corpus ARTIFACT (trained once, read by
    * every encode job forever), the q_sim_knn_graph/doremi_weights
    * precedent. Content is deterministic (q_unigram_train's oracle
    * certifies it), so re-attach ≡ retrain.
    */
  private[graft] def unigramPieces(s: SparkSession, d: String): DataFrame =
    graft.sources.Layouts.ensureLayout(s, d, "unigram_pieces") {
      unigramPiecesTrain(s, d)
    }

  private[graft] def unigramPiecesTrain(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val subs = wordFreq(s, d)
      .select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(
           |    sequence(i, least(length(w), i + ${UniMaxPieceLen - 1})),
           |    j -> substring(w, i, j - i + 1))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("n_occ"))
    // localCheckpoint: the kept table (≤ |alphabet| + K rows) feeds
    // both the total-mass aggregate and the ppm projection — without
    // the barrier the corpus-wide substring explode would run twice
    val kept = subs
      .withColumn("rk", row_number().over(Window
        .partitionBy(length(col("piece")) === 1)
        .orderBy(col("n_occ").desc, col("piece"))))
      .filter(length(col("piece")) === 1 || col("rk") <= UniVocabK)
      .select(col("piece"), col("n_occ"))
      .localCheckpoint()
    val tot = kept.agg(sum(col("n_occ")).as("tot_occ"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("n_occ"),
        expr("n_occ * 1000000 div tot_occ").as("prob_ppm"))
  }

  /** The one corpus-wide pass: whitespace word frequencies. */
  private[graft] def wordFreq(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** One greedy left-to-right merge pass over a symbol array: adjacent
    * (l, r) becomes the fused symbol; a freshly fused symbol never
    * re-merges with the element that follows in the same pass
    * ("aaa" + (a,a) → [aa, a] — the standard BPE pass semantics).
    */
  private def mergePass(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** The training loop, memoized per corpus dir (both queries and the
    * spec share one learned rule set; the result is a bounded Seq,
    * never an RDD lineage).
    */
  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Long, String, String, Long)]]()

  private[graft] def learnedMerges(s: SparkSession,
      d: String): Seq[(Long, String, String, Long)] =
    mergeCache.computeIfAbsent(Tables.cacheKey(d), _ => {
      var words = wordFreq(s, d)
        .select(split(col("w"), "").as("syms"), col("cnt"))
        .localCheckpoint()
      val merges = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, Long)]
      var step = 1
      var exhausted = false
      while (step <= Merges && !exhausted) {
        val top = words.filter(size(col("syms")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(syms[i-1] AS l, syms[i] AS r))")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("pair_count"))
          .orderBy(col("pair_count").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, c) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((step.toLong, l, r, c))
          words = words
            .withColumn("syms", mergePass(col("syms"), l, r))
            .localCheckpoint()
          step += 1
        }
      }
      merges.toSeq
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_merges" -> ((s, d) =>
      s.createDataFrame(learnedMerges(s, d))
        .toDF("step", "left", "right", "pair_count")
        .orderBy(col("step"))),

    // Tokenizer's-eye corpus measurement: per document, words, raw
    // symbol (char) count, and symbol count after the learned merges
    // — n_bpe/n_chars is the compression the tokenizer achieves,
    // published as integer per-mille for cross-run determinism. The
    // merge folds run ONCE PER DISTINCT WORD (the vocabulary table —
    // exactly where the training loop already did its work), and the
    // corpus pass is then explode → broadcast dictionary join →
    // map-combined per-doc sums: the standard tokenize-with-
    // a-vocabulary shape. The exchange carries only thin (doc_id,
    // len) pairs; the merge-fold cost is vocabulary-bounded, not
    // token-bounded (a first cut folded the 8 passes per token
    // occurrence and was 15 s at sf0.1 — this form is ~1 s).
    "q_bpe_encode" -> ((s, d) => {
      val rules = learnedMerges(s, d).map(m => (m._2, m._3))
      def bpeLen(w: Column): Column =
        size(rules.foldLeft(split(w, "")) {
          case (c, (l, r)) => mergePass(c, l, r)
        }).cast("long")
      val vocab = wordFreq(s, d)
        .select(col("w"), length(col("w")).cast("long").as("wc"),
          bpeLen(col("w")).as("wb"))
      // Broadcast GATED on measured vocabulary size, not hard-coded:
      // an unconditional hint would force an over-threshold broadcast
      // the day a corpus's distinct-word table outgrows executor
      // memory (100k merges × a web-scale vocabulary). The count is
      // one map-combined aggregate over the vocabulary — already the
      // cheap side — and above the bound the hint disappears so
      // AQE picks the join from runtime sizes.
      val vocabRows = vocab.count()
      val dict = if (vocabRows <= 4L * 1000 * 1000) broadcast(vocab) else vocab
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .join(dict, "w")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("wc")).as("n_chars"),
          sum(col("wb")).as("n_bpe"))
        .unionAll(
          // docs with no tokens still report (the left-behind rows)
          Tables.documents(s, d)
            .filter(size(filter(split(col("text"), "\\s+"),
              w => length(w) > lit(0))) === 0)
            .select(col("doc_id"), lit(0L).as("n_words"),
              lit(0L).as("n_chars"), lit(0L).as("n_bpe")))
        .withColumn("compression_pm",
          when(col("n_chars") > 0, col("n_bpe") * 1000L / col("n_chars"))
            .otherwise(lit(1000L)).cast("long"))
        .orderBy(col("doc_id"))
    }),

    // WordPiece-style GREEDY longest-match-first encoding (Wu et al.
    // 2016, the BERT tokenizer's inference rule) over the SAME learned
    // vocabulary: pieces = the merged symbols from BPE training, with
    // single-character fallback (open vocabulary — every word
    // tokenizes). Where BPE encoding replays the merge HISTORY in
    // training order, WordPiece ignores history and takes the longest
    // vocabulary prefix at each position — the two disagree on words
    // like "abc" when (b,c) merged before (a,b): the operators exist
    // as a pair precisely because pipelines must measure both.
    //
    // Scale shape: the greedy scan is a STATIC bounded fold (max word
    // length steps, each a when-chain over the ≤4 distinct piece
    // lengths) built once on the driver from the constant-size rule
    // set and run per DISTINCT WORD — vocabulary-bounded like
    // q_bpe_encode, never per token occurrence; the corpus pass is
    // the same broadcast-dictionary join + map-combined per-doc sums.
    // Rows-only; BpeSpec replays the greedy scan in plain Scala.
    "q_wordpiece_encode" -> ((s, d) => {
      val pieces = learnedMerges(s, d).map(m => m._2 + m._3).distinct
      val byLen = pieces.groupBy(_.length)
      val lensDesc = byLen.keys.toSeq.sorted.reverse
      // the greedy scan is ONE runtime fold per distinct word (the
      // q_unigram_encode rewrite): `aggregate` over WpScanCap steps
      // with a (pos, wp) state struct — a runtime lambda iterates
      // with a constant-size plan, so neither the Catalyst tree
      // blow-up that forced the old per-step checkpoint barriers nor
      // the max-word-length driver scalar applies. The piece sets are
      // bounded literal arrays (the learned-merge vocabulary); the
      // step cap bounds a pathological kilobyte-long "word", whose
      // tail finishes via the residual per-char fallback (the
      // open-vocabulary floor — exactly what greedy matching
      // degenerates to on adversarial strings; provably never taken
      // at this corpus's max word length ≤ cap).
      val advSql = lensDesc.foldRight("1") { (l, els) =>
        val arr = byLen(l).map(p =>
          "'" + p.replace("'", "\\'") + "'").mkString(", ")
        s"IF(array_contains(array($arr), substring(w, st.pos, $l)), $l, $els)"
      }
      val vocab = wordFreq(s, d)
        .select(col("w"), length(col("w")).cast("long").as("wc"))
        .withColumn("st", expr(s"""
          |aggregate(sequence(1, least(cast(wc AS INT), $WpScanCap)),
          |  struct(1 AS pos, 0L AS wp),
          |  (st, _s) -> IF(st.pos > wc, st,
          |    struct(st.pos + $advSql AS pos, st.wp + 1L AS wp)))"""
          .stripMargin))
        // residual fallback: a word still unfinished after the capped
        // steps tokenizes its tail as single-char pieces
        .select(col("w"), col("wc"),
          when(col("st.pos") > col("wc"), col("st.wp"))
            .otherwise(col("st.wp") +
              (col("wc") - col("st.pos") + 1)).as("wp"))
      val vocabRows = vocab.count()
      val dict = if (vocabRows <= 4L * 1000 * 1000) broadcast(vocab) else vocab
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .join(dict, "w")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("wc")).as("n_chars"),
          sum(col("wp")).as("n_wp"))
        .withColumn("fertility_cpm",
          expr("n_wp * 100 div n_words"))
        .orderBy(col("doc_id"))
    }),

    // Unigram-LM (SentencePiece) VOCABULARY — the third member of the
    // tokenizer trio (BPE replays merge history, WordPiece greedy-
    // matches longest prefixes, unigram segments by LIKELIHOOD):
    // candidate pieces are all substrings ≤ UniMaxPieceLen weighted
    // by word frequency, kept = every single char (open vocabulary)
    // + the top-K multi-char pieces, probabilities as integer ppm of
    // the kept mass. Fully oracled (the statistic is one exploded
    // aggregate — the EM that production SentencePiece runs on top
    // re-weights exactly this table).
    "q_unigram_train" -> ((s, d) =>
      unigramPieces(s, d).orderBy(col("piece"))),

    // Unigram-LM ENCODE: Viterbi maximum-likelihood segmentation of
    // every DISTINCT WORD under the trained piece model. The DP is
    // ONE higher-order `aggregate` expression per word — a runtime
    // fold over positions whose state is the per-position (score,
    // -pieces) array — replacing the former 8-round blocking driver
    // loop (that loop existed because EMBEDDING the state expression
    // per step grows the Catalyst tree exponentially; a single
    // aggregate() lambda evaluates iteratively at RUNTIME with a
    // constant-size plan, so neither the tree blow-up nor the 8
    // checkpoint barriers apply — measured 2.6 s → ~0.7 s at sf0.1).
    // Per-word work is bounded: ≤ min(wc, cap)·UniMaxPieceLen edge
    // structs and a ≤ cap+1-element state. Ties break toward fewer
    // pieces via the (sc, -np) struct max, exactly as before.
    // Vocabulary-bounded throughout; the corpus pass is the same
    // gated-broadcast dictionary join + map-combined per-doc sums as
    // BPE/WordPiece. Rows-only (log-likelihood doubles have no
    // integer twin); UnigramSpec replays the exact Viterbi in plain
    // Scala and pins the cap fallback.
    "q_unigram_encode" -> ((s, d) => {
      val pieces = unigramPieces(s, d)
        .select(col("piece"), col("n_occ")).localCheckpoint()
      val tot = pieces.agg(sum(col("n_occ")).as("tot_occ"))
      val lp = pieces.crossJoin(broadcast(tot))
        .select(col("piece"),
          (log(col("n_occ")) - log(col("tot_occ"))).as("logp"))
      val words = wordFreq(s, d)
        .select(col("w"), length(col("w")).as("wc"))
      val edgeArr = words.select(col("w"),
          explode(expr(
            s"""flatten(transform(sequence(1, wc),
               |  i -> transform(
               |    sequence(1, least($UniMaxPieceLen, wc - i + 1)),
               |    l -> struct(i AS i, i + l AS j,
               |      substring(w, i, l) AS piece))))""".stripMargin)).as("e"))
        .select(col("w"), col("e.i").as("i"), col("e.j").as("j"),
          col("e.piece").as("piece"))
        .join(lp, "piece")
        .groupBy(col("w"))
        .agg(collect_list(struct(col("i"), col("j"), col("logp")))
          .as("es"))
      // residual fallback (the q_wordpiece_encode rule): the DP runs
      // to min(wc, cap) + 1; the FURTHEST reachable state wins and an
      // over-cap word's untokenized tail counts as single-char
      // pieces. For finished words pos == wc + 1 is the unique
      // maximum reachable state, so the fallback term is 0; at this
      // corpus's max word length (≤ cap) the branch is provably never
      // taken — UnigramSpec pins both facts. A word with NO in-vocab
      // substring keeps the empty edge array and degenerates to the
      // all-single-char count, as before.
      val vocab = words
        .join(edgeArr, Seq("w"), "left")
        .withColumn("es", coalesce(col("es"),
          expr("array()").cast(
            "array<struct<i:int,j:int,logp:double>>")))
        .withColumn("st", expr(s"""
          |aggregate(
          |  sequence(2, least(wc, $WpScanCap) + 1),
          |  array(struct(cast(0.0 as double) AS sc, 0L AS negnp)),
          |  (acc, j) -> array_append(acc, coalesce(
          |    array_max(transform(
          |      filter(es, e -> e.j = j AND e.i <= size(acc)
          |        AND element_at(acc, e.i).sc > cast(-1e17 as double)),
          |      e -> struct(
          |        element_at(acc, e.i).sc + e.logp AS sc,
          |        element_at(acc, e.i).negnp - 1L AS negnp))),
          |    struct(cast(-1e18 as double) AS sc, 0L AS negnp))))"""
          .stripMargin))
        .withColumn("best_pos", expr(
          """aggregate(sequence(1, size(st)), 1,
            |  (m, k) -> IF(element_at(st, k).sc
            |    > cast(-1e17 as double), k, m))""".stripMargin))
        .select(col("w"), col("wc").cast("long").as("wcl"),
          (-col("st").getItem(col("best_pos") - 1).getField("negnp") +
            (col("wc") + lit(1) - col("best_pos")).cast("long"))
            .as("np"))
      val vocabRows = vocab.count()
      val dict = if (vocabRows <= 4L * 1000 * 1000) broadcast(vocab) else vocab
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .join(dict, "w")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("wcl")).as("n_chars"),
          sum(col("np")).as("n_pieces"))
        .withColumn("fertility_cpm",
          expr("n_pieces * 100 div n_words"))
        .orderBy(col("doc_id"))
    })
  )

  /** DuckDB mirror of ONE BPE training iteration: pair statistics
    * over the step-k word table, the deterministic argmax merge
    * (count desc, left, right), and the greedy left-to-right merge
    * pass. The pass is SQL-expressible without a sequential fold via
    * RUN PARITY: a position fuses iff it matches (l, r) AND its
    * offset inside the maximal run of consecutive matches containing
    * it is even — consecutive matches are only possible when l == r
    * (a match at i-1 forces syms[i] = r and a match at i forces
    * syms[i] = l), and there the greedy pass fuses positions
    * 0, 2, 4, ... of the run ("aaa" + (a,a) → [aa, a]); when l ≠ r
    * every match is its own run and fuses unconditionally. The
    * run-offset is i minus the last non-match position before i,
    * itself a bounded list_max (words are short; the oracle runs at
    * sf0.01 only).
    */
  private def oracleStep(k: Int): String = s"""
     |p$k AS (
     |  SELECT pr.l AS l, pr.r AS r, CAST(sum(cnt) AS BIGINT) AS pair_count
     |  FROM (
     |    SELECT cnt, unnest(list_transform(generate_series(1, len(syms) - 1),
     |      i -> {'l': syms[i], 'r': syms[i+1]})) AS pr
     |    FROM w$k WHERE len(syms) >= 2) t
     |  GROUP BY pr.l, pr.r),
     |m$k AS (SELECT l, r, pair_count FROM p$k
     |        ORDER BY pair_count DESC, l, r LIMIT 1),
     |w${k + 1} AS (
     |  SELECT w, cnt, flatten(list_transform(generate_series(1, len(syms)),
     |    p -> CASE WHEN p < len(syms) AND mg[p] THEN [syms[p] || syms[p+1]]
     |              WHEN p > 1 AND mg[p-1] THEN []
     |              ELSE [syms[p]] END)) AS syms
     |  FROM (
     |    SELECT w, cnt, syms,
     |      list_transform(generate_series(1, len(syms) - 1), i ->
     |        syms[i] = m.l AND syms[i+1] = m.r AND
     |        ((i - coalesce(list_max(list_transform(generate_series(1, i),
     |           j -> CASE WHEN NOT (syms[j] = m.l AND syms[j+1] = m.r)
     |                THEN j ELSE 0 END)), 0)) % 2 = 1)) AS mg
     |    FROM w$k, m$k m) s)""".stripMargin

  /** wf + char-split w1 + the unrolled $Merges-step training chain —
    * the shared prefix of all three tokenizer oracles (the DoReMi /
    * hash-family precedent: the oracle GENERATES the algorithm as a
    * CTE chain rather than asserting its outputs).
    *
    * CHARS-intended lengths throughout (round-15 sweep): the Spark
    * tokenizers are character-level — `split(w, "")`, `substring`,
    * `length()` — so every oracle length is DuckDB `length()`
    * (codepoints), never the byte-counting `strlen`, and pairs with
    * codepoint-indexed `substr`.
    */
  private def oracleChain: String = (s"""wf AS (
     |  SELECT w, count(*) AS cnt FROM (
     |    SELECT unnest(string_split_regex(text, '\\s+')) AS w
     |    FROM documents) t
     |  WHERE length(w) > 0 GROUP BY w),
     |w1 AS (
     |  SELECT w, cnt, list_transform(generate_series(1, length(w)),
     |    i -> substr(w, i, 1)) AS syms
     |  FROM wf)""".stripMargin +: (1 to Merges).map(oracleStep))
    .mkString(",")

  private def oracleAllM: String = "all_m AS (" +
    (1 to Merges).map(k =>
      s"SELECT CAST($k AS BIGINT) AS step, l, r, pair_count FROM m$k")
      .mkString(" UNION ALL ") + ")"

  private val oracleToks = """toks AS (
     |  SELECT doc_id, w FROM (
     |    SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w
     |    FROM documents) t
     |  WHERE length(w) > 0)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_bpe_merges" ->
      s"""WITH $oracleChain,
         |$oracleAllM
         |SELECT step, l AS "left", r AS "right", pair_count
         |FROM all_m ORDER BY step""".stripMargin,

    "q_bpe_encode" ->
      s"""WITH $oracleChain,
         |enc AS (SELECT w, CAST(length(w) AS BIGINT) AS wc,
         |        CAST(len(syms) AS BIGINT) AS wb FROM w${Merges + 1}),
         |$oracleToks,
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |    CAST(sum(wc) AS BIGINT) AS n_chars,
         |    CAST(sum(wb) AS BIGINT) AS n_bpe
         |  FROM toks JOIN enc USING (w) GROUP BY doc_id
         |  UNION ALL
         |  SELECT doc_id, 0, 0, 0 FROM documents
         |  WHERE len(list_filter(string_split_regex(text, '\\s+'),
         |    x -> length(x) > 0)) = 0)
         |SELECT doc_id, n_words, n_chars, n_bpe,
         |  CAST(CASE WHEN n_chars > 0 THEN n_bpe * 1000 // n_chars
         |       ELSE 1000 END AS BIGINT) AS compression_pm
         |FROM agg ORDER BY doc_id""".stripMargin,

    // greedy longest-match-first scan as a RECURSIVE CTE: one row per
    // (word, step), advancing by the longest vocabulary piece at the
    // current position (single-char fallback), capped at
    // least(wc, $WpScanCap) steps with the untokenized tail counted
    // as single-char pieces — the exact Spark-side fold semantics.
    "q_wordpiece_encode" ->
      s"""WITH RECURSIVE $oracleChain,
         |$oracleAllM,
         |pieces AS (SELECT DISTINCT l || r AS piece FROM all_m),
         |scan AS (
         |  SELECT w, CAST(length(w) AS BIGINT) AS wc,
         |    CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS wp,
         |    CAST(0 AS BIGINT) AS k
         |  FROM wf
         |  UNION ALL
         |  SELECT w, wc,
         |    pos + coalesce((SELECT max(length(pc.piece)) FROM pieces pc
         |      WHERE substr(s.w, CAST(s.pos AS INT), length(pc.piece))
         |        = pc.piece), 1),
         |    wp + 1, k + 1
         |  FROM scan s WHERE pos <= wc AND k < least(wc, $WpScanCap)),
         |fin AS (
         |  SELECT w, wc,
         |    CASE WHEN pos > wc THEN wp ELSE wp + (wc - pos + 1) END AS wp
         |  FROM scan WHERE NOT (pos <= wc AND k < least(wc, $WpScanCap))),
         |$oracleToks
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(wc) AS BIGINT) AS n_chars,
         |  CAST(sum(wp) AS BIGINT) AS n_wp,
         |  CAST(sum(wp) * 100 // count(*) AS BIGINT) AS fertility_cpm
         |FROM toks JOIN fin USING (w) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_unigram_train" ->
      s"""WITH wf AS (
         |  SELECT w, count(*) AS cnt FROM (
         |    SELECT unnest(string_split_regex(text, '\\s+')) AS w
         |    FROM documents) t
         |  WHERE length(w) > 0 GROUP BY w),
         |subs AS (
         |  SELECT cnt, unnest(flatten(list_transform(
         |    generate_series(1, length(w)),
         |    i -> list_transform(
         |      generate_series(i, least(length(w), i + ${UniMaxPieceLen - 1})),
         |      j -> substr(w, i, j - i + 1))))) AS piece
         |  FROM wf),
         |agg AS (
         |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS n_occ
         |  FROM subs GROUP BY piece),
         |kept AS (
         |  SELECT piece, n_occ FROM (
         |    SELECT piece, n_occ, row_number() OVER (
         |      PARTITION BY length(piece) = 1
         |      ORDER BY n_occ DESC, piece) AS rk
         |    FROM agg) r
         |  WHERE length(piece) = 1 OR rk <= $UniVocabK),
         |tot AS (SELECT CAST(sum(n_occ) AS BIGINT) AS tot_occ FROM kept)
         |SELECT piece, n_occ,
         |  CAST(n_occ * 1000000 // tot_occ AS BIGINT) AS prob_ppm
         |FROM kept, tot ORDER BY piece""".stripMargin)
}
