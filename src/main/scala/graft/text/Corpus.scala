package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators: the stages that turn a cleaned document
  * pool into a training corpus — benchmark decontamination, sequence
  * packing, deterministic shuffling, mixture sampling, and length
  * profiling.
  *
  * Shared design rule: every randomized-looking decision (shuffle
  * order, sample keep/drop) derives from a content/key hash, never an
  * RNG — so results are reproducible across engines, partitionings and
  * retries, which is what makes them oracle-able here and re-runnable
  * on a 1000-executor cluster.
  */
object Corpus {

  /** md5-derived integer in [0, m) from an expression — the same
    * construction (and byte range) on the DuckDB side gives exact
    * parity. `off` selects independent hash streams from one digest.
    */
  private def hashBucket(c: Column, off: Int, m: Int): Column =
    pmod(conv(substring(md5(c.cast("binary")), off, 4), 16, 10)
      .cast("long"), lit(m.toLong))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark decontamination: find corpus documents that share
    // 3-gram shingles with a held-out benchmark set (here: doc_id %
    // 97 == 0). The index is built over the BENCHMARK side only — at
    // 100 TB the benchmark is a few thousand eval documents, so its
    // shingle index broadcasts and the corpus streams past it with
    // zero shuffle of document payloads; only the thin (doc_id,
    // shingle) hit pairs aggregate. This is the standard n-gram
    // overlap decontamination pass (cf. GPT-3/C4 dataset reports).
    "q_decontaminate" -> ((s, d) => {
      val sets = graft.dedup.Dedup.shingleSets(s, d)
      val bench = sets.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("bdoc"), explode(col("sh")).as("s"))
      val corpus = sets.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode(col("sh")).as("s"))
      corpus.join(broadcast(bench), "s")
        .groupBy(col("doc_id"), col("bdoc"))
        .agg(countDistinct(col("s")).as("n_shared"))
        .groupBy(col("doc_id"))
        .agg(max(col("n_shared")).as("max_shared"),
          countDistinct(col("bdoc")).as("n_bench_hits"))
        .withColumn("contaminated", col("max_shared") >= 5)
        .orderBy(col("doc_id"))
    }),

    // Sequence packing: assign documents to fixed-capacity token bins
    // (2048 tokens) per source shard, in deterministic doc_id order —
    // the pass that concatenates documents into training sequences.
    // The running sum is windowed PER SOURCE, so at 100 TB each shard
    // packs independently (bounded window partitions, no global sort);
    // bin id = tokens-before-this-doc div capacity, all integer math.
    "q_seq_pack" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("running", sum(col("n_tok")).over(w))
        .withColumn("bin", expr("(running - n_tok) div 2048"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic corpus shuffle: hash-shard then hash-order within
    // the shard — the reproducible "global shuffle" that training
    // ingestion needs. No RNG state: the order is a pure function of
    // doc_id, stable under repartitioning and retries. Positions are
    // per-shard (window partitioned by shard); a single global
    // row_number would serialize through one partition at 100 TB,
    // shards keep every partition bounded and independent.
    "q_corpus_shuffle" -> ((s, d) => {
      val wPos = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat(col("doc_id").cast("string"), lit(":42")).cast("binary"))
            .as("skey"))
        .withColumn("shard",
          pmod(conv(substring(col("skey"), 1, 2), 16, 10).cast("long"),
            lit(16L)))
        .withColumn("pos", row_number().over(wPos).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"), col("skey"))
        .orderBy(col("doc_id"))
    }),

    // Mixture sampling: per-language keep rates (downsample the
    // dominant language, keep the rest) via an independent md5 stream
    // on content — deterministic Bernoulli, the way dataset mixtures
    // are actually weighted. Pure per-row map, zero shuffle; rates
    // tune per domain without touching the pipeline.
    "q_mixture_sample" -> ((s, d) => {
      val weight = when(col("lang") === "en", 50L)
        .when(col("lang") === "zh", 100L)
        .otherwise(80L)
      Tables.documents(s, d)
        .withColumn("bucket", hashBucket(col("text"), 9, 100))
        .withColumn("keep_w", weight)
        .filter(col("bucket") < col("keep_w"))
        .select(col("doc_id"), col("lang"), col("bucket"), col("keep_w"))
        .orderBy(col("doc_id"))
    }),

    // Equal-frequency (quantile) bucketing: ntile(10) over document
    // length per language — the curriculum-ordering pass (shortest
    // decile first). Deterministic: the tiebreak on doc_id pins the
    // order. Window partitions by lang, so partitions stay bounded;
    // at extreme scale the same op runs as approx quantile cuts +
    // a per-row bucket lookup.
    "q_quantile_bucket" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("decile", ntile(10).over(w))
        .orderBy(col("doc_id"))
    }),

    // Length histogram: fixed-width n_chars buckets per language —
    // the corpus-profiling pass that drives chunking and filter
    // thresholds. Bounded output (langs × 10 buckets); map-side
    // combine collapses each partition before the one thin shuffle.
    "q_length_hist" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("bucket", least(expr("n_chars div 100"), lit(9L)))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"), col("bucket")))
  )

  private val shingleSetsSql =
    """SELECT doc_id, CASE WHEN len(l) >= 3
      |    THEN list_distinct(list_transform(generate_series(1, len(l) - 2),
      |         i -> array_to_string(l[i:i+2], ' ')))
      |    ELSE [array_to_string(l, ' ')] END AS sh
      |FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents) toks""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_decontaminate" ->
      s"""WITH sets AS ($shingleSetsSql),
         |sh AS (SELECT doc_id, unnest(sh) AS s FROM sets),
         |bench AS (SELECT doc_id AS bdoc, s FROM sh WHERE doc_id % 97 = 0),
         |corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 != 0),
         |hits AS (
         |  SELECT c.doc_id, b.bdoc, count(DISTINCT c.s) AS n_shared
         |  FROM corpus c JOIN bench b USING (s)
         |  GROUP BY c.doc_id, b.bdoc)
         |SELECT doc_id, max(n_shared) AS max_shared,
         |  CAST(count(DISTINCT bdoc) AS BIGINT) AS n_bench_hits,
         |  max(n_shared) >= 5 AS contaminated
         |FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_seq_pack" ->
      """SELECT doc_id, source, n_tok, running, (running - n_tok) // 2048 AS bin
        |FROM (
        |  SELECT doc_id, source, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running
        |  FROM (SELECT doc_id, source,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |        FROM documents) t) w
        |ORDER BY doc_id""".stripMargin,
    "q_corpus_shuffle" ->
      """SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id)
        |    AS BIGINT) AS pos, skey
        |FROM (SELECT doc_id,
        |        md5(doc_id || ':42') AS skey,
        |        ('0x' || substr(md5(doc_id || ':42'), 1, 2))::BIGINT % 16 AS shard
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "q_mixture_sample" ->
      """SELECT doc_id, lang, bucket, keep_w FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(text), 9, 4))::BIGINT % 100 AS bucket,
        |    CASE WHEN lang = 'en' THEN 50
        |         WHEN lang = 'zh' THEN 100 ELSE 80 END AS keep_w
        |  FROM documents) t
        |WHERE bucket < keep_w ORDER BY doc_id""".stripMargin,
    "q_quantile_bucket" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(ntile(10) OVER (PARTITION BY lang
        |    ORDER BY n_chars, doc_id) AS INT) AS decile
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_length_hist" ->
      """SELECT lang, least(n_chars // 100, 9) AS bucket,
        |  count(*) AS n_docs, min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin
  )
}
