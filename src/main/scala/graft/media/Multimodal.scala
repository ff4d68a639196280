package graft.media

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media blob with typed metadata — the multimodal column model:
  * image/audio/video payloads ride as opaque `binary` with metadata
  * columns beside them.
  */
case class MediaRecord(doc_id: Long, media_type: String, n_bytes: Long,
                       payload: Array[Byte])

/** Decoded media features (stub decode — see `Multimodal.decodeBatch`). */
case class DecodedMedia(doc_id: Long, media_type: String, n_bytes: Long,
                        width: Int, height: Int, channels: Int, ok: Boolean)

/** Decode + resize output (stub kernels, real batch plumbing). */
case class ResizedMedia(doc_id: Long, media_type: String,
                        width: Int, height: Int, out_w: Int, out_h: Int,
                        n_out_bytes: Long)

/** Multimodal-column plumbing: binary payload + typed metadata,
  * batch-shaped decode via `mapPartitions` over a typed Dataset.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB — but everything around it is the
  * real production shape: schema (binary + metadata), per-partition
  * batching (the decoder sees `BatchSize` records at a time, the same
  * contract a vectorized/Arrow UDF would have), and partition-local
  * execution with no shuffle. Swapping the stub for a real
  * libjpeg/ffmpeg call changes one function.
  *
  * The synthetic corpus has no binary table, so payloads are derived
  * from `documents.text` bytes — deterministic, so the stub's outputs
  * are still DuckDB-oracle-checkable.
  */
object Multimodal {

  private val BatchSize = 64

  /** STUB decoder: a real implementation would hand `batch` to an
    * image/audio library. Deterministic fake: dimensions derived from
    * payload length.
    */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[DecodedMedia] =
    batch.map { m =>
      val w = 64 + (m.n_bytes % 512).toInt
      val h = 64 + ((m.n_bytes * 7) % 512).toInt
      DecodedMedia(m.doc_id, m.media_type, m.n_bytes, w, h, 3, m.n_bytes > 0)
    }

  /** STUB resize: fit into a 224×224 box preserving aspect ratio.
    * Integer arithmetic only ((dim·224) div max-side) so the oracle is
    * exact; a real implementation would hand the batch to an image
    * library's resize alongside the decoded pixels.
    */
  private def resizeBatch(batch: Seq[DecodedMedia]): Seq[ResizedMedia] =
    batch.map { m =>
      val side = math.max(m.width, m.height)
      val ow = (m.width * 224) / side
      val oh = (m.height * 224) / side
      ResizedMedia(m.doc_id, m.media_type, m.width, m.height, ow, oh,
        ow.toLong * oh * m.channels)
    }

  /** dHash-style 64-bit perceptual hash over the payload byte stream:
    * 64 stripes, bit i set when stripe i's mean byte value exceeds
    * stripe (i+1 mod 64)'s. This IS difference-hash with the byte
    * stream standing in for the downsampled grayscale grid (the
    * container has no codecs). The gradient form is chosen over the
    * global-mean aHash deliberately: a global mean makes EVERY bit
    * borderline-sensitive to any edit (measured here: one changed
    * byte flipped 5-15 bits on homogeneous text payloads), while
    * adjacent-stripe comparisons localize damage — a single-byte edit
    * touches one stripe and therefore AT MOST its two adjacent
    * comparisons, a provable ≤2-bit Hamming bound. Payloads shorter
    * than 64 bytes are ZERO-PADDED to 64 before striping: below that
    * length multiple stripes would share a byte (from = s*n/64
    * collides) and one edit could flip more than two comparisons —
    * padding gives every stripe its own byte so the locality bound
    * holds unconditionally (tiling would NOT: a repeated byte appears
    * in several stripes). A real implementation hashes decoded
    * pixels; the kernel swap is one function, the pipeline around it
    * is the real shape.
    */
  private[graft] def dHash64(raw: Array[Byte]): Long = {
    if (raw.length == 0) return 0L
    val bytes =
      if (raw.length >= 64) raw else java.util.Arrays.copyOf(raw, 64)
    val n = bytes.length
    val avg = new Array[Double](64)
    var s = 0
    while (s < 64) {
      val from = s * n / 64
      val to = math.max(from + 1, (s + 1) * n / 64)
      var sum = 0.0
      var j = from
      while (j < to) { sum += (bytes(j) & 0xFF); j += 1 }
      avg(s) = sum / (to - from)
      s += 1
    }
    var h = 0L
    s = 0
    while (s < 64) {
      if (avg(s) > avg((s + 1) % 64)) h |= 1L << s
      s += 1
    }
    h
  }

  private def mediaRecords(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("source") === "src0", "image")
          .when(col("source") === "src1", "audio")
          .otherwise("video").as("media_type"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata + integrity hash over the binary payload column.
    "q_media_meta" -> ((s, d) =>
      mediaRecords(s, d).toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          sha2(col("payload"), 256).as("payload_sha256"))
        .orderBy(col("doc_id"))),

    // Batch decode through mapPartitions (vectorized-UDF shape).
    "q_media_decode" -> ((s, d) => {
      import s.implicits._
      mediaRecords(s, d)
        .mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
        .toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("channels"), col("ok"))
        .orderBy(col("doc_id"))
    }),

    // Decode → resize as ONE fused per-partition pipeline: both
    // kernels run inside the same mapPartitions pass, so pixels never
    // cross a stage boundary — the shape a 100 TB image-prep job
    // needs (decode output is ~10× the encoded bytes; shuffling it
    // would dominate the job).
    "q_media_resize" -> ((s, d) => {
      import s.implicits._
      mediaRecords(s, d)
        .mapPartitions(_.grouped(BatchSize)
          .flatMap(b => resizeBatch(decodeBatch(b))))
        .toDF()
        .select(col("doc_id"), col("media_type"), col("width"), col("height"),
          col("out_w"), col("out_h"), col("n_out_bytes"))
        .orderBy(col("doc_id"))
    }),

    // IMAGE near-dup via perceptual hashing — the multimodal member of
    // the dedup family (every image-corpus pipeline runs pHash dedup;
    // the text-dedup machinery cannot see re-encoded or lightly-edited
    // images). Each image hashes to 64 bits in one mapPartitions
    // kernel pass (the decodeBatch contract); candidates come from a
    // SimHash-style banded equi-join on 4×16-bit chunks — with a
    // Hamming threshold of 3, the pigeonhole guarantees one clean
    // band, so banding recall is EXACTLY 1, not probabilistic — and
    // the verify is one codegen'd bit_count(xor) per candidate. The
    // exchange carries only (img_id, band, chunk) + the 8-byte hash;
    // payloads never shuffle. Fixture: every %11 image re-keyed past
    // max(doc_id) with its FIRST byte replaced — a length-preserving
    // edit, the re-encode analog. Rows-only (per-byte kernel);
    // MediaPhashSpec replays the hash + brute-force threshold pairs
    // and pins set equality.
    "q_media_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val imgs = mediaRecords(s, d).toDF()
        .filter(col("media_type") === "image")
        .select(col("doc_id"), col("payload"))
      val off = imgs.agg((max(col("doc_id")) + 1L).as("off"))
      val variants = imgs.filter(col("doc_id") % 11 === 0)
        .crossJoin(broadcast(off))
        .select((col("doc_id") + col("off")).as("doc_id"),
          concat(lit(Array[Byte]('Z'.toByte)),
            expr("substring(payload, 2, 2147483647)")).as("payload"))
      val hashed = imgs.unionAll(variants)
        .select(col("doc_id").as("img_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, b) => (id, dHash64(b)) })
        .toDF("img_id", "phash")
      val bands = hashed.select(col("img_id"), col("phash"),
        posexplode(array((0 until 4).map(i =>
          shiftright(col("phash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)))
        .select(col("img_id"), col("phash"),
          col("pos").as("band"), col("col").as("chunk"))
      bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") &&
            col("x.chunk") === col("y.chunk") &&
            col("x.img_id") < col("y.img_id"))
        .select(col("x.img_id").as("a_id"), col("x.phash").as("ha"),
          col("y.img_id").as("b_id"), col("y.phash").as("hb"))
        .distinct()
        .withColumn("hamming",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .filter(col("hamming") <= 3)
        .select(col("a_id"), col("b_id"), col("hamming"))
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Frame sampling for video rows: stub frame count, then every
    // k-th frame capped at 8 — `sequence`+`slice`+`explode` fans rows
    // out with zero shuffle and the 25fps timestamp is integer math.
    // A real sampler would seek those frame offsets in the container.
    "q_media_framesample" -> ((s, d) =>
      mediaRecords(s, d).toDF()
        .filter(col("media_type") === "video")
        .withColumn("n_frames", lit(1L) + col("n_bytes") % 240L)
        .withColumn("step", greatest(expr("n_frames div 8"), lit(1L)))
        .select(col("doc_id"), col("n_frames"),
          explode(slice(sequence(lit(0L), col("n_frames") - 1L, col("step")),
            1, 8)).as("frame_idx"))
        .withColumn("ts_ms", col("frame_idx") * 40L)
        .orderBy(col("doc_id"), col("frame_idx")))
  )

  val oracle: Map[String, String] = Map(
    "q_media_meta" ->
      """SELECT doc_id,
        |  CASE WHEN source = 'src0' THEN 'image'
        |       WHEN source = 'src1' THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  sha256(text) AS payload_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_media_decode" ->
      """SELECT doc_id,
        |  CASE WHEN source = 'src0' THEN 'image'
        |       WHEN source = 'src1' THEN 'audio' ELSE 'video' END AS media_type,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(64 + strlen(text) % 512 AS INT) AS width,
        |  CAST(64 + (strlen(text) * 7) % 512 AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  strlen(text) > 0 AS ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_media_resize" ->
      """SELECT doc_id, media_type, width, height,
        |  CAST(width * 224 // greatest(width, height) AS INT) AS out_w,
        |  CAST(height * 224 // greatest(width, height) AS INT) AS out_h,
        |  CAST((width * 224 // greatest(width, height))
        |     * (height * 224 // greatest(width, height)) * 3 AS BIGINT) AS n_out_bytes
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN source = 'src0' THEN 'image'
        |         WHEN source = 'src1' THEN 'audio' ELSE 'video' END AS media_type,
        |    CAST(64 + strlen(text) % 512 AS INT) AS width,
        |    CAST(64 + (strlen(text) * 7) % 512 AS INT) AS height
        |  FROM documents) d
        |ORDER BY doc_id""".stripMargin,
    "q_media_framesample" ->
      """SELECT doc_id, n_frames, unnest(frames) AS frame_idx,
        |  unnest(frames) * 40 AS ts_ms
        |FROM (
        |  SELECT doc_id, n_frames,
        |    (generate_series(0, n_frames - 1, greatest(n_frames // 8, 1)))[1:8] AS frames
        |  FROM (
        |    SELECT doc_id, 1 + CAST(strlen(text) AS BIGINT) % 240 AS n_frames
        |    FROM documents
        |    WHERE source NOT IN ('src0', 'src1')) v) f
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
