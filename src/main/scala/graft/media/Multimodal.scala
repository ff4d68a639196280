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
    })
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
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
