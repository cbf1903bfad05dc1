package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real — schema, partition-parallel batch
  * processing via `mapPartitions` over a typed Dataset, deterministic
  * output — while the media decode itself is a clearly-marked STUB
  * (`decodeStub`): the container has no image/audio codecs, so it derives
  * fake-but-deterministic dimensions from the payload. Swapping in a real
  * decoder (JavaCV, TwelveMonkeys, an FFI codec) changes ONLY that
  * function; the distributed plumbing, batching and schema stay.
  *
  * At 100 TB: binary payloads ride in Parquet with the metadata columns,
  * so metadata-only queries never deserialize payload bytes (column
  * pruning), and decode jobs scale with partitions.
  */
/** Typed metadata row produced by the decode pass. Top-level so Spark's
  * generated encoder code can access the constructor. */
case class MediaMeta(
    doc_id: Long, n_bytes: Long, sha256: String,
    width: Long, height: Long, n_frames: Long)

case class MediaIn(doc_id: Long, content: Array[Byte])

object Multimodal {

  /** STUB decoder — deterministic fake dimensions from payload length.
    * Replace with a real codec to productionize; signature stays. */
  def decodeStub(content: Array[Byte]): (Long, Long, Long) = {
    val n = content.length.toLong
    (n % 640 + 16, (n * 7) % 480 + 16, n % 30 + 1)
  }

  /** Attach a binary payload column (here: the UTF-8 text bytes stand in
    * for a media blob; a real pipeline reads binaryFile sources). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("content", col("text").cast("binary"))

  /** Batch decode: one decoder instantiation per partition (the expensive
    * part for real codecs), streaming through the rows. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(docs).select(col("doc_id"), col("content")).as[MediaIn]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("SHA-256") // per-partition setup
        it.map { m =>
          md.reset()
          val sha = md.digest(m.content).map(b => f"${b & 0xff}%02x").mkString
          val (w, h, f) = decodeStub(m.content)
          MediaMeta(m.doc_id, m.content.length.toLong, sha, w, h, f)
        }
      }
  }
}
