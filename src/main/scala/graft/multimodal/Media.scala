package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY.md §2 #30): image/audio/video
  * payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract run per-partition in batches.
  *
  * The actual codec call is STUBBED (`decodeStub`) — image/audio
  * libraries are not in this container — but everything Spark-side is
  * real and tested: the schema, the binary column, the partition-wise
  * batch processing shape (the Scala analog of `mapInPandas`: one
  * iterator of rows per partition, library handles amortized across
  * the batch), and the deterministic metadata contract.
  */
object Media {

  /** Typed decoded-media record. */
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                       width: Int, height: Int, n_frames: Int, sample_rate: Int)

  /** Build a media table from the documents corpus: the text bytes
    * stand in for an encoded payload (deterministic, so specs and
    * rows-only verification are stable). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        // deterministic kind assignment: image/audio/video round-robin
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder — stands in for an image/audio codec. Deterministic
    * pseudo-metadata derived from the payload bytes; replace the body
    * with the real library call (e.g. javax.imageio / ffmpeg binding)
    * when available. Runs once per row inside a per-partition batch,
    * where a real codec would amortize its init across the batch. */
  private def decodeStub(id: Long, kind: String, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    val b0 = if (n > 0) payload(0) & 0xff else 0
    val b1 = if (n > 1) payload(1) & 0xff else 0
    kind match {
      case "image" => MediaMeta(id, kind, n, 16 + b0 % 4080, 16 + b1 % 2160, 1, 0)
      case "audio" => MediaMeta(id, kind, n, 0, 0, 0, Seq(8000, 16000, 44100, 48000)(b0 % 4))
      case _       => MediaMeta(id, kind, n, 16 + b0 % 1920, 16 + b1 % 1080, 1 + n % 300, 0)
    }
  }

  /** Partition-wise batch decode with an optional pass-through column:
    * binary in, (typed metadata, extra) out. `mapPartitions` (not a
    * per-row UDF) so a real decoder initializes once per partition —
    * the ONE decode loop both public entry points share. */
  private def decodeWith(media: DataFrame, extra: org.apache.spark.sql.Column): Dataset[(MediaMeta, String)] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"), extra.as("extra"))
      .as[(Long, String, Array[Byte], String)]
      .mapPartitions { rows =>
        // real codec: init decoder context here, once per partition
        rows.map { case (id, kind, payload, x) => (decodeStub(id, kind, payload), x) }
      }
  }

  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeWith(media, lit("")).map(_._1)
  }

  /** Metadata extraction query (rows-only oracle): decoded metadata of
    * every media object plus a payload content hash for dedup — sha
    * computed in the SAME pass as the decode (one corpus scan, no
    * join; the payload is never read twice). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    decodeWith(mediaTable(spark, dir), sha2(col("payload"), 256))
      .select(col("_1.*"), col("_2").as("payload_sha"))
      .orderBy("media_id")

  /** Frame-sampling plumbing for video payloads: explode a
    * deterministic every-Nth-frame index list — the downstream shape
    * of a real frame extractor. */
  def sampleFrames(meta: DataFrame, everyN: Int = 30): DataFrame =
    meta.filter(col("kind") === "video" && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))).as("frame_idx"))

  /** Registered frame-sample query: decode → sample in one pipeline
    * (rows-only oracle — one row per sampled frame per video). */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(decodeMeta(mediaTable(spark, dir)).toDF())
      .orderBy("media_id", "frame_idx")

  /** Resized-image record: target box + the re-encoded payload. */
  case class ResizedImage(media_id: Long, src_width: Int, src_height: Int,
                          width: Int, height: Int, payload: Array[Byte])

  /** Image resize plumbing: fit each image into a `maxSide` box
    * preserving aspect ratio, re-encoding per partition (the stub
    * truncates the payload proportionally to the pixel reduction — a
    * real implementation swaps in the codec at the marked line). The
    * Spark-side shape is the production one: binary in / binary out,
    * one decoder+encoder context per partition, metadata computed with
    * the pixels in hand. */
  def resizeImages(media: DataFrame, maxSide: Int = 256): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real codec: init decode+encode contexts here, once per partition
        rows.map { case (id, kind, payload) =>
          val m = decodeStub(id, kind, payload)
          val scale = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
          val (w, h) = (math.max(1, (m.width * scale).round.toInt),
                        math.max(1, (m.height * scale).round.toInt))
          // STUB re-encode: proportional byte truncation stands in for
          // the real encoder call
          val outBytes = java.util.Arrays.copyOf(payload,
            math.max(1, (payload.length * scale * scale).round.toInt))
          ResizedImage(id, m.width, m.height, w, h, outBytes)
        }
      }
  }

  /** Registered resize query (rows-only): per-image target geometry +
    * payload size — scalar columns only for the driver dump. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame =
    resizeImages(mediaTable(spark, dir)).toDF()
      .select(col("media_id"), col("src_width"), col("src_height"),
        col("width"), col("height"), length(col("payload")).as("n_bytes"))
      .orderBy("media_id")
}
