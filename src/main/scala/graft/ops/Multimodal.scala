package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side design is real and tested — schema, partitioning,
  * batched executor processing (the JVM analogue of `mapInPandas`:
  * partition iterators processed in fixed-size batches so a native
  * decoder can amortize per-batch setup). The actual codec is STUBBED
  * (this container has no image/audio libraries): [[Codec.Fake]] is a
  * deterministic stand-in; [[Codec.Real]] marks the integration point.
  *
  * Scale notes: media bytes dominate row size, so every stage here
  * projects metadata columns WITHOUT the blob when possible (column
  * pruning keeps the parquet scan narrow), and the blob-carrying
  * stages avoid shuffles entirely (narrow mapPartitions).
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      mime: String)

  final case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeature(
      media_id: Long,
      feature: Array[Float])

  /** Decoder contract — one call per BATCH of blobs (the mapInPandas
    * batch shape), so native implementations amortize setup. */
  trait Codec extends Serializable {
    def decodeMeta(batch: Seq[MediaRecord]): Seq[MediaMeta]
    def extractFeatures(batch: Seq[MediaRecord], dim: Int): Seq[MediaFeature]
  }

  object Codec {

    /** Deterministic fake decoder: metadata and features are pure
      * functions of the bytes (FNV over content), so tests are stable
      * and the pipeline shape is fully exercised. */
    object Fake extends Codec {
      private def fnv(bytes: Array[Byte]): Long = {
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < bytes.length) {
          h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
        }
        h
      }
      override def decodeMeta(batch: Seq[MediaRecord]): Seq[MediaMeta] =
        batch.map { r =>
          val h = fnv(r.content)
          MediaMeta(r.media_id, r.kind, r.content.length.toLong,
            width = 64 + (Math.floorMod(h, 16L) * 64L).toInt,
            height = 64 + (Math.floorMod(h >>> 8, 16L) * 64L).toInt,
            duration_ms =
              if (r.kind == "image") 0L else Math.floorMod(h >>> 16, 600000L))
        }
      override def extractFeatures(
          batch: Seq[MediaRecord], dim: Int): Seq[MediaFeature] =
        batch.map { r =>
          val h = fnv(r.content)
          val f = Array.tabulate(dim) { i =>
            // deterministic pseudo-feature in [-1, 1)
            val x = h * (i * 2654435761L + 1)
            (Math.floorMod(x, 2048L) - 1024L) / 1024.0f
          }
          MediaFeature(r.media_id, f)
        }
    }

    /** Integration point for a real decoder (libjpeg/ffmpeg et al. via
      * JNI or a sidecar). Not available in this container. */
    object Real extends Codec {
      override def decodeMeta(batch: Seq[MediaRecord]): Seq[MediaMeta] = ???
      override def extractFeatures(
          batch: Seq[MediaRecord], dim: Int): Seq[MediaFeature] = ???
    }
  }

  /** Deterministic media corpus derived from the documents table:
    * text bytes as the opaque blob (stands in for image bytes). */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        lit("application/octet-stream").as("mime"))
      .as[MediaRecord]
  }

  /** Batched decode: partition iterator → fixed-size batches → codec.
    * Narrow (no shuffle); batchSize bounds executor memory per task. */
  def decodeMeta(
      media: Dataset[MediaRecord],
      codec: Codec = Codec.Fake,
      batchSize: Int = 256): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => codec.decodeMeta(b.toSeq))
    }
  }

  def extractFeatures(
      media: Dataset[MediaRecord],
      dim: Int = 16,
      codec: Codec = Codec.Fake,
      batchSize: Int = 256): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => codec.extractFeatures(b.toSeq, dim))
    }
  }

  /** Frame sampling plan for video rows: every `everyMs` up to
    * `maxFrames` — pure column math on metadata (no blob access), so
    * it prunes to a metadata-only scan. */
  def frameSamplePlan(
      meta: Dataset[MediaMeta],
      everyMs: Long = 1000L,
      maxFrames: Int = 8): DataFrame =
    meta.toDF()
      .filter(col("kind") === "video" && col("duration_ms") > 0)
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L),
          least((col("duration_ms") / everyMs).cast("long"),
            lit(maxFrames.toLong - 1)))).as("frame_idx"))
      .withColumn("frame_ts_ms", col("frame_idx") * everyMs)
}
