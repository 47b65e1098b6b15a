package graft.lineage

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.PyJson

/** Per-partition lineage manifests + checkpoint/resume.
  *
  * Re-realizes the reference's manifest (reference: parser.py:329-358 —
  * schema_version 1.3, per-thread {conversation_id, path, count, ts_min,
  * ts_max}) and its differential skip cache (parser.py:182-195
  * should_skip_thread), fixed: the reference forgets to re-index skipped
  * threads (parser.py:271-274), degrading the cache run-over-run; we
  * carry unchanged entries forward.
  *
  * Additionally records per-PARTITION stats (north rule: "per-partition
  * lineage manifests (partition id, row counts, parse-failure counters)
  * committed atomically") so a resumed job can verify which input splits
  * completed.
  */
object Lineage {

  final case class PartitionLineage(
      partition_id: Int,
      row_count: Long,
      ts_min: Option[Long],
      ts_max: Option[Long])

  final case class ThreadEntry(
      conversation_id: String,
      count: Long,
      ts_min: Long,
      ts_max: Long)

  /** Capture per-partition stats without an extra shuffle: one pass
    * mapPartitions piggybacked on the already-partitioned data. */
  def capturePartitions(
      msgs: DataFrame,
      tsCol: String = "ts"): Dataset[PartitionLineage] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    msgs.select(col(tsCol).cast("long")).as[Option[Long]].mapPartitions {
      it =>
        val pid = TaskContext.getPartitionId()
        var n = 0L
        var mn = Long.MaxValue
        var mx = Long.MinValue
        it.foreach { ts =>
          n += 1
          ts.foreach { t =>
            if (t < mn) mn = t
            if (t > mx) mx = t
          }
        }
        Iterator.single(PartitionLineage(
          pid, n,
          if (mn == Long.MaxValue) None else Some(mn),
          if (mx == Long.MinValue) None else Some(mx)))
    }
  }

  /** Thread index entries from the aggregate stage
    * (Aggregates.threadStats output). */
  def threadEntries(threadStats: DataFrame): Dataset[ThreadEntry] = {
    val spark = threadStats.sparkSession
    import spark.implicits._
    threadStats
      .select(
        col("conversation_id"),
        col("count").cast("long"),
        col("ts_min").cast("long"),
        col("ts_max").cast("long"))
      .as[ThreadEntry]
  }

  /** Atomic manifest commit: write tmp, fsync-free rename — same
    * protocol as the reference (tmp → replace) and the same shape as an
    * Iceberg snapshot's metadata pointer swap. */
  def writeManifest(
      path: String,
      provider: String,
      threads: Seq[ThreadEntry],
      partitions: Seq[PartitionLineage] = Nil,
      schemaVersion: String = "1.3"): Unit = {
    val threadJson = threads.sortBy(_.conversation_id).map { t =>
      PyJson.obj(
        "conversation_id" -> PyJson.str(t.conversation_id),
        "path" -> PyJson.str(s"thread-${t.conversation_id}/parsed.jsonl"),
        "count" -> t.count.toString,
        "ts_min" -> t.ts_min.toString,
        "ts_max" -> t.ts_max.toString)
    }.mkString("[", ", ", "]")
    val partJson = partitions.sortBy(_.partition_id).map { p =>
      PyJson.obj(
        "partition_id" -> p.partition_id.toString,
        "row_count" -> p.row_count.toString,
        "ts_min" -> p.ts_min.map(_.toString).getOrElse("null"),
        "ts_max" -> p.ts_max.map(_.toString).getOrElse("null"))
    }.mkString("[", ", ", "]")
    val json = PyJson.obj(
      "schema_version" -> PyJson.str(schemaVersion),
      "provider" -> PyJson.str(provider),
      "index" -> PyJson.obj("threads" -> threadJson),
      "partitions" -> partJson)
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Load a previous manifest's thread index as a DataFrame (broadcast
    * side of the resume anti-join). */
  def readManifestThreads(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("index", StructType(Seq(
        StructField("threads", ArrayType(StructType(Seq(
          StructField("conversation_id", StringType),
          StructField("count", LongType),
          StructField("ts_min", LongType),
          StructField("ts_max", LongType))))))))))
    spark.read.schema(schema).option("multiLine", value = true).json(path)
      .select(explode(col("index.threads")).as("t"))
      .select(col("t.conversation_id"), col("t.count"),
        col("t.ts_min"), col("t.ts_max"))
  }

  /** Resume filter: conversations whose (conversation_id, count) already
    * match the previous manifest are unchanged → skip re-processing
    * (reference semantics parser.py:182-195). Left-anti broadcast join,
    * no full shuffle of the fact side.
    */
  def changedThreads(
      currentStats: DataFrame,
      previousManifest: DataFrame): DataFrame =
    currentStats.join(
      broadcast(previousManifest.select(
        col("conversation_id"), col("count"))),
      Seq("conversation_id", "count"), "left_anti")
}
