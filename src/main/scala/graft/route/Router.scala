package graft.route

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._

import graft.model.Schemas.Message
import graft.util.PyJson

/** Router stage: fan parsed turns out to per-role / per-tool sinks and
  * to per-thread JSONL files (the reference's
  * `<outdir>/<provider>/thread-<cid>/parsed.jsonl`, parser.py:280-324).
  *
  * Scale design:
  *  - The role/tool fan-out is ONE partitioned write
  *    (`partitionBy(role, tool)`) — Spark's dynamic partition insert
  *    routes rows to sink directories without per-sink jobs or extra
  *    shuffles. A pre-write `repartition(role, tool, salt)` spreads hot
  *    sinks (role=assistant is ~40% of rows) across tasks; the salt is
  *    on message_id so ordering inside a file is irrelevant (readers
  *    re-sort by the window key anyway).
  *  - Partition pruning: downstream per-sink queries
  *    (`WHERE role='tool' AND tool='python'`) scan only their directory.
  */
object Router {

  /** Single partitioned parquet write fanning out all (role, tool)
    * sinks. Returns the sink root. */
  /** saltBuckets > 0: pre-shuffle on (role, tool, salt) so each sink's
    * files come from a bounded task set (file-count control on a 1000-
    * executor cluster: tasks × sinks files otherwise). saltBuckets = 0:
    * no exchange — every scan task writes its slice of each sink
    * directly (dynamic partition insert sorts within task); right when
    * upstream parallelism is already the write parallelism you want.
    */
  def writeRoutedSinks(
      msgs: DataFrame,
      outDir: String,
      saltBuckets: Int = 8): String = {
    val sinkRoot = s"$outDir/routed"
    val withSink =
      msgs.withColumn("tool_sink", coalesce(col("tool"), lit("none")))
    val distributed =
      if (saltBuckets <= 0) withSink
      else withSink.repartition(
        col("role"), col("tool_sink"),
        pmod(xxhash64(col("message_id")), lit(saltBuckets)))
    distributed
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("role", "tool_sink")
      .parquet(sinkRoot)
    sinkRoot
  }

  /** Render one message as the reference's exact JSONL byte format
    * (Python json.dumps ensure_ascii=True, field order of
    * parser.py:316-321 — note the reference line has NO tool field).
    */
  def messageJsonLine(m: Message): String = PyJson.obj(
    "record_type" -> PyJson.str("message"),
    "provider_id" -> PyJson.str(m.provider_id),
    "conversation_id" -> PyJson.str(m.conversation_id),
    "message_id" -> PyJson.str(m.message_id),
    "parent_id" -> m.parent_id.map(PyJson.str).getOrElse("null"),
    "role" -> PyJson.str(m.role),
    "ts" -> m.ts.toString,
    "content" -> PyJson.obj(
      "content_type" -> PyJson.str(m.content_type),
      "parts" -> PyJson.arr(m.parts)),
    "text" -> PyJson.str(m.text))

  def threadHeaderLine(provider: String, cid: String, count: Int): String =
    PyJson.obj(
      "record_type" -> PyJson.str("thread"),
      "provider_id" -> PyJson.str(provider),
      "conversation_id" -> PyJson.str(cid),
      "message_count" -> count.toString)

  /** Per-thread JSONL content: header line + messages sorted by
    * (ts, message_id), LF endings — byte-equal to the reference's
    * parsed.jsonl. Returned as (conversation_id, content) so callers
    * pick the sink (files, table, test assert).
    */
  def threadJsonl(msgs: Dataset[Message]): Dataset[(String, String)] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    msgs.groupByKey(_.conversation_id).mapGroups { (cid, it) =>
      val sorted = it.toVector.sortBy(m => (m.ts, m.message_id))
      val sb = new StringBuilder
      val provider = sorted.headOption.map(_.provider_id).getOrElse("openai")
      sb.append(threadHeaderLine(provider, cid, sorted.size)).append('\n')
      sorted.foreach(m => sb.append(messageJsonLine(m)).append('\n'))
      (cid, sb.toString)
    }
  }

  /** Write per-thread parsed.jsonl files in the reference layout under
    * `outDir/<provider>/thread-<cid>/parsed.jsonl`, atomically
    * (tmp → move, like parser.py:286,324). Executor-side file IO against
    * a shared filesystem; one file per conversation, written from
    * whichever task owns the group — no driver collect.
    */
  def writeThreadJsonl(
      msgs: Dataset[Message],
      outDir: String,
      provider: String = "openai"): Unit = {
    threadJsonl(msgs).foreachPartition {
      (it: Iterator[(String, String)]) =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        it.foreach { case (cid, content) =>
          val dir = java.nio.file.Paths.get(outDir, provider, s"thread-$cid")
          java.nio.file.Files.createDirectories(dir)
          val tmp = dir.resolve("parsed.tmp")
          val dst = dir.resolve("parsed.jsonl")
          java.nio.file.Files.write(tmp, content.getBytes(utf8))
          java.nio.file.Files.move(tmp, dst,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
    }
  }
}
