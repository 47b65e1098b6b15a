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

  /** Pre-write distribution for the routed fan-out.
    *
    * saltBuckets > 0 bounds the task set feeding each sink (file-count
    * control on a 1000-executor cluster: tasks × sinks files
    * otherwise); saltBuckets = 0 skips the exchange entirely.
    *
    * hotThreshold > 0 switches to ADAPTIVE salting (SURVEY §4.2.3):
    * conversations above the threshold are salted by message_id (a
    * mega-conversation then spreads over saltBuckets tasks instead of
    * serializing one), while every normal conversation keeps
    * whole-conversation locality (salt = hash(conv)), so its rows land
    * in one task's files and range scans stay clustered. The hot set is
    * broadcast — by definition it is small (count ≥ threshold caps its
    * size at totalRows / threshold).
    *
    * Where the hot set comes from matters for scan count: pass
    * `hotSet` (a conversation_id DataFrame from cheap prior knowledge —
    * the previous run's thread index on resume) and detection costs
    * nothing; without it, detection is a `groupBy(conv).count` OVER THE
    * INPUT, i.e. one extra counting scan of the un-materialized parse
    * plan (first runs only, column-pruned to conversation_id — see the
    * parseMode comment).
    */
  def saltedForRouting(
      msgs: DataFrame,
      saltBuckets: Int,
      hotThreshold: Long = 0L,
      hotSet: Option[DataFrame] = None): DataFrame = {
    val withSink =
      msgs.withColumn("tool_sink", coalesce(col("tool"), lit("none")))
    if (saltBuckets <= 0) withSink
    else if (hotThreshold <= 0L)
      withSink.withColumn("__salt",
        pmod(xxhash64(col("message_id")), lit(saltBuckets)))
    else {
      val hot = hotSet
        .map(_.select(col("conversation_id"), lit(true).as("__hot")))
        .getOrElse(msgs.groupBy(col("conversation_id"))
          .agg(count(lit(1)).as("__cnt"))
          .filter(col("__cnt") >= hotThreshold)
          .select(col("conversation_id"), lit(true).as("__hot")))
      withSink.join(broadcast(hot), Seq("conversation_id"), "left")
        .withColumn("__salt",
          when(col("__hot"),
            pmod(xxhash64(col("message_id")), lit(saltBuckets)))
            .otherwise(pmod(xxhash64(col("conversation_id")),
              lit(saltBuckets))))
        .drop("__hot")
    }
  }

  /** Single partitioned parquet write fanning out all (role, tool)
    * sinks, committed as a [[graft.table.SnapshotParquetTable]]
    * snapshot (atomic pointer swap — a crashed run can never truncate
    * the previous routed tree, which SaveMode.Overwrite would).
    * Returns the committed snapshot's DATA path (read it directly, or
    * read the table root via SnapshotParquetTable).
    */
  def writeRoutedSinks(
      msgs: DataFrame,
      outDir: String,
      saltBuckets: Int = 8,
      hotThreshold: Long = 0L,
      hotSet: Option[DataFrame] = None): String = {
    val salted = saltedForRouting(msgs, saltBuckets, hotThreshold, hotSet)
    val distributed =
      if (salted.columns.contains("__salt"))
        salted.repartition(col("role"), col("tool_sink"), col("__salt"))
          .drop("__salt")
      else salted
    new graft.table.SnapshotParquetTable(s"$outDir/routed")
      .commit(distributed, Seq("role", "tool_sink")).dataPath
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
    * (tmp → rename, like parser.py:286,324). Executor-side IO through
    * the Hadoop FileSystem of outDir's scheme (file:/hdfs:/s3a: all
    * work — java.nio would silently break off the local disk); one
    * file per conversation, written from whichever task owns the
    * group — no driver collect.
    */
  def writeThreadJsonl(
      msgs: Dataset[Message],
      outDir: String,
      provider: String = "openai"): Unit = {
    val scheme = Option(new org.apache.hadoop.fs.Path(outDir)
      .toUri.getScheme)
    val local = scheme.isEmpty || scheme.contains("file")
    val confOverlay =
      if (local) Map.empty[String, String]
      else graft.util.HadoopConfs.capture(
        msgs.sparkSession.sessionState.newHadoopConf())
    threadJsonl(msgs).foreachPartition {
      (it: Iterator[(String, String)]) =>
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        if (local) {
          // java.nio fast path: Hadoop's LocalFileSystem measured ~45 ms
          // per small file (checksum wrapper + permission plumbing) vs
          // <1 ms here — at one file per conversation that difference is
          // the whole write stage
          val baseDir = outDir.stripPrefix("file:")
          it.foreach { case (cid, content) =>
            val dir = java.nio.file.Paths.get(baseDir, provider,
              s"thread-$cid")
            java.nio.file.Files.createDirectories(dir)
            val tmp = dir.resolve("parsed.tmp")
            java.nio.file.Files.write(tmp, content.getBytes(utf8))
            java.nio.file.Files.move(tmp, dir.resolve("parsed.jsonl"),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
        } else {
          val conf = graft.util.HadoopConfs.restore(confOverlay)
          val base = new org.apache.hadoop.fs.Path(s"$outDir/$provider")
          val fs = base.getFileSystem(conf)
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            base.toUri, conf)
          it.foreach { case (cid, content) =>
            val dir = new org.apache.hadoop.fs.Path(base, s"thread-$cid")
            fs.mkdirs(dir)
            val tmp = new org.apache.hadoop.fs.Path(dir, "parsed.tmp")
            val out = fs.create(tmp, true)
            try out.write(content.getBytes(utf8)) finally out.close()
            fc.rename(tmp,
              new org.apache.hadoop.fs.Path(dir, "parsed.jsonl"),
              org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          }
        }
    }
  }
}
