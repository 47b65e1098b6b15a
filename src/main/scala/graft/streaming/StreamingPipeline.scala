package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming form of the pipeline (the reference is
  * batch-only — docs/requirements.md:196-203 scopes streaming out; the
  * north rule's telemetry framing makes it a natural extension).
  *
  * Same transformations as the batch path: the transcript/event stream
  * is read incrementally, watermarked on event time, aggregated in
  * tumbling windows, and per-conversation session state is tracked
  * with mapGroupsWithState. File-source streaming reads mean the SAME
  * code runs over a directory that keeps receiving parquet drops —
  * the local stand-in for a Kafka/queue source at scale.
  */
object StreamingPipeline {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Incremental file-source read of an events directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .parquet(dir)

  /** Tumbling 1-hour windowed counts with a 2-hour watermark — the
    * streaming twin of PipelineQueries.eventWindows. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))

  final case class SessionUpdate(
      user_id: Long,
      n_events: Long,
      first_ts_ms: Long,
      last_ts_ms: Long,
      closed: Boolean)

  private final case class SessionState(
      n: Long, firstMs: Long, lastMs: Long)

  /** Per-user session tracking with explicit state:
    * mapGroupsWithState with processing-time timeout — emits a running
    * session summary per trigger, closing idle sessions. NOTE: closure
    * depends on wall-clock trigger cadence, so output is NOT
    * reproducible across runs/replay — this form is for live
    * "currently idle" monitoring; deterministic sessionization is
    * [[sessionizeEventTime]]. */
  def sessionize(
      events: Dataset[(Long, Long)] /* (user_id, ts_ms) */,
      idleTimeoutMs: Long = 30 * 60 * 1000L): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout)(
        (userId: Long, rows: Iterator[(Long, Long)],
         state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionUpdate(userId, s.n, s.firstMs, s.lastMs, closed = true)
          } else {
            val ts = rows.map(_._2).toVector
            val prev = state.getOption.getOrElse(
              SessionState(0L, Long.MaxValue, Long.MinValue))
            val next = SessionState(
              prev.n + ts.size,
              math.min(prev.firstMs, if (ts.isEmpty) prev.firstMs else ts.min),
              math.max(prev.lastMs, if (ts.isEmpty) prev.lastMs else ts.max))
            state.update(next)
            state.setTimeoutDuration(idleTimeoutMs)
            SessionUpdate(userId, next.n, next.firstMs, next.lastMs,
              closed = false)
          }
        })
  }

  // State and output deliberately use scala-library types only
  // (tuples of Long / Seq[Long], no user case classes): the streaming
  // state-store serializer is janino-compiled on the micro-batch
  // execution thread, where a user class loaded through a layered
  // classloader (sbt test) makes method resolution fail with "no
  // applicable method for zero actual parameters" — candidate
  // signatures reference a differently-loaded Seq. Tuple accessors
  // return java.lang.Object, so no cross-loader signature appears in
  // generated code. Batch-driven stateful ops (sessionize above) never
  // hit this path; streaming ones must.
  private type OpenSessions = (Seq[Long], Seq[Long], Seq[Long])

  /** EVENT-TIME sessionization: gap-based sessions closed by the
    * watermark, not the wall clock — [[sessionize]]'s processing-time
    * timeouts make session closure depend on trigger cadence (results
    * differ run-to-run and under replay); here every decision is a
    * function of event times alone, so replaying the same events
    * through ANY micro-batch split yields the same closed sessions
    * (asserted streamed == batch in OpsSpec, like intervalJoin).
    *
    * Out-of-order safety: an open session is never closed inline by a
    * later-arriving event — state holds the set of open sessions per
    * user (merged on insert whenever two sit within gapMs), and a
    * session is emitted only once the WATERMARK passes its last event
    * + gap (EventTimeTimeout), i.e. once the engine guarantees no
    * older event can still arrive. State is bounded by the watermark:
    * open sessions older than last+gap < watermark always drain on the
    * next timeout.
    *
    * Input needs (user_id: long, ts: timestamp); gap semantics match
    * [[graft.queries.PipelineQueries]] q15's batch sessionization:
    * a gap of EXACTLY gapMs continues the session, > gapMs starts a
    * new one. Output columns: (user_id, n_events, first_ts_ms,
    * last_ts_ms), one row per CLOSED session.
    */
  def sessionizeEventTime(
      events: DataFrame,
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "2 hours"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[OpenSessions]) => {
          val wm = state.getCurrentWatermarkMs()
          val incoming = rows.map(r => SessionState(1L, r._2, r._2)).toVector
          val existing = state.getOption.map { case (ns, firsts, lasts) =>
            ns.indices
              .map(i => SessionState(ns(i), firsts(i), lasts(i))).toVector
          }.getOrElse(Vector.empty)
          // merge scan over first_ts-sorted sessions: adjacent sessions
          // within gapMs collapse (counts add, spans union)
          val merged = (existing ++ incoming).sortBy(s => (s.firstMs, s.lastMs))
            .foldLeft(Vector.empty[SessionState]) { (acc, s) =>
              acc.lastOption match {
                case Some(p) if s.firstMs <= p.lastMs + gapMs =>
                  acc.init :+ SessionState(p.n + s.n, p.firstMs,
                    math.max(p.lastMs, s.lastMs))
                case _ => acc :+ s
              }
            }
          val (closed, open) = merged.partition(_.lastMs + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(
              (open.map(_.n), open.map(_.firstMs), open.map(_.lastMs)))
            // earliest possible close; must sit strictly past the
            // current watermark or setTimeoutTimestamp throws
            state.setTimeoutTimestamp(
              math.max(open.map(_.lastMs).min + gapMs, wm + 1))
          }
          closed.iterator.map(s => (userId, s.n, s.firstMs, s.lastMs))
        })
      .toDF("user_id", "n_events", "first_ts_ms", "last_ts_ms")
  }

  /** Streaming form of the parse→route pipeline: incremental text-file
    * source over a raw-export JSONL directory (the local stand-in for
    * a Kafka/queue source) → fast-path single-pass parse (zero-shuffle,
    * streaming-safe: no window, no agg) → partitioned parquet file sink
    * with its own transaction log, checkpointed.
    *
    * Resumability comes from the SINK + checkpoint, not foreachBatch:
    * the parquet file sink's _spark_metadata commit log gives
    * exactly-once file visibility across restarts — the streaming twin
    * of the batch path's snapshot-pointer commits. A restarted query
    * with the same checkpoint processes only unseen input files.
    */
  def parseAndRouteStream(
      spark: SparkSession,
      rawDir: String,
      sinkDir: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val lines = spark.readStream.text(rawDir)
      .withColumnRenamed("value", "line")
      // same filename-stem conversation-id fallback as the batch fast
      // path — without it a record lacking conversation_id would route
      // to "unknown" here but to the stem in batch
      .withColumn("_file", input_file_name())
    val turns = graft.parse.FastTranscriptParser.parseLines(lines)
    turns
      .withColumn("tool_sink", coalesce(col("tool"), lit("none")))
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("role", "tool_sink")
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Streaming exact dedup: drop documents whose canonical-form
    * fingerprint (graft.ops.TextAnalysis.fingerprint — lowercase,
    * whitespace-collapsed md5) was already seen within the watermark —
    * the streaming twin of the batch exact-dedup operator for
    * continuously-arriving training data.
    *
    * dropDuplicatesWithinWatermark (not dropDuplicates) bounds the
    * dedup state: plain streaming dropDuplicates keeps EVERY key
    * forever (unbounded state at corpus scale); the watermarked form
    * evicts keys once the event-time watermark passes, trading
    * cross-window duplicate detection for O(watermark-width) state —
    * the standard streaming-dedup contract. Input needs (doc_id, text,
    * ts: timestamp).
    */
  def streamingDedup(
      docs: DataFrame, watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("fp", graft.ops.TextAnalysis.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-stream INTERVAL join (attribution): pair each right-side
    * event with same-key left-side events that happened within maxLag
    * BEFORE it (l.ts ∈ [r.ts - maxLag, r.ts]) — e.g. purchases joined
    * to the clicks that preceded them within an hour.
    *
    * Both sides are watermarked and the join condition bounds event
    * time in BOTH directions, which is what lets Structured Streaming
    * evict join state: a left row is dropped from state once the
    * right-side watermark passes l.ts + maxLag, so state is
    * O(rate × (maxLag + watermark)) — without the time bound a
    * stream-stream inner join must buffer both streams forever.
    * Output columns: key, l_id, r_id, lag_ms. The streamed result
    * equals the equivalent batch range join (asserted in OpsSpec).
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      maxLag: String = "1 hour", watermark: String = "2 hours")
      : DataFrame = {
    val l = left
      .select(col(key).as("l_key"), col("id").as("l_id"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right
      .select(col(key).as("r_key"), col("id").as("r_id"),
        col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    l.join(r,
        col("l_key") === col("r_key") &&
          col("l_ts") <= col("r_ts") &&
          col("l_ts") >= col("r_ts") - expr(s"interval $maxLag"))
      .select(col("l_key").as(key), col("l_id"), col("r_id"),
        (unix_millis(col("r_ts")) - unix_millis(col("l_ts")))
          .as("lag_ms"))
  }

  /** Run a streaming query to completion over the (static) input dir
    * using the memory sink — local smoke harness for the streaming
    * plan; on a cluster the sink would be the routed Iceberg tables. */
  def runWindowedCountsOnce(
      spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = windowedCounts(readEvents(spark, dir))
      .writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
