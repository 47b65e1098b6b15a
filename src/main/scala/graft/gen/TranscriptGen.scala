package graft.gen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.PyJson

/** Deterministic transcript synthesis (no wall clock, no RNG state —
  * everything is a pure function of the input ids, so any two runs and
  * any two engines agree).
  *
  * Two generators:
  *  1. [[fromEvents]] — derives the north-rule transcript table
  *     (conv_id, turn_idx, role, text, tool, ts) from the driver-provided
  *     `events` parquet with arithmetic only (%, ||, case) so the exact
  *     same derivation is expressible in DuckDB for the oracle compare.
  *  2. [[synthesize]] — free-standing corpus from spark.range for unit /
  *     property / skew tests, including a mega-conversation, null-ts
  *     turns (must be dropped), duplicate-ts pairs (tie-break), code
  *     fences and multilingual text (exporter fodder).
  *
  * [[renderRawJsonl]] renders synthesized turns back into the raw
  * ChatGPT-export shape (reference: tests/fixtures/openai_sample*.json)
  * so the parse stage can be round-trip tested: synthesize → render →
  * parse → compare.
  */
object TranscriptGen {

  val toolVocab: Seq[String] = Seq("file_search", "browser", "python", "dalle")

  /** Deterministic derivation of transcripts from the events table.
    * Mirrored 1:1 by [[fromEventsOracleSql]] in DuckDB dialect.
    * Injects a null-ts stripe (event_id % 97 == 13) which is then
    * dropped, exercising the reference's count-critical A10 rule.
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val m10 = pmod(col("event_id"), lit(10))
    val role = when(m10 === 0, "system")
      .when(m10 === 9, "tool")
      .when(pmod(col("event_id"), lit(2)) === 1, "user")
      .otherwise("assistant")
    val m4 = pmod(col("event_id"), lit(4))
    val tool = when(m10 === 9,
      when(m4 === 0, toolVocab(0)).when(m4 === 1, toolVocab(1))
        .when(m4 === 2, toolVocab(2)).otherwise(toolVocab(3)))
    ev
      .filter(pmod(col("event_id"), lit(97)) =!= 13) // null-ts drop stripe
      .select(
        concat(lit("conv-"), lpad(col("user_id").cast(StringType), 4, "0"))
          .as("conv_id"),
        role.as("role"),
        tool.as("tool"),
        concat(col("event_type"), lit(" "), col("props")).as("text"),
        // parquet stores timestamp[us] without tz → Spark reads NTZ;
        // session tz is UTC so this cast is the identity epoch mapping
        col("ts").cast(TimestampType).as("ts"),
        col("event_id"))
  }

  /** DuckDB SQL computing exactly [[fromEvents]] (for oracle queries to
    * build on via WITH t AS (...)). */
  val fromEventsOracleSql: String =
    """SELECT 'conv-' || lpad(CAST(user_id AS VARCHAR), 4, '0') AS conv_id,
      |  CASE WHEN event_id % 10 = 0 THEN 'system'
      |       WHEN event_id % 10 = 9 THEN 'tool'
      |       WHEN event_id % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
      |  CASE WHEN event_id % 10 = 9 THEN
      |    CASE event_id % 4 WHEN 0 THEN 'file_search' WHEN 1 THEN 'browser'
      |         WHEN 2 THEN 'python' ELSE 'dalle' END END AS tool,
      |  event_type || ' ' || props AS text, ts, event_id
      |FROM events WHERE event_id % 97 <> 13""".stripMargin

  // -------------------------------------------------------------------
  // Free-standing synthesizer
  // -------------------------------------------------------------------

  private val textPool: Seq[String] = Seq(
    "Hello, can you help me with a Spark job?",
    "Sure — what does the stage boundary look like?",
    "おはようございます。今日の予定を教えて。",
    "```scala\nval df = spark.read.parquet(path)\ndf.count()\n```",
    "Here is a list:\n- alpha\n- beta\n\n\n- gamma",
    "Searching the workspace for the relevant files…",
    "Result: 42 rows matched. ✨",
    "Let me re-run that with AQE enabled.",
    "日本語と English が混ざった turn です 🚀",
    "The quick brown fox jumps over the lazy dog.")

  /** Synthesize a transcript corpus.
    *
    * Columns: conv_id, message_id, role, tool, text, ts_ms (nullable
    * long). conv 0 is a mega-conversation (megaFactor × baseTurns) for
    * skew tests; every 13th turn of every 7th conv has null ts; turn
    * pairs (idx, idx+1) with idx % 11 == 3 share a timestamp to exercise
    * the message_id tie-break.
    */
  def synthesize(
      spark: SparkSession,
      nConvs: Int,
      baseTurns: Int = 8,
      megaFactor: Int = 50,
      seed: Long = 42L): DataFrame = {
    val baseTs = 1700000000000L // fixed epoch-ms origin, no wall clock
    val convs = spark.range(nConvs.toLong).select(
      col("id").as("conv_n"),
      // lpad TRUNCATES beyond the pad width — width 9 keeps ids unique
      // up to 10^9 conversations
      concat(lit("conv-"), lpad(col("id").cast(StringType), 9, "0"))
        .as("conv_id"),
      when(col("id") === 0, lit(baseTurns * megaFactor))
        .otherwise(lit(baseTurns) +
          pmod(xxhash64(col("id"), lit(seed)), lit(baseTurns)))
        .as("n_turns"))
    val turns = convs
      .select(col("conv_n"), col("conv_id"),
        explode(sequence(lit(0), col("n_turns") - 1)).as("idx"))
    val h = xxhash64(col("conv_n"), col("idx"), lit(seed))
    val m10 = pmod(col("idx"), lit(10))
    val role = when(col("idx") === 0, "system")
      .when(m10.isin(1, 3, 5, 7), "user")
      .when(m10.isin(9), "tool")
      .otherwise("assistant")
    val toolCol = when(role === "tool",
      element_at(
        array(toolVocab.map(lit): _*),
        (pmod(h, lit(toolVocab.size)) + 1).cast(IntegerType)))
    val textCol = element_at(
      array(textPool.map(lit): _*),
      (pmod(h, lit(textPool.size)) + 1).cast(IntegerType))
    // duplicate-ts pairs: idx%11==4 reuses the previous turn's ts
    val effIdx = when(pmod(col("idx"), lit(11)) === 4, col("idx") - 1)
      .otherwise(col("idx"))
    val tsMs = when(
      pmod(col("idx"), lit(13)) === 7 && pmod(col("conv_n"), lit(7)) === 3,
      lit(null).cast(LongType))
      .otherwise(lit(baseTs) + col("conv_n") * 86400000L + effIdx * 31007L)
    turns.select(
      col("conv_id"),
      concat(lit("msg-"), col("conv_id"), lit("-"),
        lpad(col("idx").cast(StringType), 6, "0")).as("message_id"),
      role.as("role"),
      toolCol.as("tool"),
      textCol.as("text"),
      tsMs.as("ts_ms"))
  }

  // -------------------------------------------------------------------
  // Raw ChatGPT-export renderer (test input for the parse stage)
  // -------------------------------------------------------------------

  /** Render synthesized turns as raw export JSONL — one conversation
    * object per line, mapping-node DAG with a structural root (message:
    * null, must be skipped by the parser) and a linear parent chain.
    * Node create_time is epoch-SECONDS double = ts_ms / 1000.0, exactly
    * the float the reference's adapter multiplies back by 1000.
    */
  def renderRawJsonl(turns: DataFrame): Dataset[String] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .select("conv_id", "message_id", "role", "tool", "text", "ts_ms")
      .as[(String, String, String, Option[String], String, Option[Long])]
      .groupByKey(_._1)
      .mapGroups { (convId, it) =>
        val msgs = it.toVector.sortBy(_._2) // message_id is idx-ordered
        val sb = new StringBuilder
        sb.append("{")
        sb.append(PyJson.str("conversation_id")).append(": ")
          .append(PyJson.str(convId)).append(", ")
        sb.append(PyJson.str("title")).append(": ")
          .append(PyJson.str(s"synthetic $convId")).append(", ")
        sb.append(PyJson.str("mapping")).append(": {")
        val rootId = s"root-$convId"
        sb.append(PyJson.str(rootId)).append(": ")
          .append(PyJson.obj(
            "id" -> PyJson.str(rootId),
            "parent" -> "null",
            "children" -> (if (msgs.nonEmpty) PyJson.arr(Seq(msgs.head._2))
                           else "[]"),
            "message" -> "null"))
        var parent = rootId
        msgs.foreach { case (_, mid, role, tool, text, tsMs) =>
          sb.append(", ")
          val ct = tsMs.map(ms => (ms / 1000.0).toString).getOrElse("null")
          val author = PyJson.obj(
            "role" -> PyJson.str(role),
            "name" -> tool.map(PyJson.str).getOrElse("null"))
          val content = PyJson.obj(
            "content_type" -> PyJson.str("text"),
            "parts" -> PyJson.arr(Seq(text)))
          val message = PyJson.obj(
            "id" -> PyJson.str(mid),
            "author" -> author,
            "create_time" -> ct,
            "content" -> content)
          sb.append(PyJson.str(mid)).append(": ").append(PyJson.obj(
            "id" -> PyJson.str(mid),
            "parent" -> PyJson.str(parent),
            "children" -> "[]",
            "message" -> message))
          parent = mid
        }
        sb.append("}}")
        sb.toString
      }
  }
}
