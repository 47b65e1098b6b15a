package graft.parse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fast-path parse stage: raw export JSONL → ordered normalized turns
  * in ONE narrow codegen'd pass (graft.functions.ExtractConversation),
  * with NO shuffle — the per-conversation (ts, message_id) sort runs
  * inside the expression (a conversation is one input row), so
  * `turn_idx` falls out of posexplode instead of a window exchange.
  *
  * Semantics are identical to ChatGptParser.normalize +
  * TurnOrdering.withTurnIdx for JSONL containers (asserted by
  * FastPathSpec on fixtures and the synthesized corpus); the generic
  * Catalyst path stays for multiLine/array containers and as the
  * reference implementation.
  */
object FastTranscriptParser {

  /** Columns: Schemas.messageColumns + turn_idx. */
  def parse(
      spark: SparkSession,
      path: String,
      provider: String = "openai"): DataFrame =
    parseLines(
      spark.read.textFile(path).toDF("line")
        .withColumn("_file", input_file_name()),
      provider)

  /** Same over an in-memory line column (no file source); `_file` is
    * optional (conversation-id filename-stem fallback). */
  def parseLines(lines: DataFrame, provider: String = "openai"): DataFrame = {
    val withFile =
      if (lines.columns.contains("_file")) lines
      else lines.withColumn("_file", lit(null).cast("string"))
    val conv = withFile
      .select(col("_file"),
        graft.functions.extract_conversation(col("line")).as("c"))
      .filter(col("c").isNotNull)
    val stem = {
      val base = regexp_extract(col("_file"), "([^/]+)/?$", 1)
      val s = regexp_replace(base, "\\.[^.]*$", "")
      when(s =!= "", s)
    }
    conv
      .select(
        lit(provider).as("provider_id"),
        coalesce(col("c.conversation_id"), stem, lit("unknown"))
          .as("conversation_id"),
        posexplode(col("c.messages")).as(Seq("turn_idx", "m")))
      .select(
        col("provider_id"), col("conversation_id"),
        col("m.message_id"), col("m.parent_id"), col("m.role"),
        col("m.tool"), col("m.ts"), col("m.content_type"),
        col("m.parts"), col("m.text"), col("turn_idx"))
  }
}
