package graft.parse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas

/** Parse stage: raw ChatGPT-export conversations → normalized messages.
  *
  * Re-realizes the reference's provider adapter
  * (reference: src/llm_logparser/core/providers/openai/adapter.py:175-240)
  * as a single declarative Catalyst plan — scan → explode(mapping) →
  * project/filter — so predicate pushdown, nested-schema pruning and
  * whole-stage codegen all apply. No RDDs, no UDFs.
  *
  * Semantics matched exactly (all verified against the reference's golden
  * outputs in src/test/resources/golden/):
  *  - conversation_id coalesce chain + filename-stem fallback
  *    (adapter.py:148-163)
  *  - structural nodes (message == null) skipped (adapter.py:199-203)
  *  - role = author.role or message.role or "unknown" (adapter.py:205-208)
  *  - parts = ONLY string elements of content.parts (adapter.py:210-218) —
  *    done with VariantType elements + schema_of_variant filter
  *  - ts = int(float(create_time or node.create_time) * 1000), epoch-ms,
  *    truncating toward zero like Python int(); Python falsy `or` (0.0
  *    falls through) reproduced (adapter.py:166-172,220)
  *  - null-ts messages DROPPED — count-critical (adapter.py:220-222)
  *  - text = "\n".join(parts) (adapter.py:225)
  *
  * The BFS linearization (adapter.py:100-141) is deliberately NOT on
  * this path: the adapter's final sort by (ts, message_id) makes BFS
  * order unobservable in normalized output (see SURVEY.md §2 A5). It
  * exists as its own operator — [[Linearize.linearized]] — for callers
  * that want branch-aware thread order.
  */
object ChatGptParser {

  /** Streaming JSONL scan (one conversation per line) — the scale path:
    * splittable, per-line parse, corrupt lines quarantined not fatal
    * (reference reader semantics: parser.py:56-120 warn-skip).
    */
  def readRawJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.rawConversationSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("encoding", "UTF-8") // never the platform charset
      .json(path)

  /** JSON-array / single-object container (reference: parser.py:86-113).
    * multiLine files are not splittable — fine for the import edge, the
    * normalized table is what runs at scale.
    */
  def readRawMultiline(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.rawConversationSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("encoding", "UTF-8") // multiLine decodes with platform charset otherwise
      .option("multiLine", value = true)
      .json(path)

  /** Container sniffing by first non-whitespace char (reference:
    * parser.py:56-76): '[' or a single '{' spanning lines → multiLine;
    * otherwise JSONL. Reads a few bytes on the driver only, through the
    * Hadoop FileSystem of the path's scheme — java.nio only ever worked
    * for local files and silently broke hdfs:/s3a: inputs. A directory
    * input (the scale shape: a dir of JSONL part files) sniffs its
    * first contained data file.
    */
  def readRawAuto(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val target =
      if (!fs.getFileStatus(p).isDirectory) p
      else {
        // recursive: part files may sit under nested partition dirs
        // (raw/date=…/part-*.jsonl); a clean error beats fs.open(dir)
        val it = fs.listFiles(p, true)
        var found: Option[org.apache.hadoop.fs.Path] = None
        while (found.isEmpty && it.hasNext) {
          val s = it.next()
          val n = s.getPath.getName
          if (s.isFile && !n.startsWith("_") && !n.startsWith("."))
            found = Some(s.getPath)
        }
        found.getOrElse(throw new java.nio.file.NoSuchFileException(
          s"no data files under $path"))
      }
    val head = {
      val in = fs.open(target)
      try {
        val buf = new Array[Byte](4096)
        val n = math.max(in.read(buf, 0, buf.length), 0)
        new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    }
    val trimmed = head.replace("﻿", "").dropWhile(_.isWhitespace)
    val multi = trimmed.headOption.contains('[') ||
      (trimmed.headOption.contains('{') && head.linesIterator.size > 1 &&
        !head.linesIterator.drop(1).exists(_.trim.startsWith("{")))
    if (multi) readRawMultiline(spark, path) else readRawJsonl(spark, path)
  }

  private def nonEmpty(c: Column): Column = when(c.isNotNull && c =!= "", c)

  /** `Path(source).stem` equivalent over input_file_name(). */
  private def fileStem: Column = {
    val base = regexp_extract(input_file_name(), "([^/]+)/?$", 1)
    nonEmpty(regexp_replace(base, "\\.[^.]*$", ""))
  }

  /** conversation_id derivation (adapter.py:148-163). The sha1 branch
    * formats create_time with Spark's double→string cast, which differs
    * from Python repr — only reachable when a conversation has no id AND
    * no source filename, which never happens on the live path (the
    * reference always passes source; parser.py:243-256).
    */
  private def conversationId: Column = coalesce(
    nonEmpty(col("conversation_id")),
    nonEmpty(col("id")),
    nonEmpty(col("uuid")),
    fileStem,
    substring(
      sha1(concat_ws("|",
        coalesce(col("title"), lit("")),
        coalesce(col("create_time").cast(StringType),
          col("update_time").cast(StringType), lit("")))), 1, 12),
    lit("unknown"))

  /** The conversation-id coalesce chain, shared with [[Linearize]]. */
  private[parse] def conversationIdCol: Column = conversationId

  /** Normalize raw conversations into the message contract.
    *
    * Output columns (Schemas.messageColumns): provider_id,
    * conversation_id, message_id, parent_id, role, tool, ts (epoch-ms
    * long), content_type, parts (array<string>), text.
    */
  def normalize(raw: DataFrame, provider: String = "openai"): DataFrame = {
    // conversation_id is projected BELOW the explode: co-projected
    // with the Generate it would re-run the id coalesce chain
    // (regexp/sha1 branches included) once per MESSAGE instead of
    // once per conversation
    val exploded = raw
      .filter(col("mapping").isNotNull)
      .select(
        lit(provider).as("provider_id"),
        conversationId.as("conversation_id"),
        col("mapping"))
      .select(
        col("provider_id"), col("conversation_id"),
        explode(map_entries(col("mapping"))).as("entry"))
      .select(
        col("provider_id"), col("conversation_id"),
        col("entry.key").as("node_id"),
        col("entry.value").as("node"))
      .filter(col("node.message").isNotNull)

    val msg = col("node.message")

    // Python `msg.create_time or node.create_time`: 0.0 is falsy.
    val tsSec = when(msg("create_time").isNotNull && msg("create_time") =!= 0.0d,
      msg("create_time")).otherwise(col("node.create_time"))

    // Keep only string-typed parts (Variant-typed elements carry the
    // original JSON type); non-list / missing parts → empty array.
    val stringParts = coalesce(
      transform(
        filter(msg("content")("parts"),
          p => schema_of_variant(p) === lit("STRING")),
        p => try_variant_get(p, "$", "string")),
      array().cast(ArrayType(StringType)))

    // Micro-divergence (documented, unreachable on well-formed exports):
    // a NUMERIC author.role is stringified by Spark's JSON reader
    // (role="123"); the reference's isinstance check yields "unknown"
    // and the fast-path scanner falls through to msg.role. All three
    // agree on every string-or-absent role.
    val role = coalesce(
      nonEmpty(msg("author")("role")), nonEmpty(msg("role")), lit("unknown"))

    exploded
      .withColumn("ts_sec", tsSec)
      .filter(col("ts_sec").isNotNull) // A10: null-ts drop, count-critical
      .select(
        col("provider_id"),
        col("conversation_id"),
        coalesce(nonEmpty(msg("id")), col("node_id")).as("message_id"),
        col("node.parent").as("parent_id"),
        role.as("role"),
        when(role === "tool", nonEmpty(msg("author")("name"))).as("tool"),
        (col("ts_sec") * 1000d).cast(LongType).as("ts"),
        when(msg("content")("content_type").isNotNull,
          msg("content")("content_type")).otherwise(lit("text"))
          .as("content_type"),
        stringParts.as("parts"))
      .withColumn("text", array_join(col("parts"), "\n"))
  }

  /** Corrupt-line counter (reference warn-skips broken lines and reports
    * them in the run summary, parser.py:82-84,338-345). Use with
    * df.observe or as a side aggregate.
    */
  def corruptRows(raw: DataFrame): DataFrame =
    // also references a data column (mapping) — Spark disallows queries
    // touching ONLY the corrupt-record column on raw file scans
    raw.select(count(
      when(col("_corrupt_record").isNotNull && col("mapping").isNull, 1))
      .as("corrupt_lines"))
}
