package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Grok-style parse of PLAIN-TEXT transcript logs — the north-star's
  * "compiled-regex parse stage extracts role markers, tool-call blocks
  * and turn boundaries from raw text bytes via Catalyst expressions"
  * (BASELINE.json north_star), complementing the JSON-export parsers:
  * many agent frameworks log conversations as text, not JSON.
  *
  * Wire format (one document per conversation):
  * {{{
  * ### user 1756622514615
  * hello there
  * ### assistant [tool: python] 1756622519001
  * line one
  * line two
  * }}}
  * A turn boundary is a line starting `### `; the header line carries
  * `role [tool: name]? epoch_ms`; everything until the next boundary
  * is the turn's text (multi-line bodies supported).
  *
  * Escaping contract: a BODY line that would collide with the boundary
  * marker — `^(>*)### ` — is quoted on render with one leading `>` and
  * unquoted on parse (the mbox "From "-quoting scheme). This makes the
  * wire format total: markdown headings like "### Section" inside turn
  * text round-trip byte-exactly instead of silently fabricating extra
  * turns, and text that already looks quoted (">### x") survives too,
  * because render quotes every line in the collision class and parse
  * strips exactly one ">" from it.
  *
  * Spark-first: the parser is split + posexplode + regexp_extract —
  * every operator codegen'd, no UDF, no RDD, and parsing is a NARROW
  * map over conversations (the graph of a transcript never crosses
  * rows), so at 10^12 turns it scales with input splits alone.
  * [[render]] is the inverse (used to exercise the parser against the
  * oracle's independently-derived expected rows: parse ∘ render must
  * be the identity on the transcript table).
  */
object GrokParser {

  // mbox-style quoting of the reserved boundary sequence (see class
  // doc): quote ^(>*)### on render, strip one ">" from ^>(>*)### on
  // parse — each is a single codegen'd multiline regexp pass
  private def escapeBody(text: Column): Column =
    regexp_replace(text, "(?m)^(>*### )", ">$1")
  private def unescapeBody(body: Column): Column =
    regexp_replace(body, "(?m)^>(>*### )", "$1")

  /** Per-conversation text document from the transcript table —
    * turns ordered by (ts, event_id) like every sink in this engine.
    * One shuffle (the groupBy), unavoidable: a per-conversation
    * document IS a per-conversation grouping. */
  def render(transcripts: DataFrame): DataFrame = {
    val header = concat(
      lit("### "), col("role"),
      when(col("tool").isNotNull,
        concat(lit(" [tool: "), col("tool"), lit("]"))).otherwise(lit("")),
      lit(" "), unix_millis(col("ts").cast("timestamp")).cast("string"))
    transcripts
      .select(col("conv_id"),
        struct(
          unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
          col("event_id"),
          concat(header, lit("\n"), escapeBody(col("text"))).as("turn"))
          .as("t"))
      .groupBy("conv_id")
      .agg(concat_ws("\n",
        transform(sort_array(collect_list(col("t"))), _.getField("turn")))
        .as("raw"))
  }

  private val headerRe = "^(\\w+)(?: \\[tool: ([^\\]]+)\\])? (\\d+)$"

  /** Parse raw documents (conv_id, raw) → one row per turn:
    * (conv_id, turn_idx, role, tool, ts_ms, text). Narrow + codegen'd
    * end to end; malformed headers yield null role/ts rather than
    * failing the scan (warn-skip downstream, like the JSON path). */
  def parse(raw: DataFrame): DataFrame = {
    // CRLF logs are the common case for text exports: normalize line
    // endings first (one codegen'd pass) or the trailing \r defeats
    // both the boundary split and the header's (\d+)$ anchor.
    // Leading "\n" then makes every boundary — including the first —
    // the uniform "\n### " separator; element 0 is the (empty)
    // preamble.
    val normalized = regexp_replace(col("raw"), "\r\n", "\n")
    val segs = split(concat(lit("\n"), normalized), "\n### ")
    val seg = col("seg")
    val headerLine = substring_index(seg, "\n", 1)
    val body = seg.substr(length(headerLine) + lit(2), length(seg))
    raw
      .select(col("conv_id"),
        posexplode(slice(segs, lit(2), greatest(size(segs) - 1, lit(0)))))
      .withColumnRenamed("col", "seg")
      .select(
        col("conv_id"),
        col("pos").cast(IntegerType).as("turn_idx"),
        nullif(regexp_extract(headerLine, headerRe, 1), lit(""))
          .as("role"),
        nullif(regexp_extract(headerLine, headerRe, 2), lit(""))
          .as("tool"),
        nullif(regexp_extract(headerLine, headerRe, 3), lit(""))
          .cast(LongType).as("ts_ms"),
        unescapeBody(body).as("text"))
  }

  /** Lift parsed text turns into the normalized [[graft.model.Schemas.Message]]
    * contract so the text input mode feeds the SAME route/index/export
    * stages as the JSON providers. Warn-skip semantics match the JSON
    * path: malformed headers (null role/ts — the reference's
    * count-critical A10 null-ts drop) are filtered here, counted by the
    * caller's observe on the pre-filter frame. Message ids are
    * positional (`conv-idx`), so parent_id is the PREVIOUS index —
    * computable with pure narrow arithmetic, no window, no shuffle:
    * text transcripts are already linear, there is no DAG to walk.
    */
  def toMessages(parsed: DataFrame, provider: String): DataFrame =
    parsed
      .filter(col("role").isNotNull && col("ts_ms").isNotNull)
      .select(
        lit(provider).as("provider_id"),
        col("conv_id").as("conversation_id"),
        concat(col("conv_id"), lit("-"), col("turn_idx"))
          .as("message_id"),
        when(col("turn_idx") > 0,
          concat(col("conv_id"), lit("-"), col("turn_idx") - 1))
          .as("parent_id"),
        col("role"), col("tool"),
        col("ts_ms").as("ts"),
        lit("text").as("content_type"),
        array(col("text")).as("parts"),
        col("text"))
}
