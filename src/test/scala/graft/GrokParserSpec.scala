package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.GrokParser

/** Grok text-log parser (north-star regex parse stage): round-trip
  * identity, malformed-input tolerance, narrow plan. */
class GrokParserSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private val turns = Seq(
    // multi-line body, tool block, ts tie broken by event_id
    ("c1", "user", null, ts(1000), "hello\nsecond line", 1L),
    ("c1", "assistant", "python", ts(1000), "print(42)", 2L),
    ("c1", "tool", "python", ts(2000), "42", 3L),
    ("c2", "system", null, ts(500), "", 1L), // empty body
    ("c2", "user", null, ts(900), "solo", 2L))
    .toDF("conv_id", "role", "tool", "ts", "text", "event_id")

  test("parse inverts render: roles, tool blocks, ts, multiline bodies") {
    val got = GrokParser.parse(GrokParser.render(turns))
      .orderBy("conv_id", "turn_idx")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getString(5)))
    assert(got.toSeq === Seq(
      ("c1", 0, "user", null, 1000L, "hello\nsecond line"),
      ("c1", 1, "assistant", "python", 1000L, "print(42)"),
      ("c1", 2, "tool", "python", 2000L, "42"),
      ("c2", 0, "system", null, 500L, ""),
      ("c2", 1, "user", null, 900L, "solo")))
  }

  test("malformed headers yield null role/ts, not a failed scan") {
    val raw = Seq(
      ("bad", "### user oops-not-a-ts\nbody"),
      ("empty", ""),
      ("ok", "### user 5\nfine")).toDF("conv_id", "raw")
    val got = GrokParser.parse(raw).orderBy("conv_id")
    val bad = got.filter(col("conv_id") === "bad").head()
    assert(bad.isNullAt(2) && bad.isNullAt(4)) // role, ts_ms null
    assert(got.filter(col("conv_id") === "empty").count() === 0)
    val ok = got.filter(col("conv_id") === "ok").head()
    assert(ok.getString(2) === "user" && ok.getLong(4) === 5L)
  }

  test("parse plan is narrow: zero Exchange") {
    val raw = Seq(("c", "### user 1\nx")).toDF("conv_id", "raw")
    val plan = GrokParser.parse(raw).queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty)
  }

  test("CRLF logs parse identically to LF logs") {
    val lf = "### user 1\nhello\n### assistant [tool: python] 2\nworld"
    val crlf = lf.replace("\n", "\r\n")
    val both = Seq(("lf", lf), ("crlf", crlf)).toDF("conv_id", "raw")
    val got = GrokParser.parse(both).orderBy("conv_id", "turn_idx")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getString(5)))
    val expect = (cid: String) => Seq(
      (cid, 0, "user", null, 1L, "hello"),
      (cid, 1, "assistant", "python", 2L, "world"))
    assert(got.toSeq === expect("crlf") ++ expect("lf"))
  }

  test("round-trip property: randomized transcripts survive render∘parse") {
    // deterministic pseudo-random corpus over a hostile alphabet —
    // unicode, quotes, backslashes, blank lines, AND the boundary
    // marker itself in every quoting depth (markdown headings inside
    // turn text are the common real-world collision; the mbox-style
    // escape must make them round-trip byte-exactly)
    val alphabet = Vector("word", "émoji→", "a\"b\\c", "", "line1\nline2",
      "tab\tsep", "日本語テキスト", "x ## y", "#hash", " ## # ",
      "### Section", "### user 99\nfake turn", ">### quoted",
      ">>### deep", "pre\n### mid\npost", "###nospace")
    val rows = (0 until 500).map { i =>
      val role = Vector("user", "assistant", "system", "tool")(i % 4)
      val tool = if (i % 5 == 0) "browser" else null
      val text = alphabet(i % alphabet.size) +
        (if (i % 3 == 0) "\n" + alphabet((i * 7) % alphabet.size) else "")
      (s"c${i % 17}", role, tool, ts(1000L * (i / 17)), text, i.toLong)
    }.toDF("conv_id", "role", "tool", "ts", "text", "event_id")
    val expected = rows
      .withColumn("turn_idx", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("conv_id")
          .orderBy(col("ts"), col("event_id"))) - 1)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        unix_millis(col("ts")).as("ts_ms"), col("text"))
    val got = GrokParser.parse(GrokParser.render(rows))
    assert(got.unionByName(expected).distinct().count()
      === expected.count(),
      "parse(render(x)) must equal the expected transcript rows")
    assert(got.count() === expected.count())
  }

  test("boundary-marker escape: '### ' body lines round-trip, no fake turns") {
    // the previously-undefined case: a body line starting "### " used
    // to be taken as a turn boundary, fabricating extra turns with
    // null role/ts out of legitimate text
    val hostile = Seq(
      ("c1", "user", null, ts(1000),
        "intro\n### Heading\nbody\n### user 42\nnot a turn", 1L),
      ("c1", "assistant", null, ts(2000), ">### already quoted", 2L))
      .toDF("conv_id", "role", "tool", "ts", "text", "event_id")
    val got = GrokParser.parse(GrokParser.render(hostile))
      .orderBy("turn_idx").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(4), r.getString(5)))
    assert(got.toSeq === Seq(
      (0, "user", 1000L,
        "intro\n### Heading\nbody\n### user 42\nnot a turn"),
      (1, "assistant", 2000L, ">### already quoted")))
  }

  test("streaming parse: stateless narrow op runs unchanged on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val src = MemoryStream[(String, String)]
    src.addData(("c1", "### user 1\nhello\n### assistant [tool: python] 2\nworld"))
    val q = GrokParser.parse(src.toDF().toDF("conv_id", "raw"))
      .writeStream.format("memory").queryName("grok_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("grok_stream")
        .orderBy("turn_idx").collect()
        .map(r => (r.getInt(1), r.getString(2), r.getString(3),
          r.getLong(4), r.getString(5)))
      assert(got.toSeq === Seq(
        (0, "user", null, 1L, "hello"),
        (1, "assistant", "python", 2L, "world")))
    } finally q.stop()
  }
}
