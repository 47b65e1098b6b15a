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
}
