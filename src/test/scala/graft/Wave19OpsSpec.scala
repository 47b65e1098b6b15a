package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SftPrep

/** Behavior specs for the nineteenth-wave operators (q127–q129):
  * tool-grounding score, special-token leakage scan, and the
  * ingestion-order timestamp anomaly audit. */
class Wave19OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tool grounding: intersection ratio, edge filter") {
    import spark.implicits._
    val t = Seq(
      // tool → assistant: 2 of assistant's 4 distinct tokens grounded
      ("A", 0, "tool", "search", "rows alpha beta gamma"),
      ("A", 1, "assistant", null, "the alpha and beta"),
      // assistant NOT preceded by tool → no pair
      ("A", 2, "user", null, "next"),
      ("A", 3, "assistant", null, "alpha"),
      // tool at conversation end → no pair
      ("B", 0, "tool", "calc", "42"))
      .toDF("conv_id", "turn_idx", "role", "tool", "text")
    val out = SftPrep.toolGrounding(t).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "A" && r.getInt(1) == 0)
    assert(r.getString(2) == "search")
    assert(r.getLong(3) == 4L && r.getLong(4) == 4L)
    assert(r.getLong(5) == 2L)
    assert(r.getDouble(6) == 0.5)
  }

  test("special tokens: exact occurrence counts, healthy zeros") {
    import spark.implicits._
    val t = Seq(
      ("A", 0, "assistant", "ok <|end|> done <|"),  // <| x2, |> x1
      ("A", 1, "assistant", "clean"),
      ("A", 2, "user", "[INST] hi [INST]"))         // [INST] x2
      .toDF("conv_id", "turn_idx", "role", "text")
    val out = SftPrep.specialTokenScan(t).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out(("assistant", "<|")) == (2L, 1L, 2L, 0.5))
    assert(out(("assistant", "|>")) == (2L, 1L, 1L, 0.5))
    assert(out(("assistant", "</s>")) == (2L, 0L, 0L, 0.0))
    assert(out(("user", "[INST]")) == (1L, 1L, 2L, 1.0))
    assert(out(("user", "<<SYS>>")) == (1L, 0L, 0L, 0.0))
    assert(out.size == 10) // 2 roles x 5 markers
  }

  test("ts anomalies: backsteps vs arrival order, collisions, max") {
    import spark.implicits._
    val ev = Seq(
      // arrival: ts 100, 90 (backstep 10), 90 (collision), 200
      ("A", 0L, 100L), ("A", 1L, 90L), ("A", 2L, 90L), ("A", 3L, 200L),
      // clean monotone conv
      ("B", 0L, 10L), ("B", 1L, 20L))
      .toDF("conv_id", "event_id", "ts_ms")
    val out = SftPrep.tsAnomalyReport(ev).collect()
    val a = out(0)
    assert(a.getString(0) == "A" && a.getLong(1) == 4L)
    assert(a.getLong(2) == 1L)       // one backstep
    assert(a.getLong(3) == 1L)       // one collision
    assert(a.getLong(4) == 10L)      // max backstep magnitude
    assert(a.getBoolean(5))
    val b = out(1)
    assert(b.getLong(2) == 0L && b.getLong(3) == 0L && !b.getBoolean(5))
  }
}
