package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.Validation

/** Mirrors the reference's validate_message acceptance tests
  * (tests/test_parser_validation.py: good message passes, missing role
  * rejected). */
class ValidationSpec extends AnyFunSuite {

  test("A14 sanitize chain matches reference _sanitize_impl semantics") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val in = Seq("a\u00A0b", "a\u0001\u0002b", " a\t\n b \u3000c ",
      "x\u007Fy", "", "  ", "日本 語\tテスト")
    val got = in.toDF("t")
      .select(graft.parse.Sanitize.sanitizeText(col("t")))
      .as[String].collect().toSeq
    // expectations computed by running the reference's 4-line
    // _sanitize_impl (openai/utils.py:33-38) on the same inputs; note
    // \t is a CONTROL char stripped before collapse, so 語/テスト join
    // with no space, and U+3000 collapses like Python's Unicode \s
    assert(got === Seq("a b", "ab", "a b c", "xy", "", "", "日本 語テスト"))
    val joined = Seq(Tuple1(Seq("  hello ", "wor\tld")))
      .toDF("parts")
      .select(graft.parse.Sanitize.partsToText(col("parts")))
      .as[String].head()
    assert(joined === "hello world")
  }
  lazy val spark = TestSpark.spark

  private def frame(role: String) = {
    import spark.implicits._
    Seq(
      ("c1", "m1", role, 1000L, "text", Seq("hi"), "hi"),
      ("c1", "m2", "assistant", 2000L, "text", Seq("yo"), "yo"))
      .toDF("conversation_id", "message_id", "role", "ts",
        "content_type", "parts", "text")
  }

  test("good messages pass") {
    assert(Validation.valid(frame("user")).count() === 2)
    assert(Validation.rejected(frame("user")).count() === 0)
  }

  test("missing role is rejected with the rule name") {
    val rej = Validation.rejected(frame("")).collect()
    assert(rej.length === 1)
    assert(rej.head.getAs[scala.collection.Seq[String]]("violations").toSeq === Seq("role"))
  }

  test("negative ts and null text are rejected") {
    import spark.implicits._
    val df = Seq(("c1", "m1", "user", -5L, "text", Seq("x"), null))
      .toDF("conversation_id", "message_id", "role", "ts",
        "content_type", "parts", "text")
    val v = Validation.rejected(df).head().getAs[scala.collection.Seq[String]]("violations").toSeq
    assert(v.toSet === Set("ts", "text"))
  }

  test("observe metrics ride the main action") {
    val obs = Observation("val_test")
    Validation.observed(frame(""), obs).collect()
    val row = obs.get
    assert(row("messages") === 2L)
    assert(row("skipped") === 1L)
  }
}
