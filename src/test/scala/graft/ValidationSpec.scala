package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.Validation

/** Mirrors the reference's validate_message acceptance tests
  * (tests/test_parser_validation.py: good message passes, missing role
  * rejected). */
class ValidationSpec extends AnyFunSuite {
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
