package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Observation

/** Message validation (reference: parser.py:127-168 validate_message) —
  * the residual invariants a fixed StructType cannot enforce, evaluated
  * as one codegen'd predicate pass. Invalid rows are not dropped
  * silently: [[withViolations]] attaches the failed-rule names so the
  * caller routes them to an error channel and counts them (reference
  * semantics: warn + skip + bounded error sampling, parser.py:338-345).
  */
object Validation {

  private def nonEmptyStr(c: String): Column =
    col(c).isNotNull && col(c) =!= ""

  /** rule name → passes-predicate. */
  val rules: Seq[(String, Column)] = Seq(
    "conversation_id" -> nonEmptyStr("conversation_id"),
    "message_id" -> nonEmptyStr("message_id"),
    "role" -> nonEmptyStr("role"),
    "ts" -> (col("ts").isNotNull && col("ts") >= 0L),
    "content_type" -> nonEmptyStr("content_type"),
    "parts" -> col("parts").isNotNull,
    "text" -> col("text").isNotNull)

  /** Adds `violations: array<string>` (empty = valid). */
  def withViolations(msgs: DataFrame): DataFrame =
    msgs.withColumn("violations",
      filter(
        array(rules.map { case (name, ok) =>
          when(!coalesce(ok, lit(false)), lit(name))
        }: _*),
        v => v.isNotNull))

  def valid(msgs: DataFrame): DataFrame =
    withViolations(msgs).filter(size(col("violations")) === 0)
      .drop("violations")

  /** Error channel: rejected rows + why (route to a quarantine sink). */
  def rejected(msgs: DataFrame): DataFrame =
    withViolations(msgs).filter(size(col("violations")) > 0)

  /** Run-summary metrics riding the main pass via `observe` — no extra
    * job (reference run summary: threads/messages/skipped,
    * parser.py:360-363). Read the Observation after an action. */
  def observed(msgs: DataFrame, obs: Observation): DataFrame =
    withViolations(msgs).observe(
      obs,
      count(lit(1)).as("messages"),
      count(when(size(col("violations")) > 0, 1)).as("skipped"),
      approx_count_distinct(col("conversation_id")).as("approx_threads"))
}
