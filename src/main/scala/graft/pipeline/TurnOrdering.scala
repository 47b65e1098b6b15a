package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable per-conversation turn ordering.
  *
  * The reference sorts every thread by `(ts is None, ts, message_id or "")`
  * (reference: adapter.py:239, parser.py:269, exporter.py:175). Here that
  * becomes a window `partitionBy(conv) orderBy(ts asc_nulls_last,
  * message_id)` with `row_number()-1` as the 0-based `turn_idx` — the
  * north-rule stable-ordering invariant.
  *
  * Scale notes (100 TB / 10^12 turns):
  *  - The window shuffles once on conv_id (hash exchange) and sorts within
  *    partitions; AQE coalesces small post-shuffle partitions.
  *  - row_number over a mega-conversation cannot be salted (it needs the
  *    whole partition); skew is bounded by thread size (~10^4 turns per
  *    the reference's own model), not by data volume. Genuine hot convs
  *    are handled downstream: the routed WRITE salts on message_id so one
  *    conversation never serializes into a single output task (see
  *    Router.scala).
  *  - For sinks that only need sorted-by order (per-thread JSONL), prefer
  *    [[sortedForWrite]]: repartitionByRange gives range-partitioned,
  *    globally ordered output without the row_number exchange.
  */
object TurnOrdering {

  def withTurnIdx(
      df: DataFrame,
      conv: String = "conversation_id",
      ts: String = "ts",
      tie: String = "message_id"): DataFrame = {
    val w = Window.partitionBy(col(conv))
      .orderBy(col(ts).asc_nulls_last, col(tie).asc)
    df.withColumn("turn_idx", row_number().over(w) - 1)
  }

  /** Range-partition by (conv, ts, tie) + sort within partitions: stable
    * global order for file sinks with no window needed.
    */
  def sortedForWrite(
      df: DataFrame,
      conv: String = "conversation_id",
      ts: String = "ts",
      tie: String = "message_id",
      numPartitions: Option[Int] = None): DataFrame = {
    val cols = Seq(col(conv), col(ts).asc_nulls_last, col(tie))
    val parts = numPartitions
      .map(n => df.repartitionByRange(n, col(conv)))
      .getOrElse(df.repartitionByRange(col(conv)))
    parts.sortWithinPartitions(cols: _*)
  }

  /** Salt column for skew-prone wide ops that do NOT need whole-thread
    * state: pmod(xxhash64(tie), buckets) on hot conversations only.
    * Hot set comes from a cheap first-pass count (see SURVEY.md §4.2.3).
    */
  def saltColumn(tie: String, buckets: Int) =
    pmod(xxhash64(col(tie)), lit(buckets)).cast("int")
}
