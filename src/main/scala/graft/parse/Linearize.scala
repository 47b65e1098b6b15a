package graft.parse

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conversation-graph linearization: parent-first BFS over each raw
  * conversation's `mapping` DAG with timestamp secondary ordering —
  * the reference's A3/A4/A5 operators
  * (reference: src/llm_logparser/core/providers/openai/adapter.py:59-141:
  * `_build_graph` / `_find_roots` / `_linearize`).
  *
  * The normalized-output contract makes BFS order unobservable (the
  * adapter's final (ts, message_id) sort reorders everything and null-ts
  * rows are dropped), so the parse pipeline does not pay for this — but
  * the traversal itself is part of the reference's surface and is what a
  * user asks for when they want "thread order as the UI shows it"
  * (branch-aware, structural nodes included). It is exposed as its own
  * operator producing (conversation_id, node_id, bfs_idx).
  *
  * Scale shape: one conversation == one raw row, so the graph NEVER
  * crosses rows — the whole operator is a narrow typed `map` + explode
  * with zero shuffle, and partition parallelism is conversation
  * parallelism. Per-conversation work is O(nodes·log nodes) (children
  * sorts) on graphs that fit in a single JSON document by construction.
  *
  * Ordering fidelity notes (all behaviors pinned by LinearizeSpec
  * against orders computed by executing the reference helpers):
  *  - roots/children sort key is (message.create_time is null,
  *    message.create_time, node_id) — message-level ts only, nulls last,
  *    id tie-break (adapter.py:104-112,128-136); structural nodes
  *    (message == null) participate with a null key.
  *  - children adjacency uses the nodes' `children` lists, keeping only
  *    ids present in the mapping; when NO node has a non-empty valid
  *    children list the graph falls back to inverted parent pointers in
  *    mapping order (adapter.py:71-77).
  *  - a root is any node whose parent is null, empty (Python falsy) or
  *    absent from the mapping (adapter.py:88-93).
  *  - nodes unreached by BFS (disconnected cycles) are appended in
  *    mapping order (adapter.py:138-140). Spark's JSON reader builds
  *    map values in document order, so `map_entries` preserves the
  *    export's key order exactly like a Python dict does.
  */
object Linearize {

  /** Row-local view of one mapping node — just the graph fields. */
  final case class NodeLite(
      id: String,
      parent: Option[String],
      children: Option[Seq[String]],
      msg_ct: Option[Double])

  /** Pure BFS linearization of one conversation's nodes (mapping order
    * preserved in `nodes`). Returns every node id exactly once. */
  def bfsOrder(nodes: Seq[NodeLite]): Seq[String] = {
    val ids = nodes.map(_.id)
    val idSet = ids.toSet
    val byId = nodes.map(n => n.id -> n).toMap

    // A3: children adjacency from children lists (valid ids only) …
    val childrenMap = mutable.Map.empty[String, mutable.ArrayBuffer[String]]
    for (n <- nodes; cs <- n.children; c <- cs if idSet.contains(c))
      childrenMap.getOrElseUpdate(n.id, mutable.ArrayBuffer.empty) += c
    // … falling back to inverted parent pointers (mapping order) when
    // no node contributed a valid child edge.
    if (childrenMap.isEmpty)
      for (n <- nodes; p <- n.parent if p.nonEmpty && idSet.contains(p))
        childrenMap.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += n.id

    // Python key (ct is None, ct, id): None==None short-circuits to the
    // id tie-break, so (true, 0.0, id) is the same total order.
    def key(id: String): (Boolean, Double, String) = {
      val ct = byId(id).msg_ct
      (ct.isEmpty, ct.getOrElse(0d), id)
    }

    // A4: roots = nodes with falsy or dangling parent, ts-sorted.
    val roots = ids
      .filter(id => byId(id).parent.forall(p => p.isEmpty || !idSet.contains(p)))
      .sortBy(key)

    // A5: BFS with ts-sorted children; unseen appended in mapping order.
    val order = mutable.ArrayBuffer.empty[String]
    val seen = mutable.Set.empty[String]
    val queue = mutable.Queue(roots: _*)
    while (queue.nonEmpty) {
      val nid = queue.dequeue()
      if (!seen.contains(nid)) {
        seen += nid
        order += nid
        queue.enqueueAll(
          childrenMap.getOrElse(nid, mutable.ArrayBuffer.empty)
            .sortBy(key))
      }
    }
    order ++= ids.filterNot(seen)
    order.toSeq
  }

  /** BFS order per conversation over the raw export frame (the
    * `readRawAuto` shape): (conversation_id, node_id, bfs_idx).
    * Structural nodes are included — join to the normalized messages on
    * (conversation_id, node_id) to order renderable turns. */
  def linearized(raw: DataFrame, provider: String = "openai"): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val entry: Column => Column = e => struct(
      e("key").as("id"),
      e("value")("parent").as("parent"),
      e("value")("children").as("children"),
      e("value")("message")("create_time").as("msg_ct"))
    raw
      .filter(col("mapping").isNotNull)
      .select(
        ChatGptParser.conversationIdCol.as("conversation_id"),
        transform(map_entries(col("mapping")), entry).as("nodes"))
      .as[(String, Seq[NodeLite])]
      .flatMap { case (cid, nodes) =>
        bfsOrder(nodes).zipWithIndex.map {
          case (nid, i) => (cid, nid, i)
        }
      }
      .toDF("conversation_id", "node_id", "bfs_idx")
  }
}
