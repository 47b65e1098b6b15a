package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite

import graft.parse.{ChatGptParser, Linearize}
import graft.parse.Linearize.NodeLite

/** BFS linearization (A3/A4/A5) vs orders computed by EXECUTING the
  * reference's `_build_graph`/`_find_roots`/`_linearize`
  * (adapter.py:59-141) on the same inputs — both the shipped fixtures
  * and adversarial graphs covering every branch: parent-pointer
  * fallback, dangling/falsy parents, ts ties, null-ts ordering,
  * disconnected cycles, ghost children.
  */
class LinearizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def n(
      id: String, parent: String = null, children: Seq[String] = null,
      ct: java.lang.Double = null) =
    NodeLite(id, Option(parent), Option(children),
      Option(ct).map(_.doubleValue))

  test("fixture openai_sample: order matches executed reference") {
    val raw = ChatGptParser.readRawMultiline(
      spark, TestSpark.resource("/fixtures/openai_sample.json"))
    val got = Linearize.linearized(raw)
      .orderBy("bfs_idx").collect().map(_.getString(1)).toSeq
    assert(got === Seq(
      "client-created-root",
      "41b10ffd-b6c9-4bb2-a2b2-d04433bb37fd",
      "f71345d9-673e-4c3c-93db-c04c7813d1f3",
      "f4432288-e882-4f3a-8413-3ec7148a0394",
      "bdb83b07-3c85-4340-bfee-92254caa0057"))
  }

  test("fixture openai_sample_multi: 20 nodes, reference prefix + count") {
    val raw = ChatGptParser.readRawMultiline(
      spark, TestSpark.resource("/fixtures/openai_sample_multi.json"))
    val rows = Linearize.linearized(raw).orderBy("bfs_idx").collect()
    val got = rows.map(_.getString(1)).toSeq
    assert(got.size === 20)
    assert(rows.map(_.getInt(2)).toSeq === (0 until 20))
    // executed-reference order (first and last five pin the traversal;
    // the full list is asserted via the sample fixture + unit graphs)
    assert(got.take(5) === Seq(
      "client-created-root",
      "41b10ffd-b6c9-4bb2-a2b2-d04433bb37fd",
      "f71345d9-673e-4c3c-93db-c04c7813d1f3",
      "f4432288-e882-4f3a-8413-3ec7148a0394",
      "bdb83b07-3c85-4340-bfee-92254caa0057"))
    assert(got.takeRight(5) === Seq(
      "8c23b157-aeb7-4d61-b66a-6b2e2d7b893a",
      "cf99b0ff-4721-4d49-b3d0-a5e83a497b14",
      "0295e83f-3b2b-40c3-91e2-7bdd54b10d12",
      "b299ddde-ed49-4fd3-8e22-6213991a3c9b").+:(
      "bbb45d6d-1bb2-446c-865c-7ddff5034604"))
  }

  test("no children lists: inverted parent pointers, ts-sorted kids") {
    // reference: ['r', 'b', 'a', 'c'] — r's kids b(2.0) before a(5.0)
    val nodes = Seq(
      n("r"), n("b", parent = "r", ct = 2.0),
      n("a", parent = "r", ct = 5.0), n("c", parent = "b", ct = 3.0))
    assert(Linearize.bfsOrder(nodes) === Seq("r", "b", "a", "c"))
  }

  test("dangling/empty parents are roots; roots ts-sorted, null-ts last") {
    // reference: ['z', 'x', 'y'] — z(1.0), x(9.0, dangling), y(null ts)
    val nodes = Seq(
      n("x", parent = "GONE", children = Nil, ct = 9.0),
      n("y", parent = "", children = Nil),
      n("z", children = Nil, ct = 1.0))
    assert(Linearize.bfsOrder(nodes) === Seq("z", "x", "y"))
  }

  test("disconnected cycle appended in mapping order") {
    // reference: ['r', 'k', 'q2', 'q1'] — cycle unreached, mapping order
    val nodes = Seq(
      n("r", children = Seq("k"), ct = 1.0),
      n("k", parent = "r", children = Nil, ct = 2.0),
      n("q2", parent = "q1", children = Seq("q1"), ct = 0.5),
      n("q1", parent = "q2", children = Seq("q2"), ct = 0.2))
    assert(Linearize.bfsOrder(nodes) === Seq("r", "k", "q2", "q1"))
  }

  test("child ts ties break on id; null-ts child last; ghost id skipped") {
    // reference: ['r', 'c1', 'c3', 'c2']
    val nodes = Seq(
      n("r", children = Seq("c3", "c1", "c2", "ghost")),
      n("c1", parent = "r", children = Nil, ct = 4.0),
      n("c2", parent = "r", children = Nil),
      n("c3", parent = "r", children = Nil, ct = 4.0))
    assert(Linearize.bfsOrder(nodes) === Seq("r", "c1", "c3", "c2"))
  }

  test("any valid child edge disables the parent-pointer fallback") {
    // reference: ['r', 'a', 'b'] — b only reachable via the fallback,
    // which must NOT engage (children_map is non-empty), so b is an
    // unseen append, not a traversed child
    val nodes = Seq(
      n("r", children = Seq("a")),
      n("a", parent = "r", ct = 1.0),
      n("b", parent = "a", ct = 2.0))
    assert(Linearize.bfsOrder(nodes) === Seq("r", "a", "b"))
  }

  test("plan is narrow: zero Exchange (graph never crosses rows)") {
    val raw = ChatGptParser.readRawMultiline(
      spark, TestSpark.resource("/fixtures/openai_sample_multi.json"))
    val plan = Linearize.linearized(raw).queryExecution.executedPlan
    val exchanges = plan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty, s"expected no shuffle, got:\n$plan")
  }
}
