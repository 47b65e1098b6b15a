package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over corpus-derived edge tables (the
  * [[Similarity.knnGraph]] output): PageRank-style link analysis is
  * how a curation pipeline scores document centrality/influence for
  * sampling and dedup-representative choices (cf. web-graph quality
  * signals in C4/CCNet-descendant pipelines).
  */
object GraphOps {

  /** Total rank mass in fixed-point units: 1e12 picos = 1.0. */
  private val S = 1000000000000L

  /** Fixed-iteration PageRank with damping `alpha` (a percentage, so
    * damping stays rational) and uniform dangling-mass redistribution,
    * computed in FIXED-POINT: all rank mass lives in integer picos
    * (1e12 = 1.0), shares are integer divisions, and per-node
    * contributions are exact integer sums.
    *
    * Why fixed-point: float PageRank puts `pr/outdeg` values on
    * decimal-grid midpoints (rank values are round()-quantized, out
    * degrees are small integers), so cross-engine double rounding
    * flips the last digit per engine — the q65 half-boundary trap,
    * measured live on this operator's first float cut. Integer
    * arithmetic is summation-order-immune and engine-exact by
    * construction; each floor division leaks <1 pico per edge per
    * round, deterministically, which for centrality RANKING is noise
    * ~1e-9 of total mass. The one double in the result —
    * `pagerank = pr_pico / 1e12` — is a single exact-input division,
    * identical in any IEEE engine.
    *
    * Spark shape: each round is ONE shuffle equi-join of the edge
    * table against the rank vector (hash on src) plus ONE groupBy(dst)
    * sum — the canonical O(iters) iterative-join pattern; the rank
    * vector is persisted per round so the bounded dangling-mass agg
    * (one long to the driver, the lloydFit contract) doesn't re-run
    * the chain, and nothing corpus-sized ever converges on one task.
    * At 100 TB the edge join would pre-bucket both sides on src so
    * rounds reuse one partitioning — noted, not needed at demo scale.
    *
    * Returns (vec_id, pagerank_pico, pagerank) for every node. */
  def pageRank(nodes: DataFrame, edges: DataFrame,
      alphaPct: Long = 85L, iters: Int = 3): DataFrame = {
    require(alphaPct > 0 && alphaPct < 100, s"alphaPct $alphaPct")
    val n = nodes.select(col("vec_id"))
    val e = Dedup.persistOnce(edges.select(col("src"), col("dst")))
    val nN = n.count()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var r = Dedup.persistOnce(
      n.select(col("vec_id"), lit(S / nN).as("pr")))
    for (_ <- 1 to iters) {
      // dangling mass: rank parked on nodes with no out-edges
      val dang = r.join(deg, r("vec_id") === deg("src"), "left_anti")
        .agg(coalesce(sum("pr"), lit(0L))).head.getLong(0)
      val base = S * (100L - alphaPct) / 100L / nN +
        dang * alphaPct / 100L / nN
      val contrib = e
        .join(r.withColumnRenamed("vec_id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst").as("vec_id"))
        .agg(sum(expr("pr div outdeg")).as("c"))
      r = Dedup.persistOnce(n
        .join(contrib, Seq("vec_id"), "left")
        .select(col("vec_id"),
          (lit(base) +
            expr(s"coalesce(c, 0L) * $alphaPct div 100"))
            .as("pr")))
    }
    r.select(col("vec_id"), col("pr").as("pagerank_pico"),
      (col("pr") / lit(1.0e12)).as("pagerank"))
  }
}
