package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic ±1 random-hyperplane matrix for sign-LSH.
  *
  * Component (p, d) is the parity of the first byte of md5("p:d") —
  * engine-independent and dependency-free. The matrix is computed ON
  * THE DRIVER and inlined into the plan as literal array<float>
  * columns (and into the DuckDB oracle SQL as literal ± chains), so
  * executors never hash: the per-row cost is one codegen'd dot product
  * per plane.
  *
  * Float-parity note: the two engines may accumulate the projection in
  * different orders (VecDot is a sequential double fold; DuckDB's
  * list_sum is engine-defined), bounding the cross-engine delta at
  * ~1e-13 relative. The LSH bit is the projection's SIGN, so parity
  * needs |proj| to clear that noise floor: measured min |proj| over
  * all (vector, plane) pairs of the sf0.001/0.01/0.1 embeddings is
  * 7.4e-6 — a 10^7 margin — which is what makes the q42/q35 oracles
  * sound. (Ties at exactly 0.0 would be the only unportable case.)
  */
object Hyperplanes {

  /** ±1 component for plane p, dimension d. */
  def sign(p: Int, d: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(
      s"$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if ((dig(0) & 1) == 0) 1f else -1f
  }

  def plane(p: Int, dim: Int): Array[Float] = Array.tabulate(dim)(sign(p, _))

  /** Literal array<float> column for plane p (driver-side constant). */
  def planeCol(p: Int, dim: Int): Column = typedLit(plane(p, dim).toSeq)

  /** Sign bit of v·h_p as a 0/2^bit long term. */
  private def bitTerm(vec: Column, p: Int, dim: Int, bit: Int): Column =
    when(graft.functions.vec_dot(vec, planeCol(p, dim)) >= 0d,
      lit(1L << bit)).otherwise(lit(0L))

  /** nPlanes-bit LSH bucket id of an array<float> column (planes
    * firstPlane until firstPlane+nPlanes). */
  def bucket(vec: Column, nPlanes: Int, dim: Int,
      firstPlane: Int = 0): Column =
    (0 until nPlanes).map(b => bitTerm(vec, firstPlane + b, dim, b))
      .reduce((a, b) => a.bitwiseOR(b))

  // -----------------------------------------------------------------
  // DuckDB oracle fragments (same matrix, literal SQL)
  // -----------------------------------------------------------------

  /** Plane p as a DuckDB literal list. */
  def planeListSql(p: Int, dim: Int): String =
    plane(p, dim).map(v => if (v > 0f) "1.0" else "-1.0")
      .mkString("[", ",", "]")

  /** Projection of list expression `arr` onto plane p (sign-safe: see
    * the float-parity note above). */
  def projSql(arr: String, p: Int, dim: Int): String =
    s"list_sum(list_transform(list_zip($arr, ${planeListSql(p, dim)}), " +
      "x -> CAST(x[1] AS DOUBLE) * x[2]))"

  /** Bucket id of `arr` over planes firstPlane until firstPlane+n. */
  def bucketSql(arr: String, nPlanes: Int, dim: Int,
      firstPlane: Int = 0): String =
    (0 until nPlanes).map { b =>
      s"(CASE WHEN ${projSql(arr, firstPlane + b, dim)} >= 0 " +
        s"THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
