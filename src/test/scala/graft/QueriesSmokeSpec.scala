package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query runs on sf0.001 and returns rows; every query
  * has an oracle (or is explicitly exempted); flagship entry works. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Keys intentionally without a DuckDB oracle (non-SQL-expressible);
    * driver records a weaker rows-only check for these. */
  private val oracleExempt: Set[String] =
    Set("q33_simhash_pairs", "q42_ann_lsh")

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle or an explicit exemption") {
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- oracleExempt
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without query: $orphan")
  }
}
