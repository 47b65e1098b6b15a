// Second scale point for the three wave-10 heavies (q93 cross-source matrix, q96 leakage split, q99 LSH audit): generate a
// deterministic sf1 corpus (10x sf0.1) and time q93/q96/q99
// at BOTH scales, interleaved, in one warm JVM at local[32].
//
// sf1 synthesis (no external data, fully deterministic):
//  - documents: 10 replicas of the sf0.1 table; replica r>0 re-keys
//    doc_id + r*1e6 and appends "~r" to every whitespace token, so each
//    replica keeps sf0.1's internal shingle/duplicate structure but
//    shares NO shingle across replicas — total q31/q36/q47 work is
//    therefore 10x the sf0.1 structure, the correct "linear" baseline
//    (verbatim replication would instead give every doc 9 exact
//    near-dups and measure a deliberately quadratic corpus).
//  - embeddings: 10 replicas; replica r rotates each vector by r
//    positions (norm-preserving, decorrelates replicas) and re-keys
//    vec_id + r*1e6.
//
// Usage: spark-shell -I this file (see bench_r5_sf1_heavies.sh).
// Env: GRAFT_SF1_ROUNDS (default 4), GRAFT_SF1_OUT (jsonl path).
import org.apache.spark.sql.functions._

val sf01 = "/root/testdata/sf0.1"
val sf1Dir = "/dev/shm/graft_sf1"
val rounds = sys.env.getOrElse("GRAFT_SF1_ROUNDS", "4").toInt
val outPath = sys.env.getOrElse("GRAFT_SF1_OUT",
  "/tmp/bench_r5_sf1_wave10.jsonl")

// ---- deterministic sf1 generation (untimed) ----
val docs01 = spark.read.parquet(s"$sf01/documents.parquet")
val embs01 = spark.read.parquet(s"$sf01/embeddings.parquet")
val docs1 = (0 until 10).map { r =>
  if (r == 0) docs01
  else docs01.select(
    (col("doc_id") + lit(r * 1000000L)).as("doc_id"),
    regexp_replace(col("text"), "(\\S+)", "$1~" + r).as("text"),
    col("lang"), col("source"),
    length(regexp_replace(col("text"), "(\\S+)", "$1~" + r))
      .cast("long").as("n_chars"))
}.reduce(_ unionByName _)
val dim = 64
val embs1 = (0 until 10).map { r =>
  if (r == 0) embs01
  else embs01.select(
    (col("vec_id") + lit(r * 1000000L)).as("vec_id"),
    concat(slice(col("embedding"), r + 1, dim - r),
      slice(col("embedding"), 1, r)).as("embedding"),
    col("label"))
}.reduce(_ unionByName _)
docs1.repartition(32).write.mode("overwrite")
  .parquet(s"$sf1Dir/documents.parquet")
embs1.repartition(32).write.mode("overwrite")
  .parquet(s"$sf1Dir/embeddings.parquet")
println(s"sf1 generated: docs=${spark.read.parquet(s"$sf1Dir/documents.parquet").count()}, " +
  s"embs=${spark.read.parquet(s"$sf1Dir/embeddings.parquet").count()}")

// ---- interleaved timing ----
val heavies = graft.SparkEntry.queries.keys.toSeq.sorted.filter(n =>
  Seq("q93", "q96", "q99").exists(n.startsWith))
require(heavies.size == 3, s"heavies resolved to $heavies")
val out = new java.io.PrintWriter(new java.io.FileWriter(outPath))
def runOne(name: String, dir: String): Double = {
  spark.catalog.clearCache()
  val t0 = System.nanoTime()
  graft.SparkEntry.queries(name)(spark, dir).count()
  (System.nanoTime() - t0) / 1e9
}
// untimed JIT warmup at the small scale
heavies.foreach(n => runOne(n, sf01))
for (round <- 1 to rounds; (sfName, dir) <- Seq("sf0.1" -> sf01, "sf1" -> sf1Dir)) {
  heavies.foreach { n =>
    val s = runOne(n, dir)
    val line = f"""{"round":$round,"sf":"$sfName","query":"$n","sec":$s%.3f}"""
    out.println(line); out.flush()
    println(line)
  }
}
out.close()
println(s"DONE -> $outPath")
sys.exit(0)
