package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.agg.Aggregates
import graft.gen.TranscriptGen
import graft.parse.ChatGptParser
import graft.pipeline.TurnOrdering
import graft.route.Router

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":SEC,"unit":"sec","queries":{...},
  *  "pipeline":{...},"pipeline_generic":{...},"sf":...}
  *
  *  - queries: per-query wall seconds for every SparkEntry query over
  *    SPARK_GRAFT_SF_DIR (forced with .count()).
  *  - pipeline: the north-rule end-to-end parse→route→aggregate job
  *    over a synthesized raw-transcript JSONL corpus (generation is
  *    untimed): fast-path single-pass parse (zero-shuffle parse+order)
  *    → routed (role, tool) snapshot write → routed counts + thread
  *    stats + text checksum. Reports turns/sec.
  *  - pipeline_generic: same job through the generic Catalyst JSON
  *    parse + turn-order window (one repeat — it exists so a
  *    regression in EITHER parse path is visible round-over-round).
  *
  * Corpus size via SPARK_GRAFT_CONVS (default 480k convs ≈ 5.5M
  * turns — large enough that fixed job overhead is noise).
  * SPARK_GRAFT_REPEAT (default 2) runs the timed job N times and
  * reports the minimum (shared-VM noise swings single shots ~2×).
  *
  * Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N): run
  * this main twice with SPARK_GRAFT_CPUS=8 and =32 on the same input —
  * see BASELINE.md "Measured" section and scripts/scaling_bench.sh.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // ~5.5M turns: large enough that fixed job overhead (<6 s) is noise
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_CONVS", "480000").toInt
    val shm = java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get("/dev/shm"))
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // task-side commit: the v1 driver-side merge measured ~4 s serial
      // on the routed fan-out write
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        "2")
      .config("spark.driver.memory",
        sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
    // shuffle to tmpfs: the sandbox disk (~380 MB/s) would otherwise
    // serialize every exchange
    val spark = (if (shm) b.config("spark.local.dir", "/dev/shm/graft-shuffle")
                 else b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val skipQueries = sys.env.contains("SPARK_GRAFT_SKIP_QUERIES")
    val results =
      if (skipQueries) Seq.empty
      else SparkEntry.queries.toSeq.sortBy(_._1).map {
        case (name, fn) =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() }
          catch { case _: Throwable => -1L }
          name -> (System.nanoTime() - t0) / 1e9
      }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // ---- end-to-end pipeline throughput (untimed corpus generation) --
    // tmpfs when available: the sandbox disk tops out at ~380 MB/s,
    // which would measure the disk, not the engine
    val workBase = if (java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get("/dev/shm"))) "/dev/shm" else
      System.getProperty("java.io.tmpdir")
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(workBase), "graft-bench")
    val rawPath = s"$work/raw"
    TranscriptGen.renderRawJsonl(TranscriptGen.synthesize(spark, nConvs))
      .write.mode("overwrite").text(rawPath)

    // Repeat-and-take-min: the sandbox VM's co-tenant noise swings
    // single-shot wall times ~2×; min over repeats is the standard
    // noise-robust estimator.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt
    val saltBuckets = sys.env.getOrElse("SPARK_GRAFT_SALT", "8").toInt

    // ONE pass over the raw input: parse (+ turn ordering) → routed
    // write; aggregates read the routed parquet back (caching the parse
    // costs more than it saves — measured 44 s materialize vs 15 s
    // recompute — and production aggregates run on sink tables).
    def runPipeline(generic: Boolean, nRepeats: Int): String = {
      var turns = 0L
      var nThreads = 0L
      var bestElapsed = Double.MaxValue
      var bestWrite = Double.MaxValue
      for (_ <- 1 to nRepeats) {
        val t0 = System.nanoTime()
        val ordered =
          if (generic)
            TurnOrdering.withTurnIdx(ChatGptParser.normalize(
              ChatGptParser.readRawJsonl(spark, rawPath)))
          else
            graft.parse.FastTranscriptParser.parse(spark, rawPath)
        val sinkData = Router.writeRoutedSinks(ordered, work.toString,
          saltBuckets = saltBuckets)
        val tWrite = (System.nanoTime() - t0) / 1e9
        val routedTable = spark.read.parquet(sinkData)
        val routed = routedTable
          .groupBy(col("role"), col("tool_sink")).count().collect()
        nThreads = Aggregates.threadStats(routedTable).count()
        routedTable.agg(
          count(lit(1)), min(md5(col("text").cast("binary")))).collect()
        val elapsed = (System.nanoTime() - t0) / 1e9
        turns = routed.map(_.getLong(2)).sum
        if (elapsed < bestElapsed) { bestElapsed = elapsed; bestWrite = tWrite }
      }
      f"""{"turns":$turns,"threads":$nThreads,"sec":$bestElapsed%.3f,""" +
        f""""parse_route_sec":$bestWrite%.3f,""" +
        f""""agg_sec":${bestElapsed - bestWrite}%.3f,""" +
        f""""turns_per_sec":${turns / bestElapsed}%.1f,""" +
        f""""repeats":$nRepeats,"cpus":$cpus}"""
    }

    val pipeline = runPipeline(generic = false, repeats)
    // generic path: one repeat (≈5× the fast path's cost; the point is
    // round-over-round regression visibility, not a tight estimate)
    val pipelineGeneric =
      if (sys.env.contains("SPARK_GRAFT_SKIP_GENERIC")) """{}"""
      else runPipeline(generic = true, 1)

    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"pipeline":$pipeline,"pipeline_generic":$pipelineGeneric,"sf":"$sfDir"}""")
    // clean the (possibly tmpfs) working set
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(work).iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    spark.stop()
  }
}
