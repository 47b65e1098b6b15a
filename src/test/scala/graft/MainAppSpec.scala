package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.app.Main

/** End-to-end job modes through the spark-submit entry point. */
class MainAppSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("chain: raw fixture → parsed JSONL + routed sinks + manifest → markdown") {
    val out = java.nio.file.Files.createTempDirectory("graft-app")
    val rc = Main.run(Array("chain",
      "--input", TestSpark.resource("/fixtures/openai_sample_multi.json"),
      "--outdir", out.toString))
    assert(rc === 0)
    val cid = "68b3eea1-1fc4-832c-878a-23896288675a"
    // parsed JSONL byte-equal to reference golden
    val got = java.nio.file.Files.readString(
      out.resolve(s"openai/thread-$cid/parsed.jsonl"))
    val want = java.nio.file.Files.readString(java.nio.file.Paths.get(
      TestSpark.resource("/golden/sample_multi_parsed.jsonl")))
    assert(got === want)
    // routed sinks: snapshot-committed with partition pruning layout
    val routed = new graft.table.SnapshotParquetTable(
      out.resolve("openai/routed").toString)
    val snap = routed.currentSnapshot(spark).get
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(snap.dataPath, "role=assistant")))
    assert(routed.read(spark).count() === 16L)
    // pointer manifest + distributed thread index
    val manifest = java.nio.file.Files.readString(
      out.resolve("openai/manifest.json"))
    assert(manifest.contains("\"path\": \"thread_index\""))
    assert(manifest.contains("\"threads\": 1"))
    assert(manifest.contains("\"partitions\""))
    val idx = graft.lineage.Lineage.readThreadIndex(spark,
      out.resolve("openai/thread_index").toString)
    assert(idx.filter(org.apache.spark.sql.functions.col("count") === 16)
      .count() === 1L)
    // markdown produced and byte-equal to the reference export
    val md = java.nio.file.Files.readString(
      out.resolve(s"md/thread-$cid.md"))
    val wantMd = java.nio.file.Files.readString(java.nio.file.Paths.get(
      TestSpark.resource("/golden/sample_multi_export.md")))
    assert(md === wantMd)
    // opt-in runtime JSON-Schema validation (P2): every emitted message
    // record validates against the message contract
    val outStream = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(outStream, true, "UTF-8")) {
      assert(Main.run(Array("export", "--parsed-root", out.toString,
        "--outdir", out.toString, "--validate-schema")) === 0)
    }
    assert(outStream.toString("UTF-8")
      .contains(""""schema_records":16,"schema_invalid":0"""))
  }

  test("parse --input-format text: routed sinks match the JSON path") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the SAME logical conversations through both front doors: the
    // synthesized corpus rendered (a) as raw ChatGPT-export JSONL and
    // (b) as grok wire-format text files (one per conversation,
    // A12-ordered like the JSON path's (ts, message_id) sort)
    val turns = graft.gen.TranscriptGen.synthesize(spark, 20)
    val work = java.nio.file.Files.createTempDirectory("graft-textmode")
    val jsonIn = s"$work/raw.jsonl"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(jsonIn),
      (graft.gen.TranscriptGen.renderRawJsonl(turns).collect()
        .mkString("\n") + "\n").getBytes("UTF-8"))
    val textDir = java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$work/text"))
    val renderIn = turns.select(
      col("conv_id"), col("role"), col("tool"),
      timestamp_millis(col("ts_ms")).as("ts"), col("text"),
      // positional event id from the message id suffix keeps text-side
      // turn order identical to the JSON path's (ts, message_id) sort
      substring(col("message_id"), -6, 6).cast("long").as("event_id"))
    graft.parse.GrokParser.render(renderIn).collect().foreach { r =>
      java.nio.file.Files.write(
        textDir.resolve(s"${r.getString(0)}.txt"),
        r.getString(1).getBytes("UTF-8"))
    }
    val outJson = java.nio.file.Files.createTempDirectory("graft-tm-json")
    val outText = java.nio.file.Files.createTempDirectory("graft-tm-text")
    assert(Main.run(Array("parse", "--input", jsonIn,
      "--outdir", outJson.toString)) === 0)
    assert(Main.run(Array("parse", "--input", textDir.toString,
      "--input-format", "text", "--provider", "openai",
      "--outdir", outText.toString)) === 0)
    def sinks(out: java.nio.file.Path) = {
      val t = new graft.table.SnapshotParquetTable(
        out.resolve("openai/routed").toString).read(spark)
      t.select("conversation_id", "role", "tool_sink", "tool", "ts",
        "text")
    }
    val j = sinks(outJson)
    val t = sinks(outText)
    assert(j.count() > 0)
    assert(j.exceptAll(t).count() === 0L, "JSON-path rows missing in text path")
    assert(t.exceptAll(j).count() === 0L, "text-path rows missing in JSON path")
  }

  test("parse --resume skips unchanged threads, routed sinks stay complete") {
    val out = java.nio.file.Files.createTempDirectory("graft-resume")
    val in = TestSpark.resource("/fixtures/openai_sample_multi.json")
    assert(Main.run(Array("parse", "--input", in,
      "--outdir", out.toString)) === 0)
    val routed = new graft.table.SnapshotParquetTable(
      out.resolve("openai/routed").toString)
    val before = routed.read(spark).count()
    // second run with --resume: index says unchanged → JSONL skipped,
    // but the routed snapshot must still hold EVERY thread's rows
    // (round-1 bug: subset write under Overwrite truncated routed/)
    assert(Main.run(Array("parse", "--input", in,
      "--outdir", out.toString, "--resume")) === 0)
    assert(routed.read(spark).count() === before,
      "resume must not drop unchanged threads from routed sinks")
    val idx = graft.lineage.Lineage.readThreadIndex(spark,
      out.resolve("openai/thread_index").toString)
    assert(idx.filter(org.apache.spark.sql.functions.col("count") === 16)
      .count() === 1L) // still fully indexed
  }

  test("parse records corrupt-line count in summary and manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt")
    val in = dir.resolve("raw.jsonl")
    val good = java.nio.file.Files.readString(java.nio.file.Paths.get(
      TestSpark.resource("/fixtures/openai_sample.json")))
      .replace("\n", " ")
    java.nio.file.Files.writeString(in,
      good + "\n{broken json!!\n" + "not json at all\n")
    val outBuf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(outBuf)) {
      assert(Main.run(Array("parse", "--input", in.toString,
        "--outdir", s"$dir/out")) === 0)
    }
    assert(outBuf.toString.contains("\"corrupt_lines\":2"),
      outBuf.toString)
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/out/openai/manifest.json"))
    assert(manifest.contains("\"corrupt_lines\": 2"))
  }

  test("readRawAuto sniffs containers through the Hadoop FS (file:// URI)") {
    import graft.parse.ChatGptParser
    // single-object multiline fixture via an explicit scheme — the
    // java.nio sniffer this replaces could not open scheme'd paths
    val p = "file://" + TestSpark.resource("/fixtures/openai_sample_multi.json")
    assert(ChatGptParser.normalize(
      ChatGptParser.readRawAuto(spark, p)).count() === 16L)
    // directory of JSONL part files (the scale shape) sniffs as JSONL
    val dir = java.nio.file.Files.createTempDirectory("graft-sniff")
    graft.gen.TranscriptGen.renderRawJsonl(
      graft.gen.TranscriptGen.synthesize(spark, 5))
      .write.mode("overwrite").text(s"$dir/raw")
    assert(graft.parse.ChatGptParser.normalize(
      ChatGptParser.readRawAuto(spark, s"$dir/raw")).count() > 0L)
  }

  test("parse 10^5 conversations with a 512 MiB driver (index never collected)") {
    val base =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
        "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(base), "graft-big")
    try {
      val raw = s"$work/raw"
      graft.gen.TranscriptGen.renderRawJsonl(
        graft.gen.TranscriptGen.synthesize(spark, 100000, baseTurns = 2,
          megaFactor = 200))
        .write.mode("overwrite").text(raw)
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar")
        .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq(
        s"${System.getProperty("java.home")}/bin/java",
        "-Xmx512m", "-XX:+UseParallelGC", "-Dfile.encoding=UTF-8",
        "-Dspark.ui.enabled=false") ++ addOpens ++ Seq(
        "-cp", System.getProperty("java.class.path"),
        "graft.app.Main", "parse",
        "--input", raw, "--outdir", s"$work/out")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_CPUS", "4")
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val log = new String(proc.getInputStream.readAllBytes())
      val rc = proc.waitFor()
      assert(rc === 0, s"capped-driver parse failed:\n${log.takeRight(3000)}")
      val idx = graft.lineage.Lineage.readThreadIndex(spark,
        s"$work/out/openai/thread_index")
      assert(idx.count() === 100000L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(work).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("export of a zero-thread parsed root reports parts:0 + schema 0/0, not 99") {
    // an existing root with no thread-*/parsed.jsonl underneath: both
    // export reads glob nothing — must be an empty export, not a crash
    val root = java.nio.file.Files.createTempDirectory("graft-empty-root")
    val out = java.nio.file.Files.createTempDirectory("graft-empty-out")
    val outStream = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(outStream, true, "UTF-8")) {
      assert(Main.run(Array("export", "--parsed-root", root.toString,
        "--outdir", out.toString, "--validate-schema")) === 0)
    }
    assert(outStream.toString("UTF-8").contains(
      """"parts":0,"schema_records":0,"schema_invalid":0"""))
  }

  test("exit codes: missing input=2, missing parsed root=4, bad mode=2") {
    assert(Main.run(Array("parse", "--input", "/nope.json",
      "--outdir", "/tmp/x")) === 2)
    assert(Main.run(Array("export", "--parsed-root", "/nope",
      "--outdir", "/tmp/x")) === 4)
    assert(Main.run(Array("frobnicate")) === 2)
  }
}
