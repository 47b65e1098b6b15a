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
    // routed sinks exist with partition pruning layout
    assert(java.nio.file.Files.exists(
      out.resolve("openai/routed/role=assistant")))
    // manifest counts
    val manifest = java.nio.file.Files.readString(
      out.resolve("openai/manifest.json"))
    assert(manifest.contains("\"count\": 16"))
    assert(manifest.contains("\"partitions\""))
    // markdown produced and byte-equal to the reference export
    val md = java.nio.file.Files.readString(
      out.resolve(s"md/thread-$cid.md"))
    val wantMd = java.nio.file.Files.readString(java.nio.file.Paths.get(
      TestSpark.resource("/golden/sample_multi_export.md")))
    assert(md === wantMd)
  }

  test("parse --resume skips unchanged threads") {
    val out = java.nio.file.Files.createTempDirectory("graft-resume")
    val in = TestSpark.resource("/fixtures/openai_sample_multi.json")
    assert(Main.run(Array("parse", "--input", in,
      "--outdir", out.toString)) === 0)
    // second run with --resume: manifest says unchanged → skipped
    val errBuf = new java.io.ByteArrayOutputStream()
    assert(Main.run(Array("parse", "--input", in,
      "--outdir", out.toString, "--resume")) === 0)
    val manifest = java.nio.file.Files.readString(
      out.resolve("openai/manifest.json"))
    assert(manifest.contains("\"count\": 16")) // still fully indexed
  }

  test("exit codes: missing input=2, missing parsed root=4, bad mode=2") {
    assert(Main.run(Array("parse", "--input", "/nope.json",
      "--outdir", "/tmp/x")) === 2)
    assert(Main.run(Array("export", "--parsed-root", "/nope",
      "--outdir", "/tmp/x")) === 4)
    assert(Main.run(Array("frobnicate")) === 2)
  }
}
