package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.agg.Aggregates
import graft.export.Exporter
import graft.lineage.Lineage
import graft.model.Schemas
import graft.parse.ChatGptParser
import graft.pipeline.TurnOrdering
import graft.route.Router

/** spark-submit entry point: `parse | export | chain` job modes
  * (reference CLI: cli.py:87-190; exit-code contract cli.py:431-439 —
  * 2 = input path, 4 = parsed-root missing, 99 = unexpected).
  *
  * Usage:
  *   graft.app.Main parse  --input FILE --outdir DIR [--provider P]
  *                         [--input-format json|text] [--resume]
  *                         [--locale en|ja]
  *   graft.app.Main export --parsed-root DIR --outdir DIR [--tz TZ]
  *                         [--formatting light|none] [--split SPEC]
  *                         [--validate-schema]
  *   graft.app.Main chain  --input FILE --outdir DIR [export opts]
  */
object Main {

  private final class UsageError(msg: String) extends RuntimeException(msg)

  def main(args: Array[String]): Unit = {
    val code =
      try run(args)
      catch {
        case e: UsageError =>
          System.err.println(e.getMessage)
          2
        case e: java.nio.file.NoSuchFileException =>
          System.err.println(
            I18n.msg("cli.error.path", "detail" -> e.getMessage))
          2
        case e: SecurityException =>
          System.err.println(
            I18n.msg("cli.error.permission", "detail" -> e.getMessage))
          3
        case e: Throwable =>
          System.err.println(I18n.msg("cli.error.unexpected",
            "detail" -> s"${e.getClass.getName}: ${e.getMessage}"))
          99
      }
    if (code != 0) sys.exit(code)
  }

  private def opt(args: Array[String], name: String): Option[String] =
    args.sliding(2).collectFirst {
      case Array(k, v) if k == s"--$name" => v
    }

  private def req(args: Array[String], name: String): String =
    opt(args, name).getOrElse(throw new UsageError(
      I18n.msg("cli.opt.required", "name" -> name)))

  private def flag(args: Array[String], name: String): Boolean =
    args.contains(s"--$name")

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // under spark-submit the master comes from the launcher; standalone
    // (sbt runMain / tests) falls back to local
    val withMaster =
      if (sys.props.contains("spark.master")) b else b.master(s"local[$cpus]")
    withMaster.getOrCreate()
  }

  def run(args: Array[String]): Int = {
    // locale before any message can fire (reference: cli.py set_locale
    // on entry; --locale > LLP_LOCALE > en)
    I18n.setLocale(opt(args, "locale"))
    if (args.isEmpty) {
      System.err.println(I18n.msg("cli.usage"))
      return 2
    }
    val spark = session()
    spark.sparkContext.setLogLevel("WARN")
    args.head match {
      case "parse" => parseMode(spark, args)
      case "export" => exportMode(spark, args)
      case "chain" =>
        val rc = parseMode(spark, args)
        if (rc != 0) rc
        else exportMode(spark,
          args ++ Array("--parsed-root", opt(args, "outdir").get))
      case other =>
        System.err.println(I18n.msg("cli.unknown_mode", "mode" -> other))
        2
    }
  }

  /** Path existence through the Hadoop FS of the path's scheme (local
    * java.nio checks would wrongly 404 hdfs:/s3a: inputs). */
  private def fsExists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sessionState.newHadoopConf()).exists(path)
  }

  /** parse: raw export JSON → normalized messages → per-thread JSONL +
    * routed (role, tool) snapshot sinks + distributed thread index +
    * pointer manifest with per-partition lineage.
    */
  def parseMode(spark: SparkSession, args: Array[String]): Int = {
    import spark.implicits._
    val input = req(args, "input")
    val outdir = req(args, "outdir")
    val provider = opt(args, "provider").getOrElse("openai")
    if (!fsExists(spark, input)) {
      System.err.println(
        I18n.msg("cli.parse.input_missing", "path" -> input))
      return 2
    }

    // parse-failure counter rides the SAME scan via observe (an extra
    // corruptRows() pass would re-parse all the raw input); the metric
    // materializes with the routed write action below
    // unique name: repeated parse runs in one session (chain, tests)
    // must not collide on the listener registration
    val obs = new org.apache.spark.sql.Observation(
      "parse_metrics_" + java.util.UUID.randomUUID())
    val msgs = opt(args, "input-format").getOrElse("json") match {
      case "json" =>
        val raw = ChatGptParser.readRawAuto(spark, input)
        val rawObserved = raw.observe(obs,
          count(when(col("_corrupt_record").isNotNull &&
            col("mapping").isNull, 1)).as("corrupt_lines"))
        ChatGptParser.normalize(rawObserved, provider)
      case "text" =>
        // plain-text transcript logs (grok wire format): one document
        // per FILE, conv id = file stem; turns with malformed headers
        // (null role/ts) are the text path's corrupt lines — counted on
        // the pre-filter frame, warn-skipped like the JSON path
        val docs = spark.read.option("wholetext", "true").text(input)
          .select(
            regexp_extract(input_file_name(),
              "([^/]+?)(\\.[^./]*)?$", 1).as("conv_id"),
            col("value").as("raw"))
        val parsed = graft.parse.GrokParser.parse(docs).observe(obs,
          count(when(col("role").isNull || col("ts_ms").isNull, 1))
            .as("corrupt_lines"))
        graft.parse.GrokParser.toMessages(parsed, provider)
      case other => throw new UsageError(
        I18n.msg("cli.parse.bad_format", "format" -> other))
    }

    val providerDir = s"$outdir/$provider"
    val manifestPath = s"$providerDir/manifest.json"
    val indexRoot = s"$providerDir/thread_index"

    // ONE pass over the raw JSON for the parse → routed snapshot write
    // itself. Every downstream stage (stats, index, JSONL, lineage,
    // summary) reads the COLUMNAR routed table back instead of
    // re-parsing raw JSON or caching the whole corpus in executor
    // memory (a full-corpus .cache() at the 10^12-turn target is most
    // of the cluster's RAM; parquet re-reads are pruned and cheap). The
    // snapshot commit also means a crashed run leaves the previous
    // routed tree readable and a --resume can never truncate unchanged
    // threads (round-1 bug).
    //
    // Adaptive-salting hot detection is the one exception to the single
    // scan, and only on FIRST runs: a resumed run derives the hot set
    // for free from the previous thread index (per-conversation counts
    // already on disk), while a first run pays one extra counting scan
    // of the input, column-pruned to conversation_id (turn counts don't
    // exist anywhere before the first parse; set --hot-threshold 0 to
    // trade that scan for hot-conversation write skew).
    val hotThreshold = opt(args, "hot-threshold").map(_.toLong)
      .getOrElse(10000L) // ~ the reference's own max-thread-size model
    val prevIndex =
      if (flag(args, "resume") && Lineage.threadIndexExists(spark, indexRoot))
        Some(Lineage.readThreadIndex(spark, indexRoot))
      else None
    val hotSet = prevIndex.map(_.filter(col("count") >= hotThreshold)
      .select("conversation_id"))
    val routedData = Router.writeRoutedSinks(msgs, providerDir,
      hotThreshold = hotThreshold, hotSet = hotSet)
    // `tool` itself is a regular column in the routed files; only
    // (role, tool_sink) are partition directories
    val routed = spark.read.parquet(routedData)
    val stats = Aggregates.threadStats(routed)

    // resume: conversations unchanged vs the previous thread index are
    // skipped for the per-thread JSONL rewrite only. No broadcast
    // hint — on a first resume after large drift `changed` is
    // corpus-sized; AQE picks broadcast when it is actually small.
    val (toProcess, skipped) = prevIndex match {
      case Some(prev) =>
        val changed = Lineage.changedThreads(stats, prev)
          .select("conversation_id")
        val n = stats.count() - changed.count()
        (routed.join(changed, Seq("conversation_id")), n)
      case None => (routed, 0L)
    }

    val typed = toProcess
      .select(Schemas.messageColumns.map(col): _*)
      .as[Schemas.Message]
    Router.writeThreadJsonl(typed, outdir, provider)

    // thread index: distributed snapshot table — ALL threads (fixes the
    // reference bug of not re-indexing skipped ones, parser.py:271-274);
    // the driver holds only the bounded per-partition lineage + pointer
    Lineage.writeThreadIndex(stats, indexRoot)
    val partitions = Lineage.capturePartitions(routed).collect().toSeq
    val summary = Aggregates.runSummary(routed).head()
    val corrupt = obs.get.getOrElse("corrupt_lines", 0L) match {
      case n: Long => n
      case _ => 0L
    }
    Lineage.writeManifest(manifestPath, provider, summary.getLong(0),
      "thread_index", partitions, corruptLines = corrupt,
      hadoopConf = spark.sessionState.newHadoopConf())

    println(s"""{"mode":"parse","threads":${summary.getLong(0)},""" +
      s""""messages":${summary.getLong(1)},"skipped_threads":$skipped,""" +
      s""""corrupt_lines":$corrupt}""")
    // human summary on stderr, localized; stdout JSON stays stable
    System.err.println(I18n.msg("cli.parse.done",
      "threads" -> summary.getLong(0), "messages" -> summary.getLong(1)))
    0
  }

  /** export: parsed JSONL tree → Markdown files (split-aware). */
  def exportMode(spark: SparkSession, args: Array[String]): Int = {
    val root = req(args, "parsed-root")
    val outdir = opt(args, "export-outdir")
      .getOrElse(req(args, "outdir"))
    if (!fsExists(spark, root)) {
      System.err.println(
        I18n.msg("cli.export.root_missing", "path" -> root))
      return 4
    }
    val tz = opt(args, "tz").getOrElse("UTC")
    val formatting = opt(args, "formatting").getOrElse("light")
    val split = opt(args, "split").map(Exporter.SplitConf.parse)
      .getOrElse(Exporter.SplitConf.none)

    // a parse run that produced zero threads leaves the JSONL glob
    // empty, and both reads below throw path-not-found on an empty
    // glob — that is a legitimate empty export (parts:0, schema 0/0),
    // not an exit-99 crash
    val jsonlGlob = s"$root/*/thread-*/parsed.jsonl"
    val globPath = new org.apache.hadoop.fs.Path(jsonlGlob)
    val nJsonl = Option(globPath
      .getFileSystem(spark.sessionState.newHadoopConf())
      .globStatus(globPath)).map(_.length).getOrElse(0)
    if (nJsonl == 0) {
      val zeroSchema = if (flag(args, "validate-schema"))
        ""","schema_records":0,"schema_invalid":0""" else ""
      println(s"""{"mode":"export","parts":0$zeroSchema}""")
      System.err.println(I18n.msg("cli.export.done", "parts" -> 0))
      return 0
    }

    val schema = StructType(Seq(
      StructField("record_type", StringType),
      StructField("provider_id", StringType),
      StructField("conversation_id", StringType),
      StructField("message_id", StringType),
      StructField("parent_id", StringType),
      StructField("role", StringType),
      StructField("ts", LongType),
      StructField("text", StringType),
      StructField("meta", StructType(Seq(StructField("model", StringType))))))
    val rows = spark.read.schema(schema)
      .option("encoding", "UTF-8")
      .json(jsonlGlob)
      .filter(col("record_type") === "message")
      .withColumn("model", col("meta.model"))
      .drop("meta", "record_type")

    val parts = Exporter.exportThreads(rows, tz, formatting, split)
    // writeParts counts via an accumulator inside the single write pass
    // (a separate parts.count() re-executed the whole render+pack
    // pipeline — round-1 double render)
    val nParts = Exporter.writeParts(parts, s"$outdir/md")

    // opt-in runtime JSON-Schema validation of the JSONL records being
    // exported (reference: schema_validation.py is likewise opt-in);
    // one extra narrow text scan, only when requested
    val validated = if (flag(args, "validate-schema")) {
      val lines = spark.read.text(jsonlGlob)
        .filter(col("value").contains("\"record_type\": \"message\""))
      val r = graft.parse.SchemaContract.summarize(
        graft.parse.SchemaContract.validateJsonl(lines)).head()
      s""","schema_records":${r.getLong(0)},"schema_invalid":${r.getLong(1)}"""
    } else ""
    println(s"""{"mode":"export","parts":$nParts$validated}""")
    System.err.println(I18n.msg("cli.export.done", "parts" -> nParts))
    0
  }
}
