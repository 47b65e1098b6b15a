package graft.export

import java.time.{Instant, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Export stage: normalized messages → GFM Markdown with optional
  * splitting (reference: exporter.py:122-342).
  *
  * Distribution model: one conversation = one group; rendering and the
  * greedy split packer run per-group in `flatMapGroups` (the packer's
  * decision depends on the running *rendered-byte* sum, so it cannot be
  * a SQL window — SURVEY.md §2 E13). Threads are bounded (~10^4 turns
  * by the reference's own model), so materializing one thread per task
  * is safe; conversations themselves are unbounded in number and spread
  * across the cluster.
  *
  * Determinism: the reference stamps `generated_at_utc: now()` into
  * split front matter (exporter.py:320-333) making output
  * non-deterministic; callers here pass a pinned `generatedAtUtc`.
  * The reference also glues split front matter with "".join (a bug —
  * one long line, exporter.py:334); we reproduce the *no-split* format
  * and emit split front matter line-joined, documenting the divergence.
  */
object Exporter {

  final case class SplitConf(
      mode: Option[String], // size | count | auto
      sizeLimit: Option[Long],
      countLimit: Option[Int],
      softOverflow: Double = 0.20,
      hard: Boolean = false,
      tinyTailThreshold: Int = 20)

  object SplitConf {
    val none: SplitConf = SplitConf(None, None, None)

    /** Parse "size=4M" | "count=1500" | "auto" (reference:
      * exporter.py:93-120; auto = size 4M & count 1500). */
    def parse(spec: String): SplitConf = spec.trim.toLowerCase match {
      case "auto" => SplitConf(Some("auto"),
        Some(SizeExpr.parse("4M")), Some(1500))
      case s if s.startsWith("size=") => SplitConf(Some("size"),
        Some(SizeExpr.parse(s.stripPrefix("size="))), None)
      case s if s.startsWith("count=") => SplitConf(Some("count"),
        None, Some(s.stripPrefix("count=").toInt))
      case other => throw new IllegalArgumentException(
        s"invalid --split: $other")
    }
  }

  final case class MdPart(
      conversation_id: String,
      part_index: Int,
      part_total: Int,
      file_name: String,
      content: String)

  /** Row shape consumed by the exporter. */
  final case class ExportMsg(
      conversation_id: String,
      provider_id: String,
      message_id: String,
      parent_id: Option[String],
      role: String,
      ts: Option[Long],
      text: String,
      model: Option[String])

  // ---------------------------------------------------------------
  // Timestamp rendering (reference: exporter.py:13-34)
  // ---------------------------------------------------------------

  /** Heuristic: values ≥ 1e11 are epoch-ms → seconds (E5). */
  def tsToSeconds(ts: Double): Double = if (ts >= 1e11) ts / 1000.0 else ts

  /** Python datetime.fromtimestamp(sec, utc).isoformat(): microseconds
    * printed (6 digits) only when non-zero; offset "+00:00".
    * fromtimestamp rounds to microseconds half-even → math.rint. */
  def toIsoUtc(ts: Option[Double]): String = ts.map { t =>
    val sec = tsToSeconds(t)
    val micros = math.rint(sec * 1e6).toLong
    val epochSec = Math.floorDiv(micros, 1000000L)
    val micro = Math.floorMod(micros, 1000000L)
    val zdt = ZonedDateTime.ofInstant(
      Instant.ofEpochSecond(epochSec, micro * 1000L), ZoneId.of("UTC"))
    val base = zdt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
    val frac = if (micro == 0) "" else f".$micro%06d"
    s"$base$frac+00:00"
  }.getOrElse("")

  /** Local "%Y-%m-%d %H:%M" (E7). */
  def toLocalHuman(ts: Option[Double], tz: ZoneId): String = ts.map { t =>
    val sec = tsToSeconds(t)
    val micros = math.rint(sec * 1e6).toLong
    val zdt = ZonedDateTime.ofInstant(
      Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L) * 1000L), tz)
    zdt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm"))
  }.getOrElse("")

  /** Quoted YAML array (E8). */
  def asYamlList(items: Seq[String]): String =
    items.map(s => "\"" + s + "\"").mkString("[", ", ", "]")

  /** One message block (reference: exporter.py:182-206). */
  def renderBlock(m: ExportMsg, tz: ZoneId, formatting: String): String = {
    val tsHuman = toLocalHuman(m.ts.map(_.toDouble), tz)
    val text =
      if (formatting == "none") m.text else LightFormatter.render(m.text)
    val metaLines = Seq(
      if (m.message_id.nonEmpty) Some(s"- message_id: ${m.message_id}")
      else None,
      m.parent_id.filter(_.nonEmpty).map(p => s"- parent_id: $p")).flatten
    val meta =
      if (metaLines.nonEmpty) metaLines.mkString("\n") + "\n\n" else ""
    s"## [${m.role}] $tsHuman\n$meta$text\n\n"
  }

  /** Windows-reserved chars + control chars → _, whitespace collapsed,
    * length-capped (reference: utils.py:41-51). The cap mirrors Python
    * slicing exactly: `root[:maxLen-len(ext)-3]` with a NEGATIVE bound
    * drops characters from the end (a naive substring threw
    * StringIndexOutOfBounds when the extension alone exceeded
    * maxLen-3, failing the whole export task). */
  def sanitizeFilename(name: String, maxLen: Int = 120): String = {
    var n = name.replaceAll("[<>:\"/\\\\|?*\\x00-\\x1F]", "_")
    n = n.replaceAll("\\s+", " ").trim
    if (n.length > maxLen) {
      val (root, ext) =
        if (n.contains(".")) {
          val i = n.lastIndexOf('.')
          (n.substring(0, i), n.substring(i))
        } else (n, "")
      val bound = maxLen - ext.length - 3
      val cut =
        if (bound >= 0) math.min(bound, root.length)
        else math.max(0, root.length + bound)
      n = root.substring(0, cut) + "..." + ext
    }
    n
  }

  /** Part file name for a conversation. When sanitization had to alter
    * the raw name, distinct cids can collide onto one file name and the
    * executor-side REPLACE_EXISTING write would last-writer-win
    * nondeterministically — so a deterministic disambiguator derived
    * from the ORIGINAL cid is appended (clean cids keep the exact
    * reference naming). */
  def partFileName(cid: String, suffix: String): String = {
    val raw = s"thread-$cid$suffix.md"
    val safe = sanitizeFilename(raw)
    if (safe == raw) safe
    else {
      val h = f"${scala.util.hashing.MurmurHash3.stringHash(cid)}%08x"
      val dot = safe.lastIndexOf('.')
      val (root, ext) =
        if (dot < 0) (safe, "") else (safe.substring(0, dot),
          safe.substring(dot))
      // cap the root BEFORE appending so the name stays within the
      // length limit AND the disambiguator always survives (a re-cap
      // afterwards would truncate the hash away and reopen collisions)
      val budget = math.max(1, 120 - ext.length - h.length - 1)
      val capped = if (root.length > budget) root.substring(0, budget)
                   else root
      s"$capped-$h$ext"
    }
  }

  // ---------------------------------------------------------------
  // Thread assembly + split packer (reference: exporter.py:239-342)
  // ---------------------------------------------------------------

  private def utf8Len(s: String): Int =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length

  /** Greedy packer over rendered blocks (E13) — byte accounting with
    * 1024B front-matter approximation (or exact re-render in hard
    * mode), soft overflow +20%, tiny-tail merge. Returns block index
    * ranges per part. Verified golden: 50 msgs, count=10, tail 20 →
    * parts 10/10/30.
    */
  def packBlocks(blocks: IndexedSeq[String], conf: SplitConf,
      hardFmLen: Int => Int = _ => 1024): IndexedSeq[IndexedSeq[Int]] = {
    val sizeLimit = conf.sizeLimit
    val countLimit = conf.countLimit
    val fmApprox = 1024
    val parts = scala.collection.mutable.ArrayBuffer.empty[IndexedSeq[Int]]
    var buf = scala.collection.mutable.ArrayBuffer.empty[Int]
    var bufBytes = 0L

    def flush(): Unit = if (buf.nonEmpty) {
      parts += buf.toIndexedSeq
      buf = scala.collection.mutable.ArrayBuffer.empty[Int]
      bufBytes = 0L
    }

    def hardWillOverflow(blockIdx: Int): Boolean = sizeLimit.exists { lim =>
      if (conf.hard) {
        val fm = hardFmLen(buf.length + 1)
        val body = buf.map(blocks(_)).map(utf8Len).sum +
          utf8Len(blocks(blockIdx))
        fm + body > lim
      } else bufBytes + utf8Len(blocks(blockIdx)) + fmApprox > lim
    }

    var i = 0
    while (i < blocks.length) {
      val bsz = utf8Len(blocks(i))
      val overSize = sizeLimit.isDefined && hardWillOverflow(i)
      val overCount = !overSize && countLimit.exists(buf.length >= _)
      if (overSize || overCount) {
        val withinSoft = sizeLimit.exists { lim =>
          !overCount &&
            bufBytes + bsz + fmApprox <= (lim * (1 + conf.softOverflow)).toLong
        }
        val smallTail = blocks.length - (i + 1) <= conf.tinyTailThreshold
        if (!conf.hard && (withinSoft || smallTail)) {
          buf += i; bufBytes += bsz
          i += 1
        } else {
          flush()
          buf += i; bufBytes += bsz
          i += 1
        }
      } else {
        buf += i; bufBytes += bsz
        i += 1
      }
    }
    flush()
    if (parts.isEmpty) IndexedSeq(blocks.indices)
    else parts.toIndexedSeq
  }

  /** Render one whole thread to its Markdown parts. */
  def renderThread(
      cid: String,
      msgs: Seq[ExportMsg],
      tz: ZoneId,
      formatting: String,
      split: SplitConf,
      generatedAtUtc: String): Seq[MdPart] = {
    val sorted = msgs.sortBy(m => (m.ts.isEmpty, m.ts, m.message_id))
    val provider = sorted.headOption.map(_.provider_id).getOrElse("unknown")
    val models = sorted.flatMap(_.model).distinct.sorted
    val tss = sorted.flatMap(_.ts)
    val tsMin = tss.minOption.map(_.toDouble)
    val tsMax = tss.maxOption.map(_.toDouble)
    val blocks = sorted.map(renderBlock(_, tz, formatting)).toIndexedSeq

    if (split.mode.isEmpty) {
      val fm = Seq(
        "---",
        s"thread: $cid",
        s"provider: $provider",
        s"messages: ${sorted.size}",
        s"models: ${asYamlList(models)}",
        s"range: ${toIsoUtc(tsMin)} 〜 ${toIsoUtc(tsMax)}",
        "---",
        "")
      val md = fm.mkString("\n") + blocks.mkString
      return Seq(MdPart(cid, 1, 1, partFileName(cid, ""), md))
    }

    def fmLines(msgCount: Int, partIdx: Int, partTotal: Int): Seq[String] =
      splitFmLines(cid, provider, models, tsMin, tsMax, msgCount,
        partIdx, partTotal, generatedAtUtc, tz)

    val hardFm = (n: Int) =>
      utf8Len(fmLines(n, 1, 0).mkString("\n"))
    val ranges = packBlocks(blocks, split, hardFm)
    val total = ranges.length
    ranges.zipWithIndex.map { case (idxs, p) =>
      val page = fmLines(idxs.length, p + 1, total).mkString("\n") +
        idxs.map(blocks(_)).mkString
      val suffix = if (total == 1) "" else f"__part${p + 1}%02d"
      MdPart(cid, p + 1, total, partFileName(cid, suffix), page)
    }
  }

  /** Split-mode front matter (reference: exporter.py:320-333; shared by
    * renderThread and the no-write preview so hard-mode byte accounting
    * agrees between them). */
  private def splitFmLines(
      cid: String, provider: String, models: Seq[String],
      tsMin: Option[Double], tsMax: Option[Double], msgCount: Int,
      partIdx: Int, partTotal: Int, generatedAtUtc: String,
      tz: ZoneId): Seq[String] =
    Seq(
      "---",
      s"thread: $cid",
      s"provider: $provider",
      s"models: ${asYamlList(models)}",
      s"message_count: $msgCount",
      s"range: ${toIsoUtc(tsMin)} 〜 ${toIsoUtc(tsMax)}",
      s"part_index: $partIdx",
      s"part_total: $partTotal",
      s"generated_at_utc: $generatedAtUtc",
      s"tz: ${tz.getId}",
      "---",
      "")

  /** Distributed export: group by conversation, render + pack per
    * group. Input needs columns: conversation_id, provider_id,
    * message_id, parent_id, role, ts, text [, model]. */
  def exportThreads(
      msgs: DataFrame,
      tz: String = "UTC",
      formatting: String = "light",
      split: SplitConf = SplitConf.none,
      generatedAtUtc: String = "1970-01-01T00:00:00+00:00")
      : Dataset[MdPart] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    val withModel =
      if (msgs.columns.contains("model")) msgs
      else msgs.withColumn("model", lit(null).cast("string"))
    val zoneId = tz
    withModel
      .select("conversation_id", "provider_id", "message_id", "parent_id",
        "role", "ts", "text", "model")
      .as[ExportMsg]
      .groupByKey(_.conversation_id)
      .flatMapGroups { (cid, it) =>
        renderThread(cid, it.toSeq, ZoneId.of(zoneId), formatting, split,
          generatedAtUtc).iterator
      }
  }

  /** Split preview (E14, reference: exporter.py:211-219): per-thread
    * part estimate WITHOUT writing anything. Blocks are rendered (byte
    * sizes are what the packer decides on) and the REAL packer runs, so
    * `n_parts` equals exactly what writeParts would produce;
    * `est_parts_by_size` is the reference's cheap total/limit estimate
    * for comparison. */
  final case class PartPreview(
      conversation_id: String,
      n_messages: Int,
      total_bytes: Long,
      n_parts: Int,
      est_parts_by_size: Int)

  def previewThreads(
      msgs: DataFrame,
      tz: String = "UTC",
      formatting: String = "light",
      split: SplitConf = SplitConf.none,
      generatedAtUtc: String = "1970-01-01T00:00:00+00:00")
      : Dataset[PartPreview] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    val withModel =
      if (msgs.columns.contains("model")) msgs
      else msgs.withColumn("model", lit(null).cast("string"))
    val zoneId = tz
    withModel
      .select("conversation_id", "provider_id", "message_id", "parent_id",
        "role", "ts", "text", "model")
      .as[ExportMsg]
      .groupByKey(_.conversation_id)
      .mapGroups { (cid, it) =>
        val zone = ZoneId.of(zoneId)
        val msgsSeq = it.toSeq
        val sorted = msgsSeq.sortBy(m => (m.ts.isEmpty, m.ts, m.message_id))
        val provider =
          sorted.headOption.map(_.provider_id).getOrElse("unknown")
        val models = sorted.flatMap(_.model).distinct.sorted
        val tss = sorted.flatMap(_.ts)
        val blocks =
          sorted.map(renderBlock(_, zone, formatting)).toIndexedSeq
        val total = blocks.map(utf8Len(_).toLong).sum
        val nParts =
          if (split.mode.isEmpty) 1
          else {
            val hardFm = (n: Int) => utf8Len(splitFmLines(cid, provider,
              models, tss.minOption.map(_.toDouble),
              tss.maxOption.map(_.toDouble), n, 1, 0, generatedAtUtc,
              zone).mkString("\n"))
            packBlocks(blocks, split, hardFm).length
          }
        val est = split.sizeLimit
          .map(l => math.max(1, math.ceil(total.toDouble / l).toInt))
          .getOrElse(1)
        PartPreview(cid, sorted.size, total, nParts, est)
      }
  }

  /** Write parts as files (executor-side, through the Hadoop FS of
    * outDir's scheme), atomic per file; returns the number of parts
    * written, counted by accumulator inside this single pass — no
    * second execution of the render+pack pipeline. */
  def writeParts(parts: Dataset[MdPart], outDir: String): Long = {
    val acc = parts.sparkSession.sparkContext.longAccumulator("md_parts")
    val scheme = Option(new org.apache.hadoop.fs.Path(outDir)
      .toUri.getScheme)
    val local = scheme.isEmpty || scheme.contains("file")
    val confOverlay =
      if (local) Map.empty[String, String]
      else graft.util.HadoopConfs.capture(
        parts.sparkSession.sessionState.newHadoopConf())
    parts.foreachPartition { (it: Iterator[MdPart]) =>
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      if (local) {
        // java.nio fast path for local schemes (Hadoop LocalFileSystem
        // costs ~45 ms per small file — see Router.writeThreadJsonl)
        val dir = java.nio.file.Paths.get(outDir.stripPrefix("file:"))
        java.nio.file.Files.createDirectories(dir)
        it.foreach { p =>
          val tmp = dir.resolve(p.file_name + ".tmp")
          java.nio.file.Files.write(tmp, p.content.getBytes(utf8))
          java.nio.file.Files.move(tmp, dir.resolve(p.file_name),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          acc.add(1L)
        }
      } else {
        val conf = graft.util.HadoopConfs.restore(confOverlay)
        val dir = new org.apache.hadoop.fs.Path(outDir)
        val fs = dir.getFileSystem(conf)
        fs.mkdirs(dir)
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          dir.toUri, conf)
        it.foreach { p =>
          val tmp = new org.apache.hadoop.fs.Path(dir, p.file_name + ".tmp")
          val out = fs.create(tmp, true)
          try out.write(p.content.getBytes(utf8)) finally out.close()
          fc.rename(tmp, new org.apache.hadoop.fs.Path(dir, p.file_name),
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          acc.add(1L)
        }
      }
    }
    acc.value
  }
}
