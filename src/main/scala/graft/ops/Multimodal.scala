package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side design is real and tested — schema, partitioning,
  * batched executor processing (the JVM analogue of `mapInPandas`:
  * partition iterators processed in fixed-size batches so a native
  * decoder can amortize per-batch setup). [[Codec.Real]] decodes
  * images (javax.imageio), audio headers (javax.sound.sampled) and
  * MP4 video container metadata (a pure-JVM ISO-BMFF box walk) with
  * no external libraries, and extracts REAL features for images
  * (grid luminance) and audio (grid-RMS envelope over the decoded
  * PCM stream); only VIDEO pixel features have no JVM decoder —
  * those rows fall back to [[Codec.Fake]] vectors flagged
  * `measured = false` (the documented ffmpeg/JNI integration point).
  *
  * Scale notes: media bytes dominate row size, so every stage here
  * projects metadata columns WITHOUT the blob when possible (column
  * pruning keeps the parquet scan narrow), and the blob-carrying
  * stages avoid shuffles entirely (narrow mapPartitions).
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      mime: String)

  final case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long)

  /** `measured = false` marks a feature vector that did NOT come from
    * decoding the blob (Fake codec, undecodable image, or a kind with
    * no JVM feature extractor) — so hash-derived fallback vectors can
    * never silently masquerade as measurements in a downstream
    * aggregate. */
  final case class MediaFeature(
      media_id: Long,
      feature: Array[Float],
      measured: Boolean)

  /** Decoder contract — one call per BATCH of blobs (the mapInPandas
    * batch shape), so native implementations amortize setup. */
  trait Codec extends Serializable {
    def decodeMeta(batch: Seq[MediaRecord]): Seq[MediaMeta]
    def extractFeatures(batch: Seq[MediaRecord], dim: Int): Seq[MediaFeature]
  }

  object Codec {

    /** Deterministic fake decoder: metadata and features are pure
      * functions of the bytes (FNV over content), so tests are stable
      * and the pipeline shape is fully exercised. */
    object Fake extends Codec {
      private def fnv(bytes: Array[Byte]): Long = {
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < bytes.length) {
          h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
        }
        h
      }
      override def decodeMeta(batch: Seq[MediaRecord]): Seq[MediaMeta] =
        batch.map { r =>
          val h = fnv(r.content)
          MediaMeta(r.media_id, r.kind, r.content.length.toLong,
            width = 64 + (Math.floorMod(h, 16L) * 64L).toInt,
            height = 64 + (Math.floorMod(h >>> 8, 16L) * 64L).toInt,
            duration_ms =
              if (r.kind == "image") 0L else Math.floorMod(h >>> 16, 600000L))
        }
      override def extractFeatures(
          batch: Seq[MediaRecord], dim: Int): Seq[MediaFeature] =
        batch.map { r =>
          val h = fnv(r.content)
          val f = Array.tabulate(dim) { i =>
            // deterministic pseudo-feature in [-1, 1)
            val x = h * (i * 2654435761L + 1)
            (Math.floorMod(x, 2048L) - 1024L) / 1024.0f
          }
          MediaFeature(r.media_id, f, measured = false)
        }
    }

    /** Real decoder built on JDK-only codecs — no external libraries:
      *
      *  - image: `javax.imageio` — metadata from a HEADER-ONLY
      *    ImageReader probe (no pixel decode; at blob scale decoding
      *    pixels to read width/height would dominate the stage), pixel
      *    features from a full decode + grid-averaged luminance.
      *  - audio: `javax.sound.sampled` header parse (WAV/AIFF/AU ship
      *    with the JDK) → duration from frame count / frame rate.
      *  - video: dimensions + duration from the MP4/ISO-BMFF container
      *    METADATA via [[mp4Meta]]'s box walk — real measurements, no
      *    codec required. Only video PIXEL features have no JVM
      *    decoder: those fall back to [[Fake]] vectors explicitly
      *    flagged `measured = false` (a real deployment plugs
      *    ffmpeg/JNI in right here; the batch shape is what this
      *    contract fixes). Audio features are REAL: [[audioFeatures]]
      *    grid-RMS over the decoded PCM stream.
      *
      * Undecodable blobs are per-record isolated, never task-fatal
      * (same warn-skip stance as the parser): width/height/duration -1
      * marks "decoder could not read this blob", and features fall back
      * to [[Fake]]'s content-hash features (measured = false) so the
      * row keeps flowing.
      */
    object Real extends Codec {

      private def imageDims(bytes: Array[Byte]): Option[(Int, Int)] = {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val rd = readers.next()
            try {
              rd.setInput(iis)
              Some((rd.getWidth(0), rd.getHeight(0)))
            } finally rd.dispose()
          }
        } catch { case _: Exception => None }
        finally iis.close()
      }

      /** MP4/ISO-BMFF metadata from a pure-JVM box walk — no codec
        * needed: the container format (ISO/IEC 14496-12) is a tree of
        * [size:u32][type:4cc] boxes (size==1 → u64 largesize follows).
        * Duration comes from `moov/mvhd` (u32 timescale + u32/u64
        * duration, version-dependent layout); dimensions from the
        * first `moov/trak/tkhd` with a nonzero 16.16 fixed-point
        * width/height (audio tracks carry zeros, so this finds the
        * video track). Malformed/truncated boxes → None, handled by
        * the caller as -1 sentinels. */
      private[ops] def mp4Meta(
          bytes: Array[Byte]): Option[(Int, Int, Long)] = try {
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
        // children of [start, end); returns (type, payloadStart, payloadEnd)
        def boxes(start: Int, end: Int): Iterator[(String, Int, Int)] =
          new Iterator[(String, Int, Int)] {
            private var off = start
            def hasNext: Boolean = off + 8 <= end
            def next(): (String, Int, Int) = {
              val size0 = u32(off)
              val tpe = new String(bytes, off + 4, 4, "ISO-8859-1")
              val (hdr, size) =
                if (size0 == 1L) (16, bb.getLong(off + 8))
                else if (size0 == 0L) (8, (end - off).toLong) // to EOF
                else (8, size0)
              if (size < hdr || off + size > end)
                throw new IllegalArgumentException("bad box size")
              val r = (tpe, off + hdr, off + size.toInt)
              off += size.toInt
              r
            }
          }
        val moov = boxes(0, bytes.length)
          .collectFirst { case ("moov", s, e) => (s, e) }
        moov.flatMap { case (ms, me) =>
          var durationMs = -1L
          var w = -1
          var h = -1
          boxes(ms, me).foreach {
            case ("mvhd", s, _) =>
              val v = bytes(s) & 0xff
              // v0: ver/flags(4) c(4) m(4) timescale(4) duration(4)
              // v1: ver/flags(4) c(8) m(8) timescale(4) duration(8)
              val (ts, dur) =
                if (v == 1) (u32(s + 20), bb.getLong(s + 24))
                else (u32(s + 12), u32(s + 16))
              if (ts > 0) durationMs = dur * 1000L / ts
            case ("trak", s, e) if w <= 0 =>
              boxes(s, e).foreach {
                case ("tkhd", _, te) =>
                  // width/height: the LAST two u32s of the box (16.16
                  // fixed point) in both v0 and v1 layouts
                  val tw = (u32(te - 8) >> 16).toInt
                  val th = (u32(te - 4) >> 16).toInt
                  if (tw > 0 && th > 0) { w = tw; h = th }
                case _ => ()
              }
            case _ => ()
          }
          if (durationMs >= 0 || w > 0) Some((w, h, durationMs))
          else None
        }
      } catch { case _: Exception => None }

      private def audioDurationMs(bytes: Array[Byte]): Option[Long] =
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val frames = in.getFrameLength
            val rate = in.getFormat.getFrameRate
            if (frames < 0 || rate <= 0) None
            else Some((frames * 1000.0 / rate).round)
          } finally in.close()
        } catch { case _: Exception => None }

      override def decodeMeta(batch: Seq[MediaRecord]): Seq[MediaMeta] =
        batch.map { r =>
          r.kind match {
            case "image" =>
              val (w, h) = imageDims(r.content).getOrElse((-1, -1))
              MediaMeta(r.media_id, r.kind, r.content.length.toLong,
                w, h, 0L)
            case "audio" =>
              MediaMeta(r.media_id, r.kind, r.content.length.toLong,
                0, 0, audioDurationMs(r.content).getOrElse(-1L))
            case _ =>
              // video: container METADATA is real (ISO-BMFF box walk —
              // no codec needed for mvhd/tkhd); a blob the walk cannot
              // read gets -1 sentinels, NEVER Fake's hash-derived
              // plausible-looking numbers (a profiling query over a
              // mixed corpus must not aggregate fabricated dims)
              val (w, h, d) = mp4Meta(r.content).getOrElse((-1, -1, -1L))
              MediaMeta(r.media_id, r.kind, r.content.length.toLong,
                w, h, d)
          }
        }

      /** Grid-RMS energy features for audio: decode the PCM stream
        * (WAV/AIFF/AU ship with the JDK), split the sample sequence
        * into `dim` equal time cells, and emit each cell's root-mean-
        * square amplitude scaled to [0, 1] — the standard cheap
        * envelope descriptor for audio near-dup bucketing (the audio
        * analogue of the image luminance grid). Mono-folds multi-
        * channel frames; 8/16-bit signed/unsigned PCM. */
      private def audioFeatures(
          bytes: Array[Byte], dim: Int): Option[Array[Float]] =
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = in.getFormat
            val enc = fmt.getEncoding
            val signed =
              enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val unsigned =
              enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
            val bits = fmt.getSampleSizeInBits
            val nFrames = in.getFrameLength
            if ((!signed && !unsigned) || (bits != 8 && bits != 16) ||
                nFrames <= 0) None
            else {
              val data = in.readAllBytes()
              val ch = fmt.getChannels
              val bytesPerSample = bits / 8
              val frameBytes = fmt.getFrameSize
              val n = math.min(nFrames, data.length / frameBytes).toInt
              val sumSq = new Array[Double](dim)
              val counts = new Array[Long](dim)
              val big = fmt.isBigEndian
              var f = 0
              while (f < n) {
                val cell = math.min(f.toLong * dim / n, dim - 1L).toInt
                var c = 0
                var acc = 0.0
                while (c < ch) {
                  val off = f * frameBytes + c * bytesPerSample
                  val v =
                    if (bits == 8)
                      if (signed) data(off).toDouble / 128.0
                      else ((data(off) & 0xff) - 128).toDouble / 128.0
                    else {
                      val (b0, b1) =
                        if (big) (data(off), data(off + 1))
                        else (data(off + 1), data(off))
                      val s = (b0 << 8) | (b1 & 0xff)
                      (if (signed) s else (s & 0xffff) - 32768).toDouble /
                        32768.0
                    }
                  acc += v
                  c += 1
                }
                val mono = acc / ch
                sumSq(cell) += mono * mono
                counts(cell) += 1
                f += 1
              }
              Some(Array.tabulate(dim)(i =>
                if (counts(i) > 0)
                  math.sqrt(sumSq(i) / counts(i)).toFloat
                else 0.0f))
            }
          } finally in.close()
        } catch { case _: Exception => None }

      /** Grid-averaged luminance features for images: the decoded frame
        * is divided into a ceil(sqrt(dim))² cell grid; feature i is the
        * mean ITU-R BT.601 luma of cell i scaled to [-1, 1] (cells past
        * dim are dropped; rows beyond the grid are folded by pixel
        * coverage). Deterministic, resolution-independent, and the
        * standard cheap baseline for near-dup image bucketing. */
      override def extractFeatures(
          batch: Seq[MediaRecord], dim: Int): Seq[MediaFeature] =
        batch.map { r =>
          if (r.kind == "audio")
            audioFeatures(r.content, dim)
              .map(f => MediaFeature(r.media_id, f, measured = true))
              .getOrElse(Fake.extractFeatures(Seq(r), dim).head)
          else {
          val decoded =
            if (r.kind != "image") None
            else
              try Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(r.content)))
              catch { case _: Exception => None }
          decoded match {
            case None => Fake.extractFeatures(Seq(r), dim).head
            case Some(img) =>
              val g = math.ceil(math.sqrt(dim.toDouble)).toInt
              val sums = new Array[Double](g * g)
              val counts = new Array[Long](g * g)
              val w = img.getWidth
              val h = img.getHeight
              var y = 0
              while (y < h) {
                val cy = math.min(y * g / h, g - 1)
                var x = 0
                while (x < w) {
                  val cx = math.min(x * g / w, g - 1)
                  val rgb = img.getRGB(x, y)
                  val lum = 0.299 * ((rgb >> 16) & 0xff) +
                    0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  val c = cy * g + cx
                  sums(c) += lum
                  counts(c) += 1
                  x += 1
                }
                y += 1
              }
              val f = Array.tabulate(dim) { i =>
                if (i < g * g && counts(i) > 0)
                  (sums(i) / counts(i) / 127.5 - 1.0).toFloat
                else 0.0f
              }
              MediaFeature(r.media_id, f, measured = true)
          }
          }
        }
    }

    /** Codec backed by an EXTERNAL decoder process — the
      * ffmpeg/ffprobe integration point made concrete and testable
      * (OpsSpec drives it end-to-end with a stub subprocess and gets
      * VIDEO features back `measured = true` through the same
      * MediaFeature contract the JVM codecs use).
      *
      * Invocation shape matches the [[Codec]] batch contract: ONE
      * process per batch (per-batch spawn amortizes decoder startup
      * exactly like `mapInPandas` amortizes interpreter startup;
      * batchSize bounds both pipe backlog and child memory). Protocol
      * is deliberately dumb — line-oriented, order-preserving, blobs
      * base64 on stdin:
      *
      * {{{
      * stdin:  <n>\n  then per record: "<media_id> <kind> <mime>\n"
      *         + base64(content) + "\n"
      * stdout: exactly n lines, record-ordered —
      *   meta mode:     "<width> <height> <duration_ms>" | "ERR"
      *   features mode: "OK <f1>,<f2>,..." | "ERR"
      * }}}
      *
      * Error isolation is two-level, never task-fatal: a record-level
      * "ERR"/malformed line falls back PER RECORD (meta → -1
      * sentinels, features → [[Fake]] with `measured = false`, the
      * can't-masquerade rule); a process-level failure (spawn error,
      * nonzero exit, wrong line count) falls back for the whole batch
      * the same way. stdout is drained on a reader thread while stdin
      * streams, so a child that emits as it reads cannot deadlock the
      * pipe pair. */
    final case class ExternalProcess(command: Seq[String])
        extends Codec {

      /** One batch through the child; None = process-level failure. */
      private def run(batch: Seq[MediaRecord],
          args: Seq[String]): Option[Seq[String]] =
        try {
          import scala.jdk.CollectionConverters._
          val p = new ProcessBuilder((command ++ args).asJava).start()
          val lines =
            scala.collection.mutable.ArrayBuffer.empty[String]
          val reader = new Thread(() => {
            val src = scala.io.Source
              .fromInputStream(p.getInputStream, "UTF-8")
            try src.getLines().foreach(l => lines.synchronized {
              lines += l
            })
            finally src.close()
          })
          reader.setDaemon(true)
          reader.start()
          val w = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(p.getOutputStream, "UTF-8"))
          val enc = java.util.Base64.getEncoder
          try {
            w.write(s"${batch.size}\n")
            batch.foreach { r =>
              w.write(s"${r.media_id} ${r.kind} ${r.mime}\n")
              w.write(enc.encodeToString(r.content))
              w.write("\n")
            }
          } finally w.close()
          val code = p.waitFor()
          reader.join(60000L)
          val out = lines.synchronized(lines.toVector)
          if (code == 0 && out.size == batch.size) Some(out) else None
        } catch { case _: Exception => None }

      override def decodeMeta(batch: Seq[MediaRecord]): Seq[MediaMeta] =
        run(batch, Seq("meta")) match {
          case Some(out) => batch.zip(out).map { case (r, ln) =>
            val parsed = ln.trim.split("\\s+") match {
              case Array(w, h, d) =>
                try Some((w.toInt, h.toInt, d.toLong))
                catch { case _: NumberFormatException => None }
              case _ => None
            }
            val (w, h, d) = parsed.getOrElse((-1, -1, -1L))
            MediaMeta(r.media_id, r.kind, r.content.length.toLong,
              w, h, d)
          }
          case None => batch.map(r =>
            MediaMeta(r.media_id, r.kind, r.content.length.toLong,
              -1, -1, -1L))
        }

      override def extractFeatures(
          batch: Seq[MediaRecord], dim: Int): Seq[MediaFeature] =
        run(batch, Seq("features", dim.toString)) match {
          case Some(out) => batch.zip(out).map { case (r, ln) =>
            val parsed =
              if (!ln.startsWith("OK ")) None
              else try {
                val f = ln.drop(3).split(",").map(_.trim.toFloat)
                if (f.length == dim) Some(f) else None
              } catch { case _: NumberFormatException => None }
            parsed
              .map(f => MediaFeature(r.media_id, f, measured = true))
              .getOrElse(Fake.extractFeatures(Seq(r), dim).head)
          }
          case None => Fake.extractFeatures(batch, dim)
        }
    }
  }

  /** Deterministic media corpus derived from the documents table:
    * text bytes as the opaque blob (stands in for image bytes). */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        lit("application/octet-stream").as("mime"))
      .as[MediaRecord]
  }

  /** Batched decode: partition iterator → fixed-size batches → codec.
    * Narrow (no shuffle); batchSize bounds executor memory per task. */
  def decodeMeta(
      media: Dataset[MediaRecord],
      codec: Codec = Codec.Fake,
      batchSize: Int = 256): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => codec.decodeMeta(b.toSeq))
    }
  }

  def extractFeatures(
      media: Dataset[MediaRecord],
      dim: Int = 16,
      codec: Codec = Codec.Fake,
      batchSize: Int = 256): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => codec.extractFeatures(b.toSeq, dim))
    }
  }

  /** Frame sampling plan for video rows: every `everyMs` up to
    * `maxFrames` — pure column math on metadata (no blob access), so
    * it prunes to a metadata-only scan. */
  def frameSamplePlan(
      meta: Dataset[MediaMeta],
      everyMs: Long = 1000L,
      maxFrames: Int = 8): DataFrame =
    meta.toDF()
      .filter(col("kind") === "video" && col("duration_ms") > 0)
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L),
          least((col("duration_ms") / everyMs).cast("long"),
            lit(maxFrames.toLong - 1)))).as("frame_idx"))
      .withColumn("frame_ts_ms", col("frame_idx") * everyMs)
}
