package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns + typed metadata, with decode /
  * feature-extract / resize / frame-sample as per-partition batch
  * operators.
  *
  * The IMAGE path carries a REAL codec ([[ImageIoCodec]], JVM
  * built-in javax.imageio): each row's content is rendered to an
  * actual PNG whose planned dimensions derive from the content hash,
  * then ImageIO DECODES the PNG and the decoded width/height/bands
  * flow downstream — a full encode->decode round trip per row inside
  * the same mapPartitions seam, hash-gated because the oracle can
  * predict the planned dims (x01). The AUDIO path likewise carries
  * a real codec ([[WavCodec]], JVM built-in javax.sound.sampled — a
  * genuine 16-bit PCM WAV rendered per plan and AudioSystem-decoded
  * per row, x06). The VIDEO path carries [[AviCodec]]: a genuine
  * MJPEG-in-AVI file per plan (in-repo RIFF container writer/parser —
  * AVI is a public Microsoft RIFF format — around javax.imageio's
  * real JPEG codec for every frame), decoded per row by walking the
  * movi chunk list and ImageIO-decoding each frame (x11).
  * Everything around the kernels — binary schema, partition-batched
  * iteration, operator signatures, metadata propagation — is the
  * real distributed plumbing and is oracle-verified.
  *
  * 100 TB notes: media rows are large and skew-prone — the operators
  * keep content opaque (no driver collection), process partition-
  * locally (mapPartitions, one codec init per partition, the Pandas-
  * UDF batching pattern), and emit compact metadata so downstream
  * filtering prunes content columns at the parquet scan.
  */
object Multimodal {

  /** Get-first memoization for the codec byte caches: ConcurrentHashMap
    * .computeIfAbsent bin-locks even on PRESENT keys when bins collide
    * (JDK-8161372) — with 32 threads hammering a few hot keys that
    * serializes the whole pass, so the lock-free read goes first. */
  private def memo(
      cache: java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]],
      key: Long)(render: => Array[Byte]): Array[Byte] = {
    val hit = cache.get(key)
    if (hit != null) hit
    else cache.computeIfAbsent(key, _ => render)
  }

  /** The content-hash PLANNER shared by every modality: the first 60
    * bits of md5(content), which a SQL oracle reproduces as
    * CAST('0x' || substr(md5(text),1,15) AS BIGINT). Each codec's
    * `plan` derives the media shape from this hash, the synthesizer
    * renders a REAL file of that shape, and the decoder's output is
    * what flows downstream — so a gate match proves decode agreed
    * with plan.
    */
  object StubCodec {
    def hash60(bytes: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v >>> 4
    }
  }

  /** The platform's real image readers, resolved ONCE per JVM — the
    * x06 AudioSystem lesson, image edition. `ImageIO.read(InputStream)`
    * pays a full provider scan per call (each SPI probes the stream)
    * AND, with the default `useCache=true`, spools every stream to a
    * TEMP FILE before the codec sees a byte — per-row temp-file
    * create/write/delete churn that contends on filesystem metadata
    * under a loaded 32-thread suite (x01 read 14–17 s in-suite at
    * engine sf1 vs ~5 s isolated through it). Here the format's
    * `ImageReaderSpi` is looked up once and each call gets a fresh
    * reader instance (ImageReader is not thread-safe) over a
    * memory-backed stream: the per-row path is allocation-only.
    */
  private object ImageRead {
    import javax.imageio.spi.ImageReaderSpi

    private def spiFor(format: String): ImageReaderSpi = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName(format)
      require(it.hasNext, s"no $format ImageReader in this JVM")
      it.next().getOriginatingProvider
    }
    private lazy val pngSpi = spiFor("png")
    private lazy val jpegSpi = spiFor("jpeg")

    // ImageReader is not thread-safe but IS reusable: setInput(next)
    // resets it. One reader per (thread, format) turns the per-frame
    // cost into pure parse+decode — reader construction dominated
    // tiny-frame MJPEG decode once x29 went corpus-sized (17 avg
    // frames/doc of ~44x44: measured 2.7 ms/doc with per-frame
    // createReaderInstance, ~0.8 ms/doc reusing readers).
    private val pngReader = new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue() = pngSpi.createReaderInstance()
    }
    private val jpegReader = new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue() = jpegSpi.createReaderInstance()
    }

    private def read(tl: ThreadLocal[javax.imageio.ImageReader],
        bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val reader = tl.get()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, true, true)
        reader.read(0)
      } catch { case e: Throwable =>
        // a reader that threw mid-parse may hold corrupt state —
        // replace it rather than reuse it
        reader.dispose()
        tl.remove()
        throw e
      } finally { iis.close() }
    }

    def png(bytes: Array[Byte]): java.awt.image.BufferedImage =
      read(pngReader, bytes)
    def jpeg(bytes: Array[Byte]): java.awt.image.BufferedImage =
      read(jpegReader, bytes)
  }

  /** REAL image codec binding (javax.imageio — public, in every JVM).
    * The corpus has no media files, so content is first RENDERED to a
    * genuine PNG whose dimensions/bands derive from the content hash
    * with the same arithmetic a SQL oracle can replay; ImageIO then
    * decodes that PNG and the DECODED metadata is what the operator
    * emits. A gate match therefore proves the decoder actually ran
    * and agreed with the plan — not that the plan was copied through.
    */
  object ImageIoCodec {
    import java.awt.image.BufferedImage

    /** Planned (width, height, bands) from a 60-bit content hash:
      * sides in [16, 79], bands in {1 gray, 3 RGB, 4 RGBA} — the PNG
      * channel layouts a JVM BufferedImage round-trips losslessly. */
    def plan(h: Long): (Int, Int, Int) =
      (((h % 64) + 16).toInt, (((h / 64) % 64) + 16).toInt,
        (h % 3) match { case 0 => 1; case 1 => 3; case _ => 4 })

    /** Render the planned image with a deterministic pixel pattern
      * and encode it as real PNG bytes.
      *
      * The bytes are a PURE function of the plan (w, ht, bands) — the
      * pixel pattern is position-derived — so synthesis memoizes
      * JVM-wide: at most 64*64*3 distinct plans of a few KB each
      * (~25 MB ceiling). A real pipeline READS stored media rather
      * than rendering it, so the per-row cost that must stay per-row
      * is the DECODE; per-row encodes put x01 at 17 s on the engine
      * sf1 suite (deflate + per-pixel setRGB), decode-only is ~3 s. */
    def synthesizePng(h: Long): Array[Byte] = {
      val (w, ht, bands) = plan(h)
      memo(pngCache, (w.toLong << 32) | (ht.toLong << 8) | bands.toLong)(
        renderPng(w, ht, bands))
    }

    private val pngCache =
      new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()

    private def renderPng(w: Int, ht: Int, bands: Int): Array[Byte] = {
      val img = new BufferedImage(w, ht, bands match {
        case 1 => BufferedImage.TYPE_BYTE_GRAY
        case 3 => BufferedImage.TYPE_3BYTE_BGR
        case _ => BufferedImage.TYPE_4BYTE_ABGR
      })
      // all three types back onto a DataBufferByte: fill the raster
      // directly (setRGB pays per-pixel sync + color conversion)
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData
      var i = 0
      while (i < data.length) { data(i) = (i * 31 + 7).toByte; i += 1 }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** The real decode: (width, height, raster bands) off the PNG,
      * through the once-resolved reader SPI (see [[ImageRead]]). */
    def decode(png: Array[Byte]): (Int, Int, Int) = {
      val img = ImageRead.png(png)
      (img.getWidth, img.getHeight, img.getRaster.getNumBands)
    }
  }

  /** REAL audio codec binding (javax.sound.sampled — public, in
    * every JVM): the [[ImageIoCodec]] pattern for WAV. Content hash
    * plans (sampleRate, durationMs, channels); a genuine 16-bit PCM
    * WAV of that shape is synthesized (memoized — WAV bytes are a
    * pure function of the plan, 96 distinct plans of <= 384 KB), and
    * AudioSystem DECODES it per row: the emitted rate/channels/
    * duration come from the decoded AudioFormat + frame length, so a
    * gate match proves the decoder agreed with the plan. Durations
    * are multiples of 250 ms and rates multiples of 8 kHz, so
    * frames*1000/rate reproduces the planned duration exactly in
    * integer arithmetic (SQL-replayable).
    */
  object WavCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    /** Planned (sampleRateHz, durationMs, channels) from the hash:
      * rate in {8k..48k}, duration in {250..2000} ms, 1-2 channels. */
    def plan(h: Long): (Int, Int, Int) =
      ((8000 * ((h % 6) + 1)).toInt, (((h % 8) + 1) * 250).toInt,
        ((h % 2) + 1).toInt)

    /** Per-doc PCM tone offset (hash bits 10-17): added to every data
      * byte of the rendered WAV, so each document's audio CONTENT is
      * unique beyond its 24-class (rate, duration, channels) shape —
      * the way a real corpus's files differ. SQL-replayable: data
      * byte i decodes to (i*13 + 5 + tone) mod 256 (PCM is lossless),
      * which is what makes the x30 per-window content digest
      * oracle-gateable. */
    def tone(h: Long): Int = ((h >>> 10) % 256).toInt

    private val wavCache =
      new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()

    def synthesizeWav(h: Long): Array[Byte] = {
      val (sr, durMs, ch) = plan(h)
      // the plan-pure base rides the memo (header + ramp PCM); the
      // per-doc tone is a byte-add over the data chunk per call —
      // O(bytes), the same order as the decode that follows, and far
      // cheaper than the per-row ENCODE the x01 lesson bans
      val base = memo(wavCache,
        (sr.toLong << 32) | (durMs.toLong << 8) | ch.toLong)(
        renderWav(sr, durMs, ch))
      val t = tone(h)
      if (t == 0) base
      else {
        val out = base.clone()
        val pcmLen = (sr.toLong * durMs / 1000).toInt * ch * 2
        var i = out.length - pcmLen
        while (i < out.length) { out(i) = (out(i) + t).toByte; i += 1 }
        out
      }
    }

    private def renderWav(sr: Int, durMs: Int, ch: Int): Array[Byte] = {
      val frames = sr.toLong * durMs / 1000
      val fmt = new AudioFormat(sr.toFloat, 16, ch, true, false)
      val pcm = new Array[Byte](frames.toInt * ch * 2)
      var i = 0
      while (i < pcm.length) { pcm(i) = (i * 13 + 5).toByte; i += 1 }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** The platform's real audio file readers, resolved ONCE per JVM
      * through the same SPI AudioSystem uses: AudioSystem's
      * convenience entry re-enters a synchronized provider lookup on
      * EVERY call (JDK13Services), which serializes a 32-thread scan
      * (x06 read 7.5 s at engine sf1 through it; ~1 s calling the
      * resolved reader directly — same codec, same parse). */
    private lazy val readers: List[javax.sound.sampled.spi.AudioFileReader] = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader],
          classOf[javax.sound.sampled.spi.AudioFileReader].getClassLoader)
        .iterator.asScala.toList
    }

    /** The reader that last succeeded — tried first on every call so
      * a homogeneous corpus (all WAV here) pays ZERO
      * UnsupportedAudioFileException throws per row: the SPI scan
      * tries AIFF/AU readers before WAV in provider order, and each
      * rejection is a thrown exception (~180 us/row measured through
      * the scan vs ~15 us through the right reader directly). */
    @volatile private var preferred: javax.sound.sampled.spi.AudioFileReader =
      null

    private def openStream(wav: Array[Byte]): AudioInputStream = {
      val p = preferred
      val fast =
        if (p == null) None
        else {
          val in = new java.io.ByteArrayInputStream(wav)
          try Some(p.getAudioInputStream(in))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
          }
        }
      fast.getOrElse {
        readers.view.flatMap { r =>
          val in = new java.io.ByteArrayInputStream(wav)
          try {
            val a = r.getAudioInputStream(in)
            preferred = r
            Some(a)
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
          }
        }.headOption.getOrElse(AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(wav)))
      }
    }

    /** The real decode: (sampleRateHz, durationMs, channels) off the
      * WAV header + frame length. */
    def decode(wav: Array[Byte]): (Int, Int, Int) = {
      val ais = openStream(wav)
      val f = ais.getFormat
      val durMs = ais.getFrameLength * 1000 / f.getSampleRate.toLong
      (f.getSampleRate.toInt, durMs.toInt, f.getChannels)
    }

    /** The real decode, PCM included: (sampleRateHz, durationMs,
      * channels, dataBytes). Draining the stream reads every data
      * byte the codec produced — 16-bit PCM WAV is lossless, so the
      * bytes are exactly what synthesis wrote (ramp + tone), which is
      * what makes per-window content digests SQL-replayable (x30). */
    def decodeWithPcm(wav: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
      val ais = openStream(wav)
      val f = ais.getFormat
      val durMs = ais.getFrameLength * 1000 / f.getSampleRate.toLong
      val pcm = ais.readAllBytes()
      (f.getSampleRate.toInt, durMs.toInt, f.getChannels, pcm)
    }
  }

  /** REAL video codec binding: MJPEG-in-AVI. AVI is Microsoft's
    * public RIFF container (the 'avih'/'strl'/'movi' layout is the
    * documented Video-for-Windows format); MJPEG stores each frame as
    * an ordinary JPEG, which javax.imageio decodes in every JVM. The
    * container walk (RIFF chunk parse) is in-repo — ~60 lines against
    * the public spec — while the per-frame PIXEL decode is the
    * platform's real JPEG codec, the same division of labor as a real
    * MJPEG pipeline.
    *
    * Plan from the 60-bit content hash (all SQL-replayable integer
    * arithmetic): fps in {5,10,20,25} (every value divides 1000, so
    * the frame period and total duration are exact integer
    * milliseconds), nFrames in [2,33], sides multiples of 8 in
    * [16,72] — 8192 distinct plans, so a corpus-sized near-dup gate
    * (x29) sees x31-like fingerprint-class density instead of a
    * quadratic blow-up of coincidentally-identical streams. Synthesis
    * renders ONE deterministic JPEG per (w,h) (64 distinct frames,
    * memoized — the expensive encode) and assembles the AVI container
    * per call (chunk-header concat of the memoized frames: pure
    * copies, cheap next to the per-frame JPEG DECODE each row then
    * pays; memoizing whole AVIs at 8192 plans would pin ~300 MB for
    * no measurable win). Decode re-parses the container, counts
    * and ImageIO-decodes every '00dc' frame chunk, and emits
    * (fps-from-header, duration from COUNTED frames, DECODED first-
    * frame width/height, counted frame total) — so a gate match
    * proves the RIFF walk and the JPEG decoder both ran and agreed
    * with the plan.
    */
  object AviCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    /** Planned (fps, nFrames, width, height) from the content hash. */
    def plan(h: Long): (Int, Int, Int, Int) = {
      val fps = (h % 4) match {
        case 0 => 5; case 1 => 10; case 2 => 20; case _ => 25
      }
      val nf = ((h >>> 2) % 32 + 2).toInt
      val w = (((h >>> 7) % 8 + 2) * 8).toInt
      val ht = (((h >>> 10) % 8 + 2) * 8).toInt
      (fps, nf, w, ht)
    }

    private val jpegCache =
      new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()

    /** One deterministic RGB frame per (w, h), encoded by the REAL
      * javax.imageio JPEG writer (dimensions are lossless under JPEG
      * even though pixels are not — the decoder's metadata contract). */
    private def frameJpeg(w: Int, ht: Int): Array[Byte] =
      memo(jpegCache, (w.toLong << 16) | ht.toLong) {
        val img = new java.awt.image.BufferedImage(
          w, ht, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        var i = 0
        while (i < data.length) { data(i) = (i * 31 + 7).toByte; i += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }

    def synthesizeAvi(h: Long): Array[Byte] = {
      val (fps, nf, w, ht) = plan(h)
      renderAvi(fps, nf, w, ht) // container assembly per call; the
      // JPEG encode inside rides the per-(w,h) memo — see object doc
    }

    private def chunk(fcc: String, body: Array[Byte]): Array[Byte] = {
      val padded = body.length + (body.length & 1) // RIFF chunks pad to even
      val out = ByteBuffer.allocate(8 + padded).order(ByteOrder.LITTLE_ENDIAN)
      out.put(fcc.getBytes("US-ASCII")).putInt(body.length).put(body)
      out.array()
    }

    // raw arraycopy concat: assembly runs per ROW now (8192 plans made
    // whole-AVI memoization a ~300 MB pin for no win), and the boxed
    // Seq[Byte] path of ++/flatten cost ~400 us/doc — 40x the copies
    private def concat(parts: Seq[Array[Byte]]): Array[Byte] = {
      val out = new Array[Byte](parts.iterator.map(_.length).sum)
      var o = 0
      parts.foreach { p =>
        System.arraycopy(p, 0, out, o, p.length); o += p.length
      }
      out
    }

    private def list(kind: String, bodies: Array[Byte]*): Array[Byte] =
      chunk("LIST", concat(kind.getBytes("US-ASCII") +: bodies))

    /** Minimal spec-conformant AVI: RIFF('AVI ') { hdrl { avih,
      * strl { strh(vids/MJPG), strf(BITMAPINFOHEADER) } }, movi
      * { '00dc' JPEG × nFrames } }. */
    private def renderAvi(fps: Int, nf: Int, w: Int, ht: Int): Array[Byte] = {
      val jpeg = frameJpeg(w, ht)
      def le(n: Int*): Array[Byte] = {
        val b = ByteBuffer.allocate(n.length * 4).order(ByteOrder.LITTLE_ENDIAN)
        n.foreach(b.putInt); b.array()
      }
      val avih = chunk("avih", le(
        1000000 / fps, // dwMicroSecPerFrame (fps divides 1e6 for all 4)
        0, 0, 0,       // maxBytesPerSec, padding, dwFlags (no idx1 chunk,
                       //   so AVIF_HASINDEX stays unset)
        nf, 0, 1,      // dwTotalFrames, dwInitialFrames, dwStreams
        jpeg.length + 8, w, ht, // dwSuggestedBufferSize, dwWidth, dwHeight
        0, 0, 0, 0))   // dwReserved[4]
      val strh = chunk("strh",
        "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++ le(
          0, 0, 0,          // dwFlags, wPrio+wLang, dwInitialFrames
          1, fps,           // dwScale, dwRate  (rate/scale = fps)
          0, nf,            // dwStart, dwLength (frames)
          jpeg.length + 8, -1, 0, // bufSize, quality, sampleSize
          0, (ht << 16) | w))     // rcFrame {0,0,w,h} as two dwords
      val strf = chunk("strf", le(
        40, w, ht,          // biSize, biWidth, biHeight
        (24 << 16) | 1,     // biPlanes=1, biBitCount=24
        0x47504a4d,         // biCompression = 'MJPG' (LE fourcc)
        w * ht * 3, 0, 0, 0, 0)) // biSizeImage, resolutions, clr
      val hdrl = list("hdrl", avih, list("strl", strh, strf))
      val frame = chunk("00dc", jpeg)
      val movi = list("movi", Seq.fill(nf)(frame): _*)
      chunk("RIFF", concat(Seq("AVI ".getBytes("US-ASCII"), hdrl, movi)))
    }

    /** The real decode: walk the RIFF tree for the avih header (fps)
      * and the movi chunk list, ImageIO-decode every frame, and emit
      * (fps, durationMs, width, height, nFrames) — dims from the
      * DECODED first frame, duration from the COUNTED frames. */
    def decode(avi: Array[Byte]): (Int, Int, Int, Int, Int) = {
      val b = ByteBuffer.wrap(avi).order(ByteOrder.LITTLE_ENDIAN)
      def fcc(): String = {
        val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
      }
      require(fcc() == "RIFF", "not a RIFF file")
      b.getInt // riff size
      require(fcc() == "AVI ", "not an AVI")
      var usPerFrame = 0
      var frames = 0
      var dw = -1
      var dh = -1
      // walk the top-level chunks; recurse only into the LISTs we need
      def walk(end: Int): Unit = {
        while (b.position() < end) {
          val id = fcc()
          val sz = b.getInt
          val next = b.position() + sz + (sz & 1)
          id match {
            case "LIST" =>
              val kind = fcc()
              if (kind == "hdrl" || kind == "movi") walk(next)
              else b.position(next)
            case "avih" =>
              usPerFrame = b.getInt
              b.position(next)
            case "00dc" =>
              val frame = new Array[Byte](sz)
              b.get(frame)
              // once-resolved JPEG reader SPI + memory-backed stream
              // (see ImageRead): an undecodable frame throws IIO's own
              // named exception instead of returning null
              val img = ImageRead.jpeg(frame)
              if (frames == 0) { dw = img.getWidth; dh = img.getHeight }
              else require(img.getWidth == dw && img.getHeight == dh,
                "MJPEG stream changed dimensions mid-file")
              frames += 1
              b.position(next)
            case _ =>
              b.position(next)
          }
        }
      }
      walk(avi.length)
      require(usPerFrame > 0 && frames > 0, "no avih header or no frames")
      val fps = 1000000 / usPerFrame
      (fps, frames * 1000 / fps, dw, dh, frames)
    }
  }

  /** Spread a media frame across the session's shuffle-partition
    * count for the CPU-bound per-row decode that follows. The
    * testdata corpus is ONE parquet file = one scan split, and a
    * bare `repartition(col)` doesn't help: AQE's small-partition
    * coalescing is tuned for shuffle BYTES, so a tiny-bytes/
    * heavy-CPU decode stage gets folded back into one task (measured:
    * x29 ran its 87k JPEG-frame decode serially, 5.6 s vs 0.9 s
    * parallel). An EXPLICIT partition count opts the exchange out of
    * coalescing. A real 100 TB corpus gets its decode parallelism
    * from its many input files and skips this hint entirely.
    */
  def decodeParallel(df: DataFrame, id: String): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
      col(id))

  /** Wrap a text column as a fake media payload: (id, modality,
    * content binary, n_bytes). In a real pipeline content comes from
    * files/object storage.
    */
  def asBinary(df: DataFrame, id: String, text: String,
      modality: String): DataFrame =
    df.select(col(id),
      lit(modality).as("modality"),
      col(text).cast("binary").as("content"))
      .withColumn("n_bytes", octet_length(col("content")))

  /** Image decode through the REAL codec: per partition, render each
    * row's planned PNG and ImageIO-decode it (see [[ImageIoCodec]]);
    * emits the DECODED (width, height, channels) + n_frames=1 (PNG is
    * single-frame) — the same mapPartitions seam and output schema
    * the stub-era dims decoder used before the real codec landed.
    */
  def decodeDimsImageIo(media: DataFrame, id: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, modality, bytes) =>
          val png = ImageIoCodec.synthesizePng(StubCodec.hash60(bytes))
          val (w, h, c) = ImageIoCodec.decode(png)
          (i, modality, w, h, c, 1)
        }
      }
      .toDF(id, "modality", "width", "height", "channels", "n_frames")
  }

  /** Audio decode through the REAL codec: per partition, render each
    * row's planned WAV (memoized) and AudioSystem-decode it (see
    * [[WavCodec]]); emits the DECODED (sample_rate, duration_ms,
    * n_channels) — the audio sibling of [[decodeDimsImageIo]].
    */
  def decodeAudioWav(media: DataFrame, id: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val wav = WavCodec.synthesizeWav(StubCodec.hash60(bytes))
          val (sr, dur, ch) = WavCodec.decode(wav)
          (i, sr, dur, ch)
        }
      }
      .toDF(id, "sample_rate", "duration_ms", "n_channels")
  }

  /** Feature-window plan: count of `windowMs` analysis windows. */
  def withAudioWindowPlan(dims: DataFrame, windowMs: Int): DataFrame =
    dims.withColumn("n_windows",
      floor((col("duration_ms") + windowMs - 1) / windowMs).cast("int"))

  /** Resize plan: clamp the longer side to `maxSide`, preserving
    * aspect ratio (integer arithmetic — oracle-friendly).
    */
  def withResizePlan(dims: DataFrame, maxSide: Int): DataFrame =
    dims
      .withColumn("scale_num",
        when(greatest(col("width"), col("height")) > maxSide, lit(maxSide))
          .otherwise(greatest(col("width"), col("height"))))
      .withColumn("out_width",
        floor(col("width") * col("scale_num") /
          greatest(col("width"), col("height"))).cast("int"))
      .withColumn("out_height",
        floor(col("height") * col("scale_num") /
          greatest(col("width"), col("height"))).cast("int"))
      .drop("scale_num")

  /** Frame-sampling plan: every `stride`-th frame. */
  def withFrameSamplePlan(dims: DataFrame, stride: Int): DataFrame =
    dims.withColumn("n_sampled_frames",
      floor((col("n_frames") + stride - 1) / stride).cast("int"))

  /** Video decode through the REAL codec: per partition, render each
    * row's planned MJPEG-AVI (memoized) and decode it — RIFF walk +
    * ImageIO JPEG decode per frame (see [[AviCodec]]); emits the
    * header fps, the duration from COUNTED frames, the DECODED frame
    * dimensions, and the counted frame total — the video sibling of
    * [[decodeDimsImageIo]]/[[decodeAudioWav]].
    */
  def decodeVideoAvi(media: DataFrame, id: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val avi = AviCodec.synthesizeAvi(StubCodec.hash60(bytes))
          val (fps, dur, w, h, nf) = AviCodec.decode(avi)
          (i, fps, dur, w, h, nf)
        }
      }
      .toDF(id, "fps", "duration_ms", "width", "height",
        "n_total_frames")
  }

  /** Video decode emitting the per-frame TOKEN STREAM for perceptual
    * fingerprinting (the x17 completion, r14 verdict item): each
    * row's planned AVI is decoded — the same RIFF walk + per-frame
    * javax.imageio JPEG decode as [[decodeVideoAvi]] — and one
    * descriptor token per DECODED frame comes back
    * (`"<fps>:<width>:<height>:<nFrames>:<frameIdx>"` — fps from the
    * parsed avih header, dims from the decoded first frame, the frame
    * count/index range from the COUNTED '00dc' chunks). A SimHash
    * over this token array is a frame-stream fingerprint: videos
    * whose decoded frame sequences look alike land within a small
    * hamming distance even when their container BYTES differ — the
    * near-dup arm that exact byte hashing (x17's md5) cannot see.
    * Every decoded stream feature rides in every token (including
    * the total frame count, so streams of different lengths are
    * DIFFERENT content, not near-dups of their shared prefix — the
    * property that keeps a corpus-sized x29's pair output at
    * fingerprint-class density). The tokens are deterministic
    * functions of decoded outputs the planner can replay, so the
    * DuckDB oracle gates that the decode actually ran (a real
    * pipeline would append a pixel-digest component per token; JPEG
    * pixel bytes aren't SQL-replayable, so the gate pins the
    * decode-derived part).
    */
  def decodeVideoFrameTokens(media: DataFrame, id: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val avi = AviCodec.synthesizeAvi(StubCodec.hash60(bytes))
          val (fps, _, w, h, nf) = AviCodec.decode(avi)
          (i, (0 until nf).map(fi => s"$fps:$w:$h:$nf:$fi"))
        }
      }
      .toDF(id, "frame_tokens")
  }

  /** Audio decode emitting per-analysis-window tokens — the audio
    * sibling of [[decodeVideoFrameTokens]]: each row's planned WAV is
    * AudioSystem-decoded WITH its PCM drained (same real codec as
    * [[decodeAudioWav]]; see [[WavCodec.decodeWithPcm]]) and one
    * descriptor token per 250 ms analysis window comes back
    * (`"<sampleRate>:<channels>:<nWindows>:<windowIdx>:<digest>"`;
    * the window count is the DECODED duration over the 250 ms grid —
    * durations are multiples of 250 by plan, so the division is
    * exact — and `digest` is a per-window CONTENT digest read off the
    * decoded PCM: the unsigned byte at the window's start. 16-bit PCM
    * is lossless, so unlike JPEG pixels the digest IS SQL-replayable
    * — data byte i decodes to (i*13 + 5 + tone) mod 256 — which lets
    * the oracle gate actual per-window content, the energy/MFCC slot
    * of a real pipeline). A SimHash over the window tokens
    * fingerprints the decoded audio stream for the x30 near-dup arm;
    * the digest + window count in every token keep different
    * recordings DIFFERENT (corpus-sized pair output stays at
    * fingerprint-class density instead of going quadratic over the
    * 24-class shape space).
    */
  def decodeAudioWindowTokens(media: DataFrame, id: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val wav = WavCodec.synthesizeWav(StubCodec.hash60(bytes))
          val (sr, dur, ch, pcm) = WavCodec.decodeWithPcm(wav)
          val nw = dur / 250
          val winBytes = (sr / 4) * ch * 2
          (i, (0 until nw).map { wi =>
            val d = pcm(wi * winBytes) & 0xff
            s"$sr:$ch:$nw:$wi:$d"
          })
        }
      }
      .toDF(id, "window_tokens")
  }

  /** Image decode emitting per-tile tokens — the image sibling of
    * [[decodeVideoFrameTokens]]: each row's planned PNG is
    * ImageIO-decoded (same real codec as [[decodeDimsImageIo]]) and
    * one descriptor token per 16x16 tile of the DECODED raster comes
    * back (`"<width>:<height>:<bands>:<tileIdx>"`, the tile grid a
    * per-tile pHash pipeline walks). A SimHash over the tile tokens
    * fingerprints the decoded image for the x31 near-dup arm; a real
    * pipeline would fold each tile's pixel digest into its token
    * (lossy-codec pixel bytes aren't SQL-replayable, so the gate
    * pins the decode-derived part).
    */
  def decodeImageTileTokens(media: DataFrame, id: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val png = ImageIoCodec.synthesizePng(StubCodec.hash60(bytes))
          val (w, h, c) = ImageIoCodec.decode(png)
          val tiles = ((w + 15) / 16) * ((h + 15) / 16)
          (i, (0 until tiles).map(t => s"$w:$h:$c:$t"))
        }
      }
      .toDF(id, "tile_tokens")
  }

  /** Materialize the sampled-frame WORK LIST: one row per kept frame
    * (every `stride`-th), with its integer-ms timestamp — the fan-out
    * a real pipeline feeds to the frame decoder. Built narrow with
    * sequence+explode (no join, no shuffle before the downstream op).
    */
  def sampledFrames(video: DataFrame, id: String, stride: Int): DataFrame =
    video
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_total_frames") - 1,
          lit(stride))))
      .withColumn("ts_ms", expr("frame_idx * 1000 div fps").cast("int"))
      .select(col(id), col("frame_idx").cast("int").as("frame_idx"),
        col("ts_ms"))
}
