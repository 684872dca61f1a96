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
  * per row, x06). Only the VIDEO kernel remains a STUB (`StubCodec`,
  * deterministic fake metadata from the content's md5): no video
  * codec ships in a bare JVM.
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

  /** DETERMINISTIC FAKE decode — replace with a real codec binding.
    * Dimensions derive from md5(content) so a SQL oracle can verify
    * the pipeline end-to-end.
    */
  object StubCodec {
    def hash60(bytes: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v >>> 4
    }
    /** (width, height, channels, nFrames) of the fake media. */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Int) = {
      val h = hash60(bytes)
      (((h % 1024) + 16).toInt, (((h / 1024) % 1024) + 16).toInt,
        ((h % 3) + 1).toInt, ((h % 240) + 1).toInt)
    }
    /** (fps, durationMs, width, height) of the fake video stream. */
    def decodeVideo(bytes: Array[Byte]): (Int, Int, Int, Int) = {
      val h = hash60(bytes)
      ((((h % 4) + 1) * 15).toInt, ((h % 120000) + 2000).toInt,
        ((h % 1024) + 16).toInt, (((h / 1024) % 1024) + 16).toInt)
    }
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

    /** The real decode: (width, height, raster bands) off the PNG. */
    def decode(png: Array[Byte]): (Int, Int, Int) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
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

    private val wavCache =
      new java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]()

    def synthesizeWav(h: Long): Array[Byte] = {
      val (sr, durMs, ch) = plan(h)
      memo(wavCache, (sr.toLong << 32) | (durMs.toLong << 8) | ch.toLong)(
        renderWav(sr, durMs, ch))
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

    /** The real decode: (sampleRateHz, durationMs, channels) off the
      * WAV header + frame length. */
    def decode(wav: Array[Byte]): (Int, Int, Int) = {
      val ais = {
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
      val f = ais.getFormat
      val durMs = ais.getFrameLength * 1000 / f.getSampleRate.toLong
      (f.getSampleRate.toInt, durMs.toInt, f.getChannels)
    }
  }

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

  /** Decode + feature-extract per partition: one codec instance per
    * partition, streaming iterator (never materializes the partition).
    */
  def decodeDims(media: DataFrame, id: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col("modality"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init happens here in a real binding
        rows.map { case (i, modality, bytes) =>
          val (w, h, c, f) = StubCodec.decode(bytes)
          (i, modality, w, h, c, f)
        }
      }
      .toDF(id, "modality", "width", "height", "channels", "n_frames")
  }

  /** Image decode through the REAL codec: per partition, render each
    * row's planned PNG and ImageIO-decode it (see [[ImageIoCodec]]);
    * emits the DECODED (width, height, channels) + n_frames=1 (PNG is
    * single-frame). Same seam and output schema as [[decodeDims]].
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

  /** Video decode per partition: (id, fps, duration_ms, width,
    * height) + derived total frame count (all integer arithmetic).
    */
  def decodeVideo(media: DataFrame, id: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val (fps, dur, w, h) = StubCodec.decodeVideo(bytes)
          (i, fps, dur, w, h)
        }
      }
      .toDF(id, "fps", "duration_ms", "width", "height")
      .withColumn("n_total_frames",
        expr("fps * duration_ms div 1000").cast("int"))
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
