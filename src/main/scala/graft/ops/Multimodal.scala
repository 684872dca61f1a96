package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media as
  * opaque `binary` columns + typed metadata, with decode /
  * feature-extract / resize / frame-sample as per-partition batch
  * operators.
  *
  * The DECODE KERNEL IS A STUB: real image/audio codecs aren't in this
  * environment, so `StubCodec` derives deterministic fake dimensions
  * from the content's md5. Everything around it — binary schema,
  * partition-batched iteration, operator signatures, metadata
  * propagation — is the real distributed plumbing and is oracle-
  * verified (the stub's arithmetic is reproducible in SQL).
  *
  * 100 TB notes: media rows are large and skew-prone — the operators
  * keep content opaque (no driver collection), process partition-
  * locally (mapPartitions, one codec init per partition, the Pandas-
  * UDF batching pattern), and emit compact metadata so downstream
  * filtering prunes content columns at the parquet scan.
  */
object Multimodal {

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
    /** (sampleRateHz, durationMs, nChannels) of the fake audio. */
    def decodeAudio(bytes: Array[Byte]): (Int, Int, Int) = {
      val h = hash60(bytes)
      ((8000 * ((h % 6) + 1)).toInt, ((h % 60000) + 1000).toInt,
        ((h % 2) + 1).toInt)
    }
    /** (fps, durationMs, width, height) of the fake video stream. */
    def decodeVideo(bytes: Array[Byte]): (Int, Int, Int, Int) = {
      val h = hash60(bytes)
      ((((h % 4) + 1) * 15).toInt, ((h % 120000) + 2000).toInt,
        ((h % 1024) + 16).toInt, (((h / 1024) % 1024) + 16).toInt)
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

  /** Audio decode + windowed-feature plan per partition. */
  def decodeAudio(media: DataFrame, id: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (i, bytes) =>
          val (sr, dur, ch) = StubCodec.decodeAudio(bytes)
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
