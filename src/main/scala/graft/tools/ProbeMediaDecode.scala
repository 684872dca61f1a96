package graft.tools

import graft.ops.Multimodal.{AviCodec, ImageIoCodec, WavCodec}

/** Plain-JVM decode-throughput probe for the three media codecs — no
  * Spark, one thread: isolates raw codec cost from plan shape,
  * partitioning, and shuffle so a slow perceptual query (x29/x30/x31)
  * can be attributed to the right stage. Run:
  * `tools/jrun.sh graft.tools.ProbeMediaDecode [nDocs]`.
  */
object ProbeMediaDecode {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    val rnd = new scala.util.Random(1)
    val hashes = Array.fill(n)(rnd.nextLong() >>> 4)

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val units = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-28s $s%8.3f s  ($units units, " +
        f"${s * 1e6 / n}%8.1f us/doc)")
    }

    // warm-up: JIT + codec caches
    hashes.take(200).foreach { h =>
      AviCodec.decode(AviCodec.synthesizeAvi(h))
      WavCodec.decodeWithPcm(WavCodec.synthesizeWav(h))
      ImageIoCodec.decode(ImageIoCodec.synthesizePng(h))
    }

    timed("avi synthesize only") {
      hashes.map(h => AviCodec.synthesizeAvi(h).length.toLong).sum
    }
    timed("avi synthesize+decode") {
      hashes.map { h =>
        AviCodec.decode(AviCodec.synthesizeAvi(h))._5.toLong
      }.sum
    }
    timed("wav synthesize only") {
      hashes.map(h => WavCodec.synthesizeWav(h).length.toLong).sum
    }
    timed("wav synthesize+decodePcm") {
      hashes.map { h =>
        WavCodec.decodeWithPcm(WavCodec.synthesizeWav(h))._4.length.toLong
      }.sum
    }
    timed("png synthesize+decode") {
      hashes.map { h =>
        ImageIoCodec.decode(ImageIoCodec.synthesizePng(h))._1.toLong
      }.sum
    }
  }
}
