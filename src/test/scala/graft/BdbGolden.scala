package graft

import graft.bdb.{BdbQueries1, BdbQueries2}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Golden-file verification harness for the 30 TPCx-BB queries — the
  * reference's core correctness methodology: run each query against a
  * known dataset and compare the full result to a stored validation
  * output with 6-significant-digit float tolerance
  * (`gpu_bdb/bdb_tools/utils.py:449-477,616-752`).
  *
  * Here the known dataset is the deterministic 23-table fixture
  * ([[BdbFixture]], fixed seed-free construction), query parameters
  * are fixture-adapted so results are non-empty where the data allows,
  * and the tolerance lives in the RENDERING: every float/decimal cell
  * is rounded to 6 significant digits before the sorted-canonical
  * compare, so a golden match is the reference's pseudo-equality.
  *
  * Regenerate after an intentional semantic change with
  * `sbt -Dgraft.golden.update=1 "testOnly graft.BdbGoldenSpec"`.
  */
object BdbGolden {

  /** Fixture-adapted invocations — same parameters as BdbQueriesSpec. */
  def queries(spark: SparkSession): Seq[(String, () => DataFrame)] = Seq(
    "q01" -> (() => BdbQueries1.q01(spark, stores = Seq(1, 2, 3, 4, 5), minCount = 0)),
    "q02" -> (() => BdbQueries1.q02(spark, itemSk = 1)),
    "q03" -> (() => BdbQueries1.q03(spark, purchasedItem = 1, categories = Seq(1, 2, 3))),
    "q04" -> (() => BdbQueries1.q04(spark)),
    "q05" -> (() => BdbQueries1.q05(spark)),
    "q06" -> (() => BdbQueries1.q06(spark, year = 2001)),
    "q07" -> (() => BdbQueries1.q07(spark, year = 2004, moy = 7, minCnt = 1)),
    "q08" -> (() => BdbQueries1.q08(spark)),
    "q09" -> (() => BdbQueries1.q09(spark)),
    "q10" -> (() => BdbQueries1.q10(spark)),
    "q11" -> (() => BdbQueries1.q11(spark)),
    "q12" -> (() => BdbQueries1.q12(spark)),
    "q13" -> (() => BdbQueries1.q13(spark)),
    "q14" -> (() => BdbQueries1.q14(spark)),
    // store 8: the fixture store whose q15 window has declining
    // categories (stores 1/6 have all-positive slopes at floor scale)
    "q15" -> (() => BdbQueries1.q15(spark, storeSk = 8)),
    "q16" -> (() => BdbQueries2.q16(spark)),
    "q17" -> (() => BdbQueries2.q17(spark)),
    "q18" -> (() => BdbQueries2.q18(spark)),
    // fixture-adapted return weeks: the floor-scale return-date walk
    // (t0*11+37, t0 < ~100) never reaches the reference-default 2004
    // weeks, which made the q19 golden vacuously empty (round-7
    // verdict). These four dates land in weeks 47/69/91/112 where the
    // fixture's store and web returns week-align with equal quantities
    // (balanced items 50/26/53/42; item 42's review carries negative
    // sentences, so the sentiment tail is exercised too).
    "q19" -> (() => BdbQueries2.q19(spark, returnDates =
      Seq("2001-11-26", "2002-04-29", "2002-09-30", "2003-02-24"))),
    "q20" -> (() => BdbQueries2.q20(spark)),
    "q21" -> (() => BdbQueries2.q21(spark)),
    "q22" -> (() => BdbQueries2.q22(spark)),
    "q23" -> (() => BdbQueries2.q23(spark, coefficient = 0.1)),
    "q24" -> (() => BdbQueries2.q24(spark, itemSk = 1)),
    "q25" -> (() => BdbQueries2.q25(spark)),
    "q26" -> (() => BdbQueries2.q26(spark, minItems = 0)),
    "q27" -> (() => BdbQueries2.q27(spark, itemSk = 1)),
    // vocabulary-sized feature space on the fixture (2^23 default
    // would broadcast a ~200 MB dense NB model per run)
    "q28" -> (() => BdbQueries2.q28(spark, numFeatures = 1 << 16)),
    "q29" -> (() => BdbQueries2.q29(spark)),
    "q30" -> (() => BdbQueries2.q30(spark)))

  /** One cell, canonically rendered: floats/decimals at 6 significant
    * digits (the reference's compare tolerance), null as NULL, nested
    * sequences bracketed.
    */
  def renderCell(v: Any): String = v match {
    case null => "NULL"
    case d: Double => sig6(d)
    case f: Float => sig6(f.toDouble)
    case b: java.math.BigDecimal => sig6(b.doubleValue())
    case b: scala.math.BigDecimal => sig6(b.toDouble)
    case s: Seq[_] => s.map(renderCell).mkString("[", ",", "]")
    case r: Row => r.toSeq.map(renderCell).mkString("{", ",", "}")
    case other => other.toString
  }

  private def sig6(d: Double): String =
    if (d.isNaN || d.isInfinite) d.toString
    else if (d == 0.0) "0"
    else {
      val bd = new java.math.BigDecimal(d)
        .round(new java.math.MathContext(6))
      bd.stripTrailingZeros.toPlainString
    }

  /** Canonical lines: columns sorted by name, every row rendered and
    * the row lines sorted — order-insensitive, schema-checked (first
    * line is the sorted column list with types).
    */
  def canonicalize(df: DataFrame): Seq[String] = {
    val fields = df.schema.fields.zipWithIndex.sortBy(_._1.name)
    val header = fields
      .map { case (f, _) => s"${f.name}:${f.dataType.simpleString}" }
      .mkString("|")
    val rows = df.collect().map { r =>
      fields.map { case (_, i) => renderCell(r.get(i)) }.mkString("|")
    }.toSeq.sorted
    header +: rows
  }

  val goldenDir = new java.io.File("src/test/resources/bdb_golden")

  def goldenFile(name: String) = new java.io.File(goldenDir, s"$name.txt")

  def write(name: String, lines: Seq[String]): Unit = {
    goldenDir.mkdirs()
    val w = new java.io.PrintWriter(goldenFile(name), "UTF-8")
    try lines.foreach(w.println) finally w.close()
  }

  def read(name: String): Option[Seq[String]] = {
    val f = goldenFile(name)
    if (!f.exists()) None
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try Some(src.getLines().toList) finally src.close()
    }
  }
}
