package graft.bdb

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the 30 TPCx-BB queries with reference-default
  * parameters. Precondition: the 23 views are registered
  * ([[BdbCatalog]]).
  */
object BdbQueries {
  val all: Map[String, SparkSession => DataFrame] = Map(
    "q01" -> (s => BdbQueries1.q01(s)),
    "q02" -> (s => BdbQueries1.q02(s)),
    "q03" -> (s => BdbQueries1.q03(s)),
    "q04" -> (s => BdbQueries1.q04(s)),
    "q05" -> (s => BdbQueries1.q05(s)),
    "q06" -> (s => BdbQueries1.q06(s)),
    "q07" -> (s => BdbQueries1.q07(s)),
    "q08" -> (s => BdbQueries1.q08(s)),
    "q09" -> (s => BdbQueries1.q09(s)),
    "q10" -> (s => BdbQueries1.q10(s)),
    "q11" -> (s => BdbQueries1.q11(s)),
    "q12" -> (s => BdbQueries1.q12(s)),
    "q13" -> (s => BdbQueries1.q13(s)),
    "q14" -> (s => BdbQueries1.q14(s)),
    "q15" -> (s => BdbQueries1.q15(s)),
    "q16" -> (s => BdbQueries2.q16(s)),
    "q17" -> (s => BdbQueries2.q17(s)),
    "q18" -> (s => BdbQueries2.q18(s)),
    "q19" -> (s => BdbQueries2.q19(s)),
    "q20" -> (s => BdbQueries2.q20(s)),
    "q21" -> (s => BdbQueries2.q21(s)),
    "q22" -> (s => BdbQueries2.q22(s)),
    "q23" -> (s => BdbQueries2.q23(s)),
    "q24" -> (s => BdbQueries2.q24(s)),
    "q25" -> (s => BdbQueries2.q25(s)),
    "q26" -> (s => BdbQueries2.q26(s)),
    "q27" -> (s => BdbQueries2.q27(s)),
    "q28" -> (s => BdbQueries2.q28(s)),
    "q29" -> (s => BdbQueries2.q29(s)),
    "q30" -> (s => BdbQueries2.q30(s))
  )
}
