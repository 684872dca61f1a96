package graft

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

/** DSv2 synthetic source: partition-local generation, pushed column
  * pruning, determinism across slice counts.
  */
class SourcesSpec extends SparkSpec {

  private def load(rows: Long, slices: Int) =
    spark.read.format("graft.sources.SyntheticSource")
      .option("rows", rows).option("slices", slices).load()

  test("generates exactly `rows` rows across `slices` partitions") {
    val df = load(10000, 7)
    assert(df.count() === 10000)
    assert(df.rdd.getNumPartitions === 7)
    assert(df.select(countDistinct("id")).first().getLong(0) === 10000)
  }

  test("column pruning reaches the reader (pushed required schema)") {
    val pruned = load(100, 4).select("category")
      .queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation => r.scan.readSchema()
      }
    assert(pruned.nonEmpty)
    assert(pruned.head.fieldNames.toSeq === Seq("category"),
      s"reader still materializes ${pruned.head.fieldNames.mkString(",")}")
  }

  test("content is a pure function of id — slice count is invisible") {
    val a = load(5000, 3).collect().map(_.toSeq).sortBy(_.head.toString)
    val b = load(5000, 11).collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a === b)
  }
}
