package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting + sampling for training-data
  * pipelines. Spark's own `randomSplit`/`sample` draw from a seeded
  * RNG *per partition*, so results change with partitioning, input
  * order, or cluster size — useless for a reproducible 100 TB corpus
  * split. These operators derive membership from the portable 60-bit
  * content hash of a stable id ([[Text.portableHash]]): the split of
  * a row is a pure function of the row, identical on any engine (the
  * DuckDB oracles replay it), any partitioning, any scale.
  *
  * The hash is salted with the operation name, so the split bucket,
  * fold id, and any sample draws are mutually independent.
  */
object Split {

  val Buckets = 10000L // membership granularity: 0.01%

  /** The one salted-hash-modulo definition every deterministic
    * selection in this library derives from ([[bucket]], [[fold]],
    * [[graft.ops.Pack.pack]]'s shard key) — the salt format and hash
    * must stay in lockstep across operators for the mutual-
    * independence guarantee (and the DuckDB oracles) to hold, so
    * there is exactly one copy of the expression.
    */
  private[graft] def saltedMod(id: Column, salt: String, m: Long): Column =
    Text.portableHash(concat(id.cast("string"), lit("|" + salt))) % m

  /** Uniform bucket in [0, 10000) from the salted id hash. */
  def bucket(id: Column, salt: String): Column =
    saltedMod(id, salt, Buckets)

  /** Label each row train/val/test (or any named fractions) —
    * fractions in units of 1/10000. When the fractions sum below
    * 10000, rows past the last cut get the `rest` label if one is
    * given; without `rest` the fractions must cover all 10000 buckets
    * (a silent NULL split would drop rows from every downstream
    * split-equality filter).
    */
  def assign(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)], saltName: String = "split",
      outCol: String = "split", rest: Option[String] = None): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= Buckets,
      s"split fractions exceed $Buckets: $splits")
    // a non-positive fraction makes the cut ladder non-monotonic: the
    // negative split gets zero rows and its share silently leaks into
    // its neighbors — fail fast instead
    require(splits.forall(_._2 > 0),
      s"split fractions must be positive: $splits")
    require(rest.isDefined || splits.map(_._2).sum == Buckets,
      s"fractions sum to ${splits.map(_._2).sum} < $Buckets and no " +
        "`rest` label given — the remainder rows would get a NULL split")
    val b = bucket(col(idCol), saltName)
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val ladder = splits.zip(cuts)
      .foldRight(lit(rest.orNull): Column) {
        case (((name, _), cut), acc) => when(b < cut, lit(name)).otherwise(acc)
      }
    df.withColumn(outCol, ladder)
  }

  /** Deterministic k-fold id in [0, k). Independent of the split
    * bucket (different salt).
    */
  def fold(id: Column, k: Int, saltName: String = "fold"): Column =
    saltedMod(id, saltName, k).cast("int")

  /** Mixture balancing: deterministically downsample every stratum to
    * (approximately) the size of the RAREST stratum, so the output is
    * a uniform mixture — the domain-rebalancing step of corpus
    * curation. Per-stratum keep-threshold = (min_count * 10000) div
    * count, all exact integer arithmetic (`div`), membership by the
    * salted id hash — reproducible on any partitioning or engine.
    */
  def balanceStrata(df: DataFrame, idCol: String, strataCol: String,
      saltName: String = "mix"): DataFrame = {
    val reserved = Seq("__stratum", "__thr").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"balanceStrata: input collides with reserved names: $reserved")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val minCnt = counts.agg(min("__n").as("__mn"))
    val thresholds = counts.crossJoin(broadcast(minCnt))
      .select(col(strataCol).as("__stratum"),
        call_function("div", col("__mn") * Buckets, col("__n"))
          .as("__thr"))
    // null-safe join: a NULL stratum is a real stratum (it already
    // participates in the min via the groupBy above) — a plain
    // equi-join would let the NULL group set the global floor and
    // then silently drop every one of its rows
    df.join(broadcast(thresholds), col(strataCol) <=> col("__stratum"))
      .filter(bucket(col(idCol), saltName) < col("__thr"))
      .drop("__stratum", "__thr")
  }

  /** Stratified sample: per-stratum fraction (in 1/10000 units),
    * deterministic per id. Strata not in the map get `defaultFrac`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      fracs: Map[String, Int], defaultFrac: Int = 0,
      saltName: String = "sample"): DataFrame = {
    val fracLadder = fracs.toSeq.sortBy(_._1)
      .foldRight(lit(defaultFrac)) { case ((v, f), acc) =>
        when(col(strataCol) === v, lit(f)).otherwise(acc)
      }
    df.filter(bucket(col(idCol), saltName) < fracLadder)
  }
}
