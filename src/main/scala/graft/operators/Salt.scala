package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew salting for equi-joins (SURVEY.md §5). A hot key concentrates
  * its rows in one shuffle partition; salting splits each skewed-side
  * key into `factor` sub-keys and replicates the other side `factor`
  * times, so a hot key fans out over `factor` partitions. AQE's skew
  * join handles sort-merge joins adaptively; explicit salting remains
  * the tool for aggregations-after-join and for engines/plans AQE does
  * not rewrite.
  */
object Salt {

  /** Inner/left equi-join with the LEFT side salted and the RIGHT side
    * replicated. The salt hashes the whole left row PLUS its
    * partition-local ordinal: byte-identical duplicate rows of a hot
    * key (the classic skew shape — sentinel keys, replayed records)
    * would all hash to one salt under a pure content hash and defeat
    * the fan-out. The salt only routes rows — the join result carries
    * no salt dependence, so results stay reproducible even though the
    * ordinal depends on the input partitioning.
    *
    * @param factor  number of sub-keys per join key (fan-out of a hot
    *                key); the right side is replicated this many times,
    *                so keep it small (8-32) and the right side narrow
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      factor: Int,
      joinType: String = "inner"): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting supports inner/left joins, not $joinType")
    val salted = left.withColumn("__salt",
      pmod(
        xxhash64((left.columns.map(col) :+ monotonically_increasing_id()).toIndexedSeq: _*),
        lit(factor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
