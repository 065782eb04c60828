package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** search_sorted (polars): the left insertion index of each probe into
  * the sorted corpus = the count of strictly smaller values.
  *
  * Probes are known at plan time, so the whole operator is ONE corpus
  * scan with a conditional-sum aggregate per probe — no join of any
  * kind (the naive probe×corpus nested-loop join materializes
  * |corpus|·|probes| intermediate rows; this form is a map-side
  * partial aggregate that reduces to a single row before the result
  * explodes back to (probe, insert_idx) pairs).
  */
object SearchSorted {

  /** @param side "left" (polars default: count of strictly smaller
    *        values — insert before any ties) or "right" (count of
    *        values ≤ probe — insert after the tie run). Same one-scan
    *        plan either way; only the comparison flips. */
  def insertionIndexes(
      df: DataFrame,
      valueCol: String,
      probes: Seq[Double],
      side: String = "left"): DataFrame = {
    require(probes.nonEmpty, "probes must be non-empty")
    require(side == "left" || side == "right", s"side must be left|right, got $side")
    val aggs = probes.zipWithIndex.map { case (p, i) =>
      val hit = if (side == "left") col(valueCol) < p else col(valueCol) <= p
      sum(when(hit, 1L).otherwise(0L)).as(s"__c$i")
    }
    val counted = df.agg(aggs.head, aggs.tail: _*)
    val pairs = probes.zipWithIndex.map { case (p, i) =>
      struct(lit(p).as("probe"),
        coalesce(col(s"__c$i"), lit(0L)).as("insert_idx"))
    }
    counted
      .select(explode(array(pairs: _*)).as("pi"))
      .select(col("pi.probe").as("probe"), col("pi.insert_idx").as("insert_idx"))
  }
}
