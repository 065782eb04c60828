package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The bit layout of `monotonically_increasing_id`: partition id in the
  * upper 31 bits, 0-based record number within the partition in the
  * lower 33. Shared by every rank-reconstruction trick built on it
  * (GDataset.withRowIndex, Quantiles.exactQuantiles) so the layout
  * assumption lives in exactly one place.
  */
object PartitionIds {
  val LocalPosMask: Long = (1L << 33) - 1

  /** Partition id encoded in a monotonically_increasing_id column. */
  def pid(mid: Column): Column = call_function("shiftright", mid, lit(33))

  /** 0-based position within the partition. */
  def localPos(mid: Column): Column = mid.bitwiseAND(lit(LocalPosMask))
}
