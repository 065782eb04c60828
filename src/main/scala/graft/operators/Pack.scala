package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing: assign documents to fixed token-budget packs so a
  * training run wastes as little context as possible on padding. The
  * bin-packing itself is inherently sequential, so it runs greedily
  * WITHIN each partition (`mapPartitions`) — no shuffle, no
  * coordination: pack ids embed the partition id, so they are globally
  * unique without a barrier, and every partition packs in parallel.
  * Pack tightness depends on partition-local order; for tighter packs
  * range-partition by a length proxy upstream (short docs together
  * fill bins better). This is the standard distributed trade — an
  * optimal global packing would serialize the corpus.
  */
object Pack {

  /** Greedy sequential packing of (id, tokenCount) rows into bins of
    * `budget` tokens. Returns one row per document: (id, n_tokens,
    * pack_id). A document exceeding the budget gets its own pack
    * (training-side chunking decides what to do with it; packing must
    * not silently drop it). pack_id = partitionId << 33 | local bin —
    * the same 31/33 bit split as Spark's monotonically_increasing_id
    * (graft.plans.PartitionIds), so ids stay positive and collision-free
    * for any partition count Spark itself supports. The id must be an
    * integral column and a null token count packs as 0 tokens — both
    * checked/handled up front so a bad input fails the DRIVER with a
    * clear message, not an executor with an opaque NPE. */
  def greedyPack(
      docs: DataFrame,
      idCol: String,
      tokenCountCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val idOk = docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(idOk,
      s"greedyPack id column `$idCol` must be integral, found ${docs.schema(idCol).dataType}")
    require(docs.schema(tokenCountCol).dataType.isInstanceOf[NumericType],
      s"token count column `$tokenCountCol` must be numeric, found ${docs.schema(tokenCountCol).dataType}")
    val in = docs.select(
      col(idCol).cast("long").as("id"),
      coalesce(col(tokenCountCol).cast("long"), lit(0L)).as("n_tokens"))
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("n_tokens", LongType),
      StructField("pack_id", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    in.mapPartitions { rows =>
      val pidBase = TaskContext.getPartitionId().toLong << 33
      var bin = 0L
      var used = 0L
      // non-empty flag, not used > 0: a zero-token doc opens the bin
      // too, so an oversized doc never shares a pack with it
      var open = false
      rows.map { r =>
        val n = r.getLong(1)
        if (open && used + n > budget) { bin += 1; used = 0; open = false }
        used += n
        open = true
        Row(r.getLong(0), n, pidBase | bin)
      }
    }(enc)
  }
}
