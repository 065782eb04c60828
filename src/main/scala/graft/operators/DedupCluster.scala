package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: candidate PAIRS from the Dedup family
  * say "a duplicates b"; deduplicating a corpus needs the transitive
  * closure — connected components — so each near-dup CLUSTER keeps
  * exactly one canonical document (a > b > c must not survive as both
  * "drop b" and "keep b").
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labelled with its own id; each round every node takes the min of its
  * label and its neighbors' labels; at fixpoint a component is labelled
  * with its minimum member id. One round = one hash join (edges ×
  * labels) + one min-aggregation — all key-equality shuffles, nothing
  * driver-side except the O(1) convergence probe. Rounds needed =
  * component diameter: near-dup clusters are clique-ish (diameter 1-3),
  * so propagation beats the O(log n) star-contraction algorithms'
  * constant factor there; a pathological long-chain graph needs
  * `maxIter` raised (the run fails loudly rather than returning a
  * silently half-merged labelling). Lineage is truncated with an eager
  * localCheckpoint per round — without it the iterated plan re-executes
  * every prior round each action; on a cluster prefer
  * `sparkContext.setCheckpointDir` + `checkpoint()` for fault-tolerant
  * truncation.
  */
object DedupCluster {

  /** Connected components of the undirected graph given as an
    * (idA, idB) pair list. Returns one row per node that appears in a
    * pair: (id, component) with component = min node id reachable.
    * Isolated documents never enter the edge list, so absence from the
    * output means "no duplicate". */
  def connectedComponents(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .localCheckpoint() // materialized once, re-joined every round
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("nc")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("nc")).as("nbr"))
      val step = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("__old"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
        .localCheckpoint()
      // probe on the materialized step — finds one changed row or none
      converged = step.filter(col("comp") < col("__old")).limit(1).count() == 0
      labels = step.select(col("id"), col("comp"))
      round += 1
    }
    require(converged,
      s"connected components did not converge within $maxIter rounds — " +
        "the pair graph has a long-diameter component; raise maxIter")
    labels
  }

  /** Keep one canonical document (the min id) per duplicate cluster:
    * non-canonical members leave via a left-anti join. Pass the same
    * pair list the Dedup family produced. */
  def dropDuplicates(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    val losers = connectedComponents(pairs, idA, idB, maxIter)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
