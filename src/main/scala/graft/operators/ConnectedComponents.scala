package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Min-label connected components over an undirected edge list — the
  * missing third stage of near-duplicate removal at corpus scale:
  * pair finding (MinHash/NGram/SimHash) emits EDGES, but correct dedup
  * needs the transitive CLUSTERS (a↔b, b↔c must collapse to one
  * canonical document even when a↔c was never emitted as a pair).
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round every node adopts the minimum label
  * in its closed neighborhood; convergence when no label changes. Each
  * round is two keyed shuffles (edge join + min-aggregate) and the
  * driver sees only a change COUNT per round — labels never collect.
  * Rounds needed = graph diameter, which for near-dup clusters is small
  * (dup families are dense); for adversarially long path graphs the
  * alternating large-star/small-star transform (Kiveris et al.,
  * "Connected Components in MapReduce", SoCC'14) converges in
  * O(log n) rounds with the same per-round shuffle shape and is the
  * drop-in replacement.
  *
  * Deterministic: the component id is the minimum member id — no RNG,
  * no partition dependence.
  */
object ConnectedComponents {

  /** (node, comp) for every node appearing in `edges`; comp = min node
    * id of the connected component. Fails loudly if `maxIters` rounds
    * don't reach a fixpoint (diameter > maxIters).
    */
  def minLabel(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 25): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
    // symmetrize once: propagation below only needs one direction per
    // stored edge because both endpoints are present as sources
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val spark = edges.sparkSession
    // Iterative plans EXPLODE without lineage truncation: each round
    // references the previous labels twice (neighborhood union + change
    // count), doubling the Catalyst tree per round — 12 rounds is a
    // gigabyte-scale plan string and an OOM before any data moves. Each
    // round therefore re-roots its (persisted, fully materialized)
    // result as a fresh LogicalRDD: constant-size plan, and recompute
    // reads the previous round's cached blocks.
    def reRoot(df: DataFrame): DataFrame = {
      val cut = spark.createDataFrame(df.rdd, df.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
      cut.count() // materialize so the parent can be released
      cut
    }
    // seed with the closed-neighborhood min directly (node vs its
    // neighbors) — identical to running one propagation round on
    // identity labels, but free: it rides the same groupBy that the
    // distinct node set needs anyway, saving one full round
    var labels = reRoot(sym.groupBy(col("a").as("node"))
      .agg(least(min(col("b")), col("a")).as("comp")))

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      // min label over the closed neighborhood: the node's own label and
      // every neighbor's label (one keyed join + one min-aggregate)
      val nbr = sym.join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .select(col("a").as("node"), col("comp"))
      val next = reRoot(labels.select(col("node"), col("comp"))
        .union(nbr)
        .groupBy("node").agg(min(col("comp")).as("comp")))
      changed = next.join(labels.withColumnRenamed("comp", "old"), Seq("node"))
        .filter(col("comp") =!= col("old")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    require(changed == 0,
      s"connected components did not converge in $maxIters rounds — " +
        "graph diameter exceeds the cap; raise maxIters or switch to star transforms")
    val out = labels.localCheckpoint()
    labels.unpersist()
    sym.unpersist()
    out
  }
}
