package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting (graph cohesion / community-density
  * metric; the clustering-coefficient numerator): count closed wedges in
  * an undirected graph.
  *
  * Algorithm: degree-based edge orientation (Suri & Vassilvitskii,
  * WWW'11 — "the curse of the last reducer"): orient every undirected
  * edge from its lower-(degree, id) endpoint to the higher one, so each
  * vertex's OUT-degree is bounded by ~sqrt(2m) even on power-law hubs;
  * wedges then enumerate from the oriented adjacency (join on the
  * wedge's center) and close against the oriented edge set. Both steps
  * are keyed equi-joins — nothing all-pairs, no hub blowup: a
  * degree-1M hub generates zero wedges as a center unless its neighbors
  * out-rank it, which orientation makes impossible for all but ~sqrt(m)
  * of them.
  */
object Triangles {

  /** Global triangle count over an undirected edge list (rows may carry
    * either orientation and duplicates; self-loops dropped). Returns one
    * row: (n_nodes, n_edges, n_wedges, n_triangles) — wedge count rides
    * the same pass and is the clustering-coefficient denominator.
    */
  def census(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // canonical undirected edge set: (lo, hi), dedup'd, no self-loops
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // undirected degree per vertex from both endpoints of the canonical
    // set — one explode + keyed agg
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient by (degree, id): u -> w iff (deg_u, u) < (deg_w, w)
    val withDeg = e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("u"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("w"))
    // wedges centered at u: (u; w1, w2) with w1 < w2 from u's oriented
    // out-neighborhood; close with the oriented edge (w1, w2) OR
    // (w2, w1) — orientation of the closing edge depends on degrees, so
    // check the canonical pair against the canonical closed set
    val wedges = oriented.as("x").join(oriented.as("y"), "u")
      .filter(col("x.w") < col("y.w"))
      .select(col("x.w").as("p"), col("y.w").as("q"))
    val closedCanon = oriented.select(
      least(col("u"), col("w")).as("p"), greatest(col("u"), col("w")).as("q"))
    val nTri = wedges.join(closedCanon
        .select(col("p"), col("q"), lit(1L).as("__hit")), Seq("p", "q"))
      .agg(count(lit(1)).as("n_triangles"))
    val nWedge = wedges.agg(count(lit(1)).as("n_wedges"))
    val totals = e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
    totals.crossJoin(nWedge).crossJoin(nTri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"))
  }

  /** Per-vertex triangle participation + local clustering coefficient
    * (each triangle credits all three corners): the node-level cohesion
    * feature. Same oriented enumeration; the closing join's three
    * corners explode back out and aggregate by vertex.
    */
  def perVertex(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("u"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("w"))
    val wedges = oriented.as("x").join(oriented.as("y"), "u")
      .filter(col("x.w") < col("y.w"))
      .select(col("u"), col("x.w").as("p"), col("y.w").as("q"))
    val closedCanon = oriented.select(
      least(col("u"), col("w")).as("p"), greatest(col("u"), col("w")).as("q"))
    val tri = wedges.join(closedCanon, Seq("p", "q"))
    val perNode = tri
      .select(explode(array(col("u"), col("p"), col("q"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
    // local clustering coefficient: 2·T_v / (deg_v · (deg_v − 1))
    deg.join(perNode, Seq("v"), "left")
      .select(col("v"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        graft.functions.roundStable(
          when(col("deg") >= 2,
            lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
              (col("deg") * (col("deg") - lit(1)))).otherwise(lit(0.0)),
          6).as("clustering_coef"))
  }

  /** One-row degree census — the shape readout that decides the
    * partitioning strategy BEFORE any expensive graph pass: node/edge
    * counts, degree extremes and mean, the power-law exponent by the
    * continuous MLE approximation `α = 1 + n / Σ ln(d/(d_min − ½))`
    * with d_min pinned to 1 (Clauset–Shalizi–Newman 2009 — every
    * term `ln(2d)` > 0, no zero-division island; α ≲ 2.5 = heavy-hub
    * regime where [[graft.operators.Skew]]'s salting earns its keep,
    * large α = homogeneous, skip it), and the hub's share of all edge
    * endpoints (`max_deg / 2E` — how much one key can concentrate on
    * one task). One degree aggregation, O(#nodes) after it.
    */
  def degreeCensus(edges: DataFrame, srcCol: String, dstCol: String,
                   digits: Int = 6): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    deg.agg(
      count(lit(1)).as("n_nodes"),
      (sum(col("deg")) / 2).cast("long").as("n_edges"),
      min(col("deg")).as("min_deg"),
      max(col("deg")).as("max_deg"),
      graft.functions.roundStable(
        sum(col("deg")).cast("double") / count(lit(1)), digits)
        .as("mean_deg"),
      graft.functions.roundStable(
        lit(1.0) + count(lit(1)).cast("double") /
          sum(log(col("deg").cast("double") / lit(0.5))), digits)
        .as("alpha_mle"),
      graft.functions.roundStable(
        max(col("deg")).cast("double") / sum(col("deg")), digits)
        .as("hub_endpoint_share"))
  }
}
