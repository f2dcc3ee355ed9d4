package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighborhood-based link prediction over an undirected graph — the
  * "who should be connected" readout next to [[Triangles]] (who IS
  * cohesively connected): for each vertex, the top-k non-adjacent
  * vertices ranked by Adamic–Adar score
  * `AA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w)` (Adamic & Adar 2003) with
  * the raw common-neighbor count alongside. Feeds recommendation
  * ("suppliers you should co-source with"), entity-resolution candidate
  * generation, and graph-completion curation.
  *
  * Distributed shape: candidate pairs enumerate as wedges through their
  * common neighbor `w` — one self-join of the adjacency on the center,
  * exactly [[Triangles]]' wedge stage — then aggregate per pair and
  * anti-join the existing edge set (keyed equi-joins only, nothing
  * all-pairs). The scale control is `maxDeg`: a center vertex with
  * degree d fans out C(d,2) wedges, so super-hub centers are EXCLUDED
  * above the cap — principled, not just pragmatic, because a hub's
  * contribution per pair is 1/ln(deg) → 0 and connecting through a
  * celebrity node is precisely the non-evidence Adamic–Adar discounts
  * (the same bounded-candidates move as NGramJaccard's maxDocFreq).
  * Wedge volume is then ≤ Σ_{deg w ≤ maxDeg} C(deg w, 2) ≤ n·maxDeg²/2
  * regardless of hub structure. The oracle replays the identical cap.
  */
object LinkPrediction {

  /** (u, v, common_neighbors, aa, rank): top-`k` predicted partners per
    * vertex `u` over the undirected graph, v from u's non-neighbors,
    * ranked by (rounded aa desc, v) — rounding BEFORE the rank cut so
    * the selected set is engine-identical (the q94/q144 discipline).
    * Each unordered pair appears in both directions (u's list and v's),
    * like a recommendation surface should.
    */
  def adamicAdarTopK(edges: DataFrame, srcCol: String, dstCol: String,
                     k: Int, maxDeg: Int = 1000,
                     digits: Int = 6): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(maxDeg >= 2, s"need maxDeg >= 2, got $maxDeg")
    // canonical undirected edge set + degrees (the Triangles prologue)
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(explode(array(col("a"), col("b"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("deg"))
    // full (symmetric) adjacency keyed by the CENTER w, carrying the
    // center's degree once — the wedge join below pays deg² per center,
    // so the cap applies here, before any fan-out
    val adj = e.select(col("a").as("w"), col("b").as("n"))
      .union(e.select(col("b").as("w"), col("a").as("n")))
      .join(deg, "w")
      .filter(col("deg") <= maxDeg)
    // wedges (u < v) through w: each common neighbor contributes its
    // discount once per pair
    val pairScores = adj.as("x").join(adj.as("y"), "w")
      .filter(col("x.n") < col("y.n"))
      .select(col("x.n").as("u"), col("y.n").as("v"),
        (lit(1.0) / log(col("x.deg"))).as("__aa"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"), sum(col("__aa")).as("__aa"))
    // drop already-connected pairs; expand to both directions; top-k
    val predicted = pairScores
      .join(e.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
      .withColumn("aa", graft.functions.roundStable(col("__aa"), digits))
    val both = predicted
      .select(col("u"), col("v"), col("common_neighbors"), col("aa"))
      .union(predicted
        .select(col("v").as("u"), col("u").as("v"),
          col("common_neighbors"), col("aa")))
    val wTop = Window.partitionBy(col("u"))
      .orderBy(col("aa").desc, col("v"))
    both
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
  }

  /** (u, v, common_neighbors, jaccard, rank): top-`k` predicted
    * partners by NEIGHBORHOOD Jaccard
    * `J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)| = cn/(deg u + deg v − cn)` —
    * the complementary normalization to [[adamicAdarTopK]]: AA asks
    * "how RARE is the shared company" (weights each common neighbor),
    * Jaccard asks "what FRACTION of their worlds overlap" (penalizes
    * big neighborhoods as a whole) — a pair sharing 3 of 4 total
    * contacts outranks a pair sharing 10 of 200. Same wedge
    * enumeration, same `maxDeg` center cap with the same principle
    * (a hub's wedges say little under EITHER normalization), same
    * rounded-before-rank cut; the union size comes from the UNCAPPED
    * degree table — the cap bounds enumeration, never the denominator.
    */
  def jaccardTopK(edges: DataFrame, srcCol: String, dstCol: String,
                  k: Int, maxDeg: Int = 1000,
                  digits: Int = 6): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(maxDeg >= 2, s"need maxDeg >= 2, got $maxDeg")
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(explode(array(col("a"), col("b"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("deg"))
    val adj = e.select(col("a").as("w"), col("b").as("n"))
      .union(e.select(col("b").as("w"), col("a").as("n")))
      .join(deg, "w")
      .filter(col("deg") <= maxDeg)
    val cn = adj.as("x").join(adj.as("y"), "w")
      .filter(col("x.n") < col("y.n"))
      .select(col("x.n").as("u"), col("y.n").as("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"))
    val du = deg.select(col("w").as("u"), col("deg").as("__du"))
    val dv = deg.select(col("w").as("v"), col("deg").as("__dv"))
    val predicted = cn
      .join(e.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
      .join(du, "u").join(dv, "v")
      .withColumn("jaccard", graft.functions.roundStable(
        col("common_neighbors").cast("double") /
          (col("__du") + col("__dv") - col("common_neighbors")), digits))
    val both = predicted
      .select(col("u"), col("v"), col("common_neighbors"), col("jaccard"))
      .union(predicted
        .select(col("v").as("u"), col("u").as("v"),
          col("common_neighbors"), col("jaccard")))
    val wTop = Window.partitionBy(col("u"))
      .orderBy(col("jaccard").desc, col("v"))
    both
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
  }
}
