package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 merge (Kimball): fold a batch of
  * timestamped attribute updates into a versioned dimension table that
  * keeps full history — each key carries a chain of rows
  * `(valid_from, valid_to, is_current)` where `valid_to` is null on the
  * open version. The MERGE-INTO-with-history warehouse primitive that
  * plain Spark lacks (Delta/Iceberg ship it as a table service; here it
  * is a pure DataFrame → DataFrame plan so any sink works).
  *
  * Semantics (all deterministic):
  *   1. updates are folded per key in `tsCol` order; consecutive equal
  *      attribute tuples collapse (keep-first) — a re-stated value is
  *      not a new version;
  *   2. the first surviving update also collapses against the key's
  *      CURRENT open version (re-confirming the present value is a
  *      no-op);
  *   3. each surviving update becomes a version: `valid_from = ts`,
  *      `valid_to = lead(ts)` — the previously-open row closes at the
  *      first new version's `valid_from`;
  *   4. keys never seen before enter with their first version open;
  *      closed history rows pass through untouched.
  *
  * Scale shape: closed history is UNION'd through with zero shuffle —
  * only open rows join the update batch (one keyed shuffle; AQE
  * broadcasts a small batch at runtime, never a static hint — the
  * backfill path feeds whole tables here). The per-key chain is one
  * window over the batch, partitioned by key: O(|updates|), never
  * O(|dimension|). At warehouse scale, pair with [[graft.sources.Io]]
  * bucketed-by-key layout so the touched-partition rewrite (and the
  * open-row join) prunes to the batch's buckets.
  *
  * Ties within (key, ts) are rejected up front (`require`) rather than
  * silently folded: two versions at one instant have no defined order,
  * and the engines would disagree on the survivor.
  */
object Scd2 {

  /** Initialize a dimension from a snapshot: every key's single version
    * open from `epoch`. Columns: keys ++ attrs ++ (valid_from, valid_to,
    * is_current).
    */
  def init(snapshot: DataFrame, keys: Seq[String], attrs: Seq[String],
           epoch: String): DataFrame =
    snapshot.select((keys ++ attrs).map(col): _*)
      .withColumn("valid_from", to_date(lit(epoch)))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

  /** Merge `updates` (keys ++ attrs ++ tsCol, one row per key per
    * instant) into `dim` (shaped as [[init]] produces). Returns the new
    * dimension table.
    *
    * `deleteCol` (boolean, optional) marks TOMBSTONES — a CDC delete:
    * the key's open version closes at the tombstone's ts and no new
    * version opens (the key has no current row until a later update
    * re-adds it). Tombstones participate in the per-key chain — a
    * value update AFTER a delete opens a fresh version even if its
    * attributes equal the pre-delete value (the flag is part of the
    * collapse tuple) — but emit no row themselves. A tombstone for a
    * key with no open version is a no-op.
    */
  def merge(dim: DataFrame, updates: DataFrame, keys: Seq[String],
            attrs: Seq[String], tsCol: String,
            deleteCol: Option[String] = None): DataFrame = {
    val keyCols = keys.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col(tsCol))
    val attrTuple = struct(attrs.map(col): _*)
    val isDel = deleteCol
      .map(c => coalesce(col(c).cast("boolean"), lit(false)))
      .getOrElse(lit(false))
    // the collapse tuple carries the tombstone flag: a delete never
    // collapses against a value row, and vice versa
    val cmpTuple = struct((attrs.map(col) :+ col("__del")): _*)

    // 1. collapse consecutive equal tuples per key
    //    (keep-first; <=> so null-valued attrs compare stably)
    val chained = updates
      .withColumn("__del", isDel)
      .withColumn("__prev", lag(cmpTuple, 1).over(w))
      .filter(!(col("__prev") <=> cmpTuple))

    val open = dim.filter(col("is_current"))
    val closed = dim.filter(!col("is_current"))

    // 2. collapse the first surviving update against the open version
    //    (a tombstone never collapses — it must close the open row)
    val openAttrs = open.select((keyCols :+
      struct(attrs.map(col): _*).as("__cur")): _*)
    val surviving = chained
      .withColumn("__rn", row_number().over(w))
      .join(openAttrs, keys, "left")
      .filter(col("__rn") =!= 1 || col("__del") ||
        !(col("__cur") <=> attrTuple))

    // 3. re-chain the survivors: valid_from = ts, valid_to = lead(ts);
    //    tombstones bound their predecessor's interval but emit nothing
    val versions = surviving
      .withColumn("valid_from", col(tsCol).cast("date"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w).cast("date"))
      .withColumn("is_current", col("valid_to").isNull && !col("__del"))

    // first NEW survivor per key closes the previously-open row
    // (a leading tombstone closes it too)
    val firstNew = versions
      .withColumn("__first", row_number().over(w))
      .filter(col("__first") === 1)
      .select((keyCols :+ col("valid_from").as("__close_at")): _*)

    val openMerged = open.join(firstNew, keys, "left")
      .withColumn("valid_to",
        when(col("__close_at").isNotNull, col("__close_at"))
          .otherwise(col("valid_to")))
      .withColumn("is_current", col("__close_at").isNull)
      .drop("__close_at")

    val out = (keys ++ attrs).map(col) ++
      Seq(col("valid_from"), col("valid_to"), col("is_current"))
    closed.select(out: _*)
      .unionByName(openMerged.select(out: _*))
      .unionByName(versions.filter(!col("__del")).select(out: _*))
  }

  /** Guard: reject (key, ts) collisions in an update batch — two
    * versions at one instant have no defined order. Returns the batch
    * unchanged; call before [[merge]] when the feed is untrusted.
    */
  def requireUniqueInstants(updates: DataFrame, keys: Seq[String],
                            tsCol: String): DataFrame = {
    val dupes = updates.groupBy((keys :+ tsCol).map(col): _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dupes == 0,
      s"SCD2 update batch has (${keys.mkString(",")}, $tsCol) collisions")
    updates
  }

  /** Point-in-time lookup: the version of each key valid at `asOf`
    * (half-open interval [valid_from, valid_to)).
    */
  def snapshotAt(dim: DataFrame, asOf: String): DataFrame =
    dim.filter(col("valid_from") <= to_date(lit(asOf)) &&
      (col("valid_to").isNull || col("valid_to") > to_date(lit(asOf))))

  /** Temporal fact enrichment — the reason warehouses keep SCD2: join
    * each fact row to the dimension version valid AT ITS OWN timestamp
    * (half-open `[valid_from, valid_to)`, so a fact on a version's first
    * day sees the new version). Left join: facts predating every version
    * keep null attributes. The key equality drives the join (sort-merge /
    * shuffled-hash on the key — never a nested loop); the interval test
    * rides along as a join residual, and each (key, ts) matches at most
    * one version because a key's intervals partition the timeline.
    */
  def temporalJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                   tsCol: String): DataFrame = {
    val f = facts.alias("f")
    val d = dim.alias("d")
    val keyCond = keys.map(k => col(s"f.$k") === col(s"d.$k")).reduce(_ && _)
    val cond = keyCond &&
      col(s"f.$tsCol") >= col("d.valid_from") &&
      (col("d.valid_to").isNull || col(s"f.$tsCol") < col("d.valid_to"))
    val attrCols = dim.columns
      .filterNot(keys.contains)
      .filterNot(Set("valid_from", "valid_to", "is_current"))
      .map(c => col(s"d.$c"))
    f.join(d, cond, "left")
      .select(facts.columns.map(c => col(s"f.$c")) ++ attrCols: _*)
  }
}
