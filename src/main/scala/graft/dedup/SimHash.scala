package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash fingerprinting + hamming-band near-dup candidates.
  *
  * fingerprint bit i = sign of Σ_tokens (±1), where the ±1 is bit i of
  * xxhash64(token). Near-identical token multisets flip few bits, so
  * near-dups sit at small hamming distance. Banding the 64 bits into 8
  * 8-bit segments guarantees any pair within hamming distance 7 shares
  * at least one full segment (pigeonhole) — candidate generation is a
  * keyed join on (segment index, segment value), never all-pairs.
  * (4x16-bit banding was measured to miss hamming-4 pairs on the test
  * corpus; 8 segments trade more candidates for guaranteed recall.)
  */
object SimHash {

  /** (id, simhash) — one 64-bit fingerprint per row, computed by the
    * one-pass [[graft.functions.SimHashAgg]] (one 64-counter buffer per
    * group instead of 64 sum-aggregate columns).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .groupBy(col(idCol))
      .agg(graft.functions.SimHashAgg.simhash(col("h")).as("simhash"))

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** Candidate pairs within maxHamming (<= 7 for exact recall), via
    * 8-bit segment banding.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    val fps = fingerprints(df, idCol, textCol)
    val segs = (0 until 8).map { s =>
      struct(lit(s).as("seg"),
        shiftright(col("simhash"), s * 8).bitwiseAND(lit(0xFFL)).as("sv"))
    }
    val banded = fps.select(col(idCol).as("id"), col("simhash"),
      explode(array(segs: _*)).as("t"))
      .select(col("id"), col("simhash"), col("t.seg").as("seg"), col("t.sv").as("sv"))
    banded.as("a").join(banded.as("b"), Seq("seg", "sv"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
