package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hashing trick (Weinberger et al. ICML'09): fixed-`dim` sparse
  * feature vectors from unbounded vocabulary, with NO vocabulary table
  * — the map-only text vectorizer for linear/GBM quality filters over
  * a 100 TB corpus (a fitted vocabulary is itself corpus-sized state;
  * the hash needs none). Each token lands in `md5₄₀(token) mod dim`
  * with a ±1 sign from an independent hash digit — the signed sum
  * makes collisions cancel in expectation (the paper's
  * inner-product-preservation argument) instead of always inflating.
  *
  * Cross-engine: the md5 hex-prefix integer convention (the
  * [[Winnow]] hash), so an oracle replays the exact bucketing and
  * signs. Map-side explode + ONE (doc, feature) aggregation; exact
  * zero-sum features (all-cancelled collisions) drop — they carry no
  * signal and long-form sparse output should stay sparse.
  */
object HashFeatures {

  def hashFeatures(docs: DataFrame, idCol: String, textCol: String,
                   dim: Int = 1024): DataFrame = {
    require(dim >= 2, s"need dim >= 2, got $dim")
    val tok = explode(split(col(textCol), " ")).as("__tok")
    val h = md5(col("__tok"))
    val idx = pmod(conv(substring(h, 1, 10), 16, 10).cast("long"), lit(dim))
    val sign = conv(substring(h, 11, 1), 16, 10).cast("long") % 2 * 2 - 1
    docs.select(col(idCol), tok)
      .filter(col("__tok") =!= "")
      .select(col(idCol), idx.as("feature"), sign.as("__s"))
      .groupBy(col(idCol), col("feature"))
      .agg(sum(col("__s")).as("value"))
      .filter(col("value") =!= 0L)
  }
}
