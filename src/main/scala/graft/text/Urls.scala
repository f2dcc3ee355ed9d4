package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-side dedup key (Bharat & Broder's
  * duplicate-URL problem): the same page arrives as `HTTP://WWW.X.COM:80
  * /a?utm_source=feed&id=3#top` and `http://x.com/a?id=3`, and every
  * downstream dedup/frequency stat double-counts until the URL itself is
  * normalized. Canonical form: lowercase scheme+host, `www.` and default
  * ports stripped, fragment dropped, tracking parameters
  * (`utm_*`/`fbclid`/`gclid`) removed, surviving query parameters
  * SORTED (parameter order is transport noise, not identity).
  *
  * Pure per-row expressions — regexp extraction in the conservative
  * subset that parses identically across engines (the C33 redaction
  * discipline) plus array split/filter/sort; map-only plan, zero
  * shuffles, so it canonicalizes 100 TB of crawl logs at scan speed.
  */
object Urls {

  private val urlRe = "^([A-Za-z]+)://([^/?#]+)([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** Append `canonical` (and `host`) for a URL column; malformed rows
    * (no scheme://host) get NULL canonical — visible, never guessed.
    */
  def canonicalize(df: DataFrame, urlCol: Column): DataFrame = {
    val scheme = lower(regexp_extract(urlCol, urlRe, 1))
    val rawHost = lower(regexp_extract(urlCol, urlRe, 2))
    // default-port stripping is SCHEME-AWARE: :80 is only the default for
    // http and :443 for https — http://x.com:443 is a distinct origin
    // from http://x.com and must NOT collapse (RFC 3986 §6.2.3 only
    // licenses dropping the scheme's own default port)
    val noWww = regexp_replace(rawHost, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val path = regexp_extract(urlCol, urlRe, 3)
    val query = regexp_extract(urlCol, urlRe, 4) // "?a=1&b=2" or ""
    // utm params may be digit/underscore-suffixed (utm_source_2, utm_id)
    val params = filter(
      split(regexp_replace(query, "^\\?", ""), "&"),
      p => !(p.rlike("^(utm_[A-Za-z0-9_]+|fbclid|gclid)=") || p === ""))
    val sortedQ = array_join(array_sort(params), "&")
    val canon = concat(scheme, lit("://"), host,
      when(path === "", "/").otherwise(path),
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
    df.withColumn("host", when(rawHost =!= "", host))
      .withColumn("canonical", when(scheme =!= "" && rawHost =!= "", canon))
  }

  /** Per-host crawl census over canonicalized URLs: raw URL count,
    * distinct canonical pages, and the duplication rate canonicalization
    * reveals — the per-site dedup payoff table.
    */
  def hostCensus(df: DataFrame, urlCol: Column,
                 digits: Int = 6): DataFrame =
    canonicalize(df, urlCol)
      .filter(col("canonical").isNotNull)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("canonical")).as("n_pages"))
      .select(col("host"), col("n_urls"), col("n_pages"),
        graft.functions.roundStable(lit(1.0) -
          col("n_pages").cast("double") / col("n_urls"), digits)
          .as("dup_rate"))
}
