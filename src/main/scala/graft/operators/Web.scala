package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL handling — the canonicalization step that runs BEFORE
  * url-keyed dedup in a crawl pipeline: the same page arrives as
  * `HTTPS://Site.COM:443/a/?utm_source=x&id=1#frag` and
  * `https://site.com/a?id=1`, and byte-equality dedup sees two documents
  * unless the keys are normalized first. Everything here is codegen'd
  * string/regex arithmetic (map-only, engine-portable — the oracle runs
  * the identical regexes), deliberately NOT `parse_url`, which DuckDB
  * lacks.
  */
object Web {

  private val TrackingRe = "^(utm_|ref=|fbclid=|gclid=)"

  /** RFC-3986-style practical canonical form: lowercase scheme+host, strip
    * default ports (`:443` https / `:80` http), drop the fragment, drop
    * tracking query params (`utm_*`, `ref`, `fbclid`, `gclid`), sort the
    * remaining params bytewise, collapse trailing path slashes (root stays
    * `/`). Path case is preserved (paths are case-sensitive).
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    val scheme = lower(regexp_extract(noFrag, schemeRe, 1))
    val hostport = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    val path0 = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val trimmed = regexp_replace(path0, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val q0 = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(q0, "&"), p =>
      !lower(p).rlike(TrackingRe) && p =!= ""))
    concat(scheme, lit("://"), host, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /** URL-keyed dedup rollup: canonicalize and count how many raw variants
    * and distinct documents collapse onto each canonical key — the crawl
    * frontier's dedup ledger. One map-only projection + one combinable
    * aggregation.
    *
    * Output: `(canonical_url, n_variants, n_docs, min_doc)`.
    */
  def urlDedup(df: DataFrame, id: String, url: String): DataFrame =
    df.where(col(url).isNotNull)
      .select(col(id), canonicalizeUrl(col(url)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_variants"),
        count_distinct(col(id)).as("n_docs"),
        min(col(id)).as("min_doc"))
      .orderBy(col("canonical_url"))
}
