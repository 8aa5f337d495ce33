package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain blocklist filtering with SUBDOMAIN semantics — the crawl-side
  * hygiene pass every web corpus runs before anything else: a host is
  * blocked if it equals a blocklist entry or sits below one
  * (`x.ads.example.com` matches entry `ads.example.com`). The naive
  * per-row scan is O(|blocklist|) string-endswith checks per host; this
  * operator decomposes each host into its dot-suffix chain (bounded by
  * label count, ~5 entries) and tests each against a broadcast hash set
  * — one O(1) lookup per suffix, map-only, zero shuffle.
  *
  * Blocklists up to ~10^7 domains broadcast fine (~100 MB of strings);
  * past that, swap the broadcast set for an inner join of the exploded
  * suffixes against a blocklist table (suffix explode is ≤ labels rows
  * per doc, and the join key is the suffix — uniform, broadcastable or
  * shuffled as size dictates). Same decomposition, different transport.
  */
object HostFilter {

  /** All dot-suffixes of a host, most-specific first:
    * a.b.com -> [a.b.com, b.com, com]. Null/empty-safe.
    */
  def suffixes(host: String): Seq[String] = {
    if (host == null || host.isEmpty) return Seq.empty
    val labels = host.split('.')
    labels.indices.map(i => labels.drop(i).mkString("."))
  }

  /** Keeps rows whose host matches NO blocklist entry at any suffix
    * level. Map-only (broadcast set + one UDF call per row).
    */
  def dropBlockedHosts(df: DataFrame, hostCol: String, blocklist: Seq[String]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(blocklist.toSet)
    val blocked = udf((h: String) => suffixes(h).exists(bc.value.contains))
    df.filter(!blocked(col(hostCol)))
  }
}
