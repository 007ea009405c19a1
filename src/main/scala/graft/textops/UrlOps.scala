package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup — the standard first pass of
  * a Common-Crawl-style pipeline: two fetches of the same page differ only
  * in scheme case, default ports, `www.`, tracking query params, param
  * order, trailing slashes, and fragments, so URL-level dedup without
  * canonicalization undercounts duplicates badly.
  *
  * Everything here is codegen'd `functions._` column algebra (regexps +
  * array ops, no UDFs), chosen so the exact same semantics are
  * expressible in the DuckDB oracle: the regexes are alternation-free and
  * agree between Java regex and RE2, prefix tests use
  * startswith/starts_with (NOT `LIKE 'utm_%'` — `_` is a LIKE
  * wildcard), and param sort order is binary/ASCII in both engines.
  */
object UrlOps {

  /** Query params that never affect page identity (tracking). */
  val TrackingPrefixes: Seq[String] = Seq("utm_", "gclid=", "fbclid=", "ref=")

  /** Canonical form of a URL column:
    *   1. scheme and host lowercased; path/query case preserved
    *   2. leading `www.` stripped from the host
    *   3. default ports dropped (`:80` for http, `:443` for https)
    *   4. fragment dropped
    *   5. tracking params dropped ([[TrackingPrefixes]])
    *   6. surviving query params sorted (binary order)
    *   7. trailing slashes collapsed off the path; empty path -> `/`
    * Inputs without a `scheme://` prefix are returned trimmed-lowercase
    * as-is (opaque ids — never silently rewritten). */
  def canonicalUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = regexp_extract(rest, "^([^/?#]*)", 1)
    val host = regexp_replace(
      regexp_replace(lower(hostPort), ":[0-9]+$", ""), "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = (port =!= "") &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val pathQF = regexp_replace(rest, "^[^/?#]*", "")
    val rawPath = regexp_extract(pathQF, "^([^?#]*)", 1)
    val path = when(regexp_replace(rawPath, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val query = regexp_extract(pathQF, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !TrackingPrefixes.map(pre => p.startsWith(pre))
        .reduce[Column](_ || _))
    val sortedQuery = array_join(array_sort(params), "&")
    val canon = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(size(params) > 0, concat(lit("?"), sortedQuery)).otherwise(lit("")))
    when(scheme === "", lower(u)).otherwise(canon)
  }

  /** Registered domain-ish suffix of a canonical URL's host: the last two
    * dot-labels (heuristic — no public-suffix list ships here; good for
    * per-site stats on .com/.org-style hosts). */
  def domainOf(canonUrl: Column): Column = {
    val host = regexp_extract(canonUrl, "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }

  /** Per-domain corpus rollup — the first question asked of any crawl
    * (which sites dominate, how duplicated is each, how heavy are its
    * pages) and the input to per-domain quotas in a training-data mix.
    * URLs are canonicalized first so fetch-variant URLs of one page
    * don't inflate `n_urls`.
    *
    * Scale shape: one hash agg keyed by domain; the two distinct counts
    * are partial_aggregated per map side before the shuffle. Domain keys
    * are few relative to pages, but a mega-domain is a legitimately hot
    * key — Spark's two-phase distinct handles it without salting because
    * the first phase keys on (domain, value), which is high-cardinality.
    */
  /** Robots-style URL filter with longest-prefix-match semantics (RFC
    * 9309's most-specific-rule-wins, simplified to literal prefixes — no
    * `*`/`$` wildcards): `rules` is (host, prefix, allow); a URL matches
    * the rules of its host whose prefix starts its path, the LONGEST
    * prefix decides, equal-length ties go to disallow (conservative),
    * and an unmatched URL is allowed (robots default).
    *
    * Crawl hygiene at corpus scale: rules tables are per-host and tiny
    * (robots.txt is capped at 500 KiB per RFC 9309), so the rules side
    * is broadcast — the URL side never shuffles; the only wide op is a
    * per-URL window over the handful of matching rules.
    *
    * Output: one row per input row — (url, host, path, allowed,
    * rule_prefix; "" when no rule matched). */
  def robotsFilter(urls: org.apache.spark.sql.DataFrame, urlCol: String,
      rules: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val hostEx = regexp_extract(col(urlCol), "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)
    val pathEx = regexp_extract(col(urlCol), "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    val u = urls.select(col(urlCol), hostEx.as("host"),
      when(pathEx === "", "/").otherwise(pathEx).as("path"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(urlCol))
      .orderBy(length(col("prefix")).desc, col("allow").asc, col("prefix"))
    val best = u.join(broadcast(rules), Seq("host"))
      .where(col("path").startsWith(col("prefix")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(urlCol), col("prefix").as("rule_prefix"),
        col("allow").as("__allow"))
    u.join(best, Seq(urlCol), "left")
      .select(col(urlCol), col("host"), col("path"),
        coalesce(col("__allow"), lit(true)).as("allowed"),
        coalesce(col("rule_prefix"), lit("")).as("rule_prefix"))
  }

  /** Politeness-aware fetch schedule: all URLs of one host go to ONE
    * worker (so per-host rate limits are enforceable locally, no
    * cross-worker coordination), ordered deterministically within the
    * host (by URL) and spaced `delayMs` apart. Worker assignment hashes
    * the host through md5 (not xxhash64) so the schedule is replayable
    * in any engine — the md5-threshold split/mix rule applied to
    * routing. The only wide op is a per-host window; a mega-host is one
    * long queue BY DESIGN (that's what politeness means — throughput
    * comes from host parallelism, not intra-host).
    * Output: (url, host, worker, fetch_seq, fetch_at_ms). */
  def fetchSchedule(urls: org.apache.spark.sql.DataFrame, urlCol: String,
      workers: Int, delayMs: Long): org.apache.spark.sql.DataFrame = {
    require(workers >= 1 && delayMs >= 0, s"workers=$workers delayMs=$delayMs")
    val host = regexp_extract(col(urlCol), "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col(urlCol))
    urls.select(col(urlCol), host.as("host"))
      .withColumn("worker",
        (conv(substring(md5(col("host")), 1, 8), 16, 10).cast("long")
          % workers).cast("int"))
      .withColumn("fetch_seq", (row_number().over(w) - 1).cast("long"))
      .withColumn("fetch_at_ms", col("fetch_seq") * delayMs)
  }

  def domainStats(df: org.apache.spark.sql.DataFrame, urlCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val canon = canonicalUrl(col(urlCol))
    df.select(domainOf(canon).as("domain"), canon.as("_u"),
        col(textCol).as("_t"))
      .groupBy("domain").agg(
        count(lit(1)).as("n_pages"),
        countDistinct(col("_u")).as("n_urls"),
        countDistinct(md5(col("_t"))).as("n_unique_texts"),
        avg(length(col("_t"))).as("avg_chars"))
  }

  /** Web-archive revisit / content-drift rollup — the CDX-style dedup a
    * recurring crawl runs over its own history: a re-fetch whose payload
    * digest equals the PREVIOUS capture of the same URL is a "revisit"
    * (stored as a pointer, not a payload — WARC `revisit` records,
    * identical-payload-digest profile), while a digest change marks real
    * content drift. The reference service's upload-dedup concern
    * (identical encodings re-uploaded across runs) is the same shape one
    * level up the stack.
    *
    * Input: one row per capture (`urlCol`, `tsCol` ascending capture
    * order within a URL, `contentCol`). Output: one row per URL —
    *   n_captures, n_changes (captures whose digest differs from the
    *   previous capture), n_revisits (unchanged re-fetches =
    *   n_captures − 1 − n_changes; the storage the archive saves),
    *   n_versions (distinct digests), first_ts, last_change_ts (ts of
    *   the latest drift; first capture ts when the page never changed).
    *
    * Scale shape: one window + one agg, both hash-partitioned by URL —
    * capture history per URL is tiny (bounded by crawl frequency), so
    * there is no skew; nothing else shuffles. Digests are md5 so the
    * exact same rollup replays in SQL engines. */
  def revisitDiff(snapshots: org.apache.spark.sql.DataFrame, urlCol: String,
      tsCol: String, contentCol: String): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(urlCol)).orderBy(col(tsCol))
    snapshots
      .select(col(urlCol).as("url"), col(tsCol).cast("long").as("ts"),
        md5(col(contentCol).cast("binary")).as("digest"))
      .withColumn("changed",
        (lag(col("digest"), 1).over(w).isNotNull &&
          lag(col("digest"), 1).over(w) =!= col("digest")).cast("long"))
      .groupBy(col("url")).agg(
        count(lit(1)).as("n_captures"),
        sum(col("changed")).as("n_changes"),
        (count(lit(1)) - lit(1L) - sum(col("changed"))).as("n_revisits"),
        countDistinct(col("digest")).as("n_versions"),
        min(col("ts")).as("first_ts"),
        coalesce(max(when(col("changed") === 1L, col("ts"))),
          min(col("ts"))).as("last_change_ts"))
  }
}
