package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hyperlink extraction — the web-graph construction primitive of a
  * Common-Crawl pipeline (outlink edges feed PageRank / host graphs /
  * anchor-text features; the reference's corpus model stops at text, so
  * this extends the ingest layer the same way [[TextExtract]] does).
  *
  * Matches the CANONICAL anchor form `<a href="...">text</a>` (real
  * crawls html-normalize before this step, the same normalize-then-
  * extract split [[TextExtract]] uses). The pattern is deliberately
  * alternation-free with negated-class quantifiers only, so Java's
  * leftmost-first and RE2's leftmost-longest scans agree token for token
  * — the cross-engine constraint that lets the q_link_extract oracle
  * replay extraction with DuckDB's regexp_extract_all (same contract as
  * TextOps.bpeTokenCount / redactPii).
  *
  * Pure codegen regexp + array exprs: no UDF, no shuffle — extraction is
  * embarrassingly row-parallel at any corpus size. */
object LinkExtract {

  /** One capture for the href, one for the anchor text. Each negated
    * class runs to the next forced delimiter, so the match at any start
    * position is unique in both regex dialects. */
  val AnchorRe = "<a href=\"([^\"]*)\"[^>]*>([^<]*)</a>"

  /** Per-target anchor profile over an extracted edge list: in-degree,
    * distinct linking pages, and the dominant anchor text (highest
    * count, ties to the lexicographically greatest anchor — a
    * deterministic single max over (cnt, anchor) structs, no window).
    * Anchor text is the classic external description of a page (the
    * relevance signal crawl rankers and query-independent features use).
    * Two hash aggs + one join on href; the distinct-source count keys on
    * (href, src) in its partial phase, so a mega-hub target stays
    * parallel. */
  def anchorProfile(links: DataFrame): DataFrame = {
    val per = links.groupBy("href", "anchor").agg(count(lit(1)).as("cnt"))
    val top = per.groupBy("href")
      .agg(sum(col("cnt")).as("in_degree"),
        max(struct(col("cnt"), col("anchor"))).as("t"))
      .select(col("href"), col("in_degree"),
        col("t.anchor").as("top_anchor"), col("t.cnt").as("top_cnt"))
    val srcs = links.groupBy("href").agg(countDistinct(col("src")).as("n_sources"))
    top.join(srcs, "href")
      .select("href", "in_degree", "n_sources", "top_anchor", "top_cnt")
  }

  /** Crawl frontier: the distinct link targets NOT in the crawled set,
    * with their referrer counts — the next-fetch candidate list of an
    * incremental crawl, priority-ordered downstream by in-degree (the
    * classic frontier heuristic). `crawled` must have a single
    * `crawled_url` column. One left-anti join (broadcast or shuffle as
    * Catalyst sizes it) + one hash agg; no windows, so a mega-frontier
    * stays fully parallel. Output: (href, in_degree, n_referrers). */
  def frontier(links: DataFrame, crawled: DataFrame): DataFrame =
    links.join(crawled, col("href") === col("crawled_url"), "left_anti")
      .groupBy("href")
      .agg(count(lit(1)).as("in_degree"),
        countDistinct(col("src")).as("n_referrers"))

  /** Out-edges of every page: (src, pos, href, anchor) with pos the
    * 0-based order of appearance within the page. */
  def links(df: DataFrame, id: String, html: String): DataFrame = {
    val hrefs = regexp_extract_all(col(html), lit(AnchorRe), lit(1))
    val anchors = regexp_extract_all(col(html), lit(AnchorRe), lit(2))
    df.select(col(id).as("src"),
        posexplode(zip_with(hrefs, anchors,
          (h, a) => struct(h.as("href"), a.as("anchor")))).as(Seq("pos", "l")))
      .select(col("src"), col("pos"),
        col("l.href").as("href"), col("l.anchor").as("anchor"))
  }
}
