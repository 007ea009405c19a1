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
