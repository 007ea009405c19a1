package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal WARC (Web ARChive, ISO 28500) sink + source — the native
  * container of Common-Crawl-style corpora, which is exactly the input
  * shape this engine targets. A crawl dump lands as huge WARC files; the
  * ingest question at 100 TB is whether ONE multi-GB file parallelizes.
  *
  * Source: the text datasource with a custom record separator
  * (`lineSep = "WARC/1.0\r\n"`). Hadoop's delimiter-framed line reader
  * gives RECORD-ALIGNED byte-range splits — each task seeks its offset
  * and scans forward to the next record boundary — so a single large
  * WARC file fans out across executors with no preprocessing (the same
  * property the clk DataSourceV2 engineers by fixed record width).
  * Header fields and the Content-Length-framed payload are then parsed
  * with pure codegen string exprs (no UDF).
  *
  * Honest limitations vs full ISO 28500 (documented, spec-pinned):
  *  - records are framed by the version line for SPLITTING, so payloads
  *    must not contain "WARC/1.0\r\n" (true for text/html corpora; a
  *    gzip-member WARC needs a binary-aware source instead);
  *  - payload slicing is character-based, so non-ASCII payloads need
  *    the binary source too (Content-Length is octets).
  */
object WarcIO {

  /** Record separator: every WARC record starts with its version line. */
  val Delim = "WARC/1.0\r\n"

  /** Serialize one response record. `date` is a preformatted
    * `YYYY-MM-DDThh:mm:ssZ` string column (WARC-Date wire format).
    * The trailing CRLF completing the record's double-CRLF terminator
    * comes from the writer's lineSep. */
  def warcRecord(url: Column, date: Column, payload: Column): Column =
    concat(lit(Delim),
      lit("WARC-Type: response\r\n"),
      lit("WARC-Target-URI: "), url, lit("\r\n"),
      lit("WARC-Date: "), date, lit("\r\n"),
      lit("Content-Length: "), octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n"))

  /** Write (url, date, payload) rows as a WARC file set. */
  def writeWarc(df: DataFrame, path: String, url: String = "url",
      date: String = "date", payload: String = "payload"): Unit =
    df.select(warcRecord(col(url), col(date), col(payload)).as("value"))
      .write.mode("overwrite").option("lineSep", "\r\n").text(path)

  /** Read a WARC file set back as
    * (url, warc_type, warc_date, content_length, payload). */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", Delim).text(path)
      .where(length(col("value")) > 0) // the split before the first record
    val hEnd = locate("\r\n\r\n", col("value"))
    val headers = col("value").substr(lit(1), hEnd - 1)
    val clen = regexp_extract(headers, "Content-Length: (\\d+)", 1).cast("int")
    raw.select(
      regexp_extract(headers, "WARC-Target-URI: ([^\r]*)", 1).as("url"),
      regexp_extract(headers, "WARC-Type: ([^\r]*)", 1).as("warc_type"),
      regexp_extract(headers, "WARC-Date: ([^\r]*)", 1).as("warc_date"),
      clen.as("content_length"),
      col("value").substr(hEnd + 4, clen).as("payload"))
  }
}
