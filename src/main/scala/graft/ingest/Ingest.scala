package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.expr.popcount

/** Ingestion pipeline over the web-page corpus (SURVEY.md §3.1 Spark
  * equivalent): pages -> extracted text -> CLK encoding -> LSH blocking ->
  * the linkage input schema (dp, entity_id, clk, popcount, block_key).
  */
object Ingest {

  /** Extraction as a column op; used both to materialize text from html
    * and to verify the per-row invariant extract(html) == text. */
  val extractUdf = udf((html: Array[Byte]) =>
    if (html == null) ""
    else TextExtract.extract(new String(html, java.nio.charset.StandardCharsets.UTF_8)))

  val clkUdf = udf((text: String) =>
    ClkEncoder.encode(if (text == null) "" else text))

  /** pages -> one encoding row per page (no blocking yet). */
  def encodePages(pages: Dataset[Page]): DataFrame =
    pages.toDF()
      .withColumn("clk", clkUdf(col("text")))
      .withColumn("popcount", popcount(col("clk")))
      .select(col("dp"), col("entity_id"), col("clk"), col("popcount"),
        col("text"), col("truth_entity"))

  /** pages -> fully blocked linkage input (B1 explode over LSH bands). */
  def encodeAndBlock(pages: Dataset[Page],
      bands: Int = Blocking.DefaultBands,
      rowsPerBand: Int = Blocking.DefaultRows): DataFrame =
    Blocking.withLshBlocks(encodePages(pages), "text", bands, rowsPerBand)
      .select("dp", "entity_id", "clk", "popcount", "block_key")

  /** Count of rows violating the per-row invariant
    * extract(html) == text (must be 0; north-rule byte-identity check). */
  def extractMismatchCount(pages: Dataset[Page]): Long =
    pages.toDF()
      .where(not(extractUdf(col("html")) === col("text")))
      .count()
}
