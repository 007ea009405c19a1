package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Blake2b256
import scala.util.hashing.MurmurHash3

/** Blocking-key generation + block metadata (SURVEY.md §2 B1-B3).
  *
  * The reference receives user-supplied block labels and BLAKE2b-hashes
  * them (`encoding_storage.py:238-242`); block membership is many-to-many
  * (`models/models.py:184-191`). Here blocks are derived from text via
  * MinHash-LSH bands over word tokens (BASELINE.json.north_star: "salted
  * blocking keys (minhash/LSH bands over token shingles)"), then hashed
  * with the same BLAKE2b-256 hexdigest as the reference.
  */
object Blocking {

  val DefaultBands = 8
  val DefaultRows = 4
  val DefaultSeed = 0x10c4

  /** MinHash-LSH band keys of a text: bands * rowsPerBand minhashes over
    * the token set; one block label per band. Pure, deterministic. */
  def lshKeys(text: String, bands: Int = DefaultBands,
      rowsPerBand: Int = DefaultRows, seed: Int = DefaultSeed): Array[String] = {
    val toks = ClkEncoder.tokens(text)
    if (toks.isEmpty) return Array(Blake2b256.hashName("1"))
    val nHashes = bands * rowsPerBand
    val mins = new Array[Int](nHashes)
    java.util.Arrays.fill(mins, Int.MaxValue)
    toks.foreach { t =>
      var j = 0
      while (j < nHashes) {
        val h = MurmurHash3.stringHash(t, seed + j * 0x9e3779b1)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
    }
    Array.tabulate(bands) { b =>
      val sig = new StringBuilder(s"b$b")
      var r = 0
      while (r < rowsPerBand) { sig.append(':').append(mins(b * rowsPerBand + r)); r += 1 }
      Blake2b256.hashName(sig.toString)
    }
  }

  /** B1: records+text -> exploded (.. , block_key) rows. Input must carry
    * a text column; output keeps all input columns. */
  def withLshBlocks(df: DataFrame, textCol: String,
      bands: Int = DefaultBands, rowsPerBand: Int = DefaultRows,
      seed: Int = DefaultSeed): DataFrame = {
    val keysUdf = udf((t: String) =>
      lshKeys(if (t == null) "" else t, bands, rowsPerBand, seed))
    df.withColumn("block_key", explode(keysUdf(col(textCol))))
  }

  /** P3: BLAKE2b-256 block-name hash as a column function. */
  def hashBlockName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val u = udf((s: String) => Blake2b256.hashName(if (s == null) "" else s))
    u(c)
  }

  /** B3: per-(dp, block) record counts (`database/insertions.py:50-67`). */
  def blockStats(blocked: DataFrame): DataFrame =
    blocked.groupBy(col("dp"), col("block_key")).agg(count(lit(1)).as("n"))

  /** B2: blocks common to a provider pair (dp0 < dp1)
    * (`tasks/comparing.py:173-187`). */
  def commonBlocks(blocked: DataFrame): DataFrame = {
    val per = blocked.select(col("dp"), col("block_key")).distinct()
    val l = per.select(col("block_key"), col("dp").as("dp0"))
    val r = per.select(col("block_key"), col("dp").as("dp1"))
    l.join(r, "block_key").where(col("dp0") < col("dp1"))
      .select(col("block_key"), col("dp0"), col("dp1"))
  }
}
