package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ingest.Blocking
import scala.util.hashing.MurmurHash3

/** Deduplication operators for a training-data pipeline: exact
  * (hash-groupBy), MinHash+LSH near-dup, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup. Exact/Jaccard/cosine are pure DataFrame
  * plans (SQL-replayable); MinHash/SimHash signatures are deterministic
  * Scala UDFs verified against brute-force oracles in DedupSpec.
  */
object Dedup {

  /** Exact dedup on a key: one keeper (min id) per group + group size.
    * Scale shape: a single hash-aggregate — the canonical exact-dedup plan
    * (map-side partial agg, no join). */
  def exactGroups(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("group_size"))

  /** Word n-gram Jaccard similarity between two texts' distinct-token
    * sets, as a column expression (array_intersect / union sizes). */
  def jaccard(a: Column, b: Column): Column = {
    val ta = array_distinct(split(a, " "))
    val tb = array_distinct(split(b, " "))
    val inter = size(array_intersect(ta, tb)).cast("double")
    round(inter / (size(ta) + size(tb) - inter), 4)
  }

  /** n-gram Jaccard near-dup pairs within candidate blocks: block on a
    * cheap key first (never all-pairs), then score. Token sets are
    * computed once per document, not once per pair. `blockKey` must be a
    * deterministic function of the text columns. */
  def jaccardPairs(df: DataFrame, id: String, text: String, blockKey: Column,
      threshold: Double): DataFrame = {
    val base = df.select(blockKey.as("bk"), col(id).as("doc"),
      array_distinct(split(col(text), " ")).as("toks"))
    val l = base.select(col("bk"), col("doc").as("id0"), col("toks").as("tk0"))
    val r = base.select(col("bk"), col("doc").as("id1"), col("toks").as("tk1"))
    val inter = size(array_intersect(col("tk0"), col("tk1"))).cast("double")
    l.join(r, "bk").where(col("id0") < col("id1"))
      .withColumn("jaccard",
        round(inter / (size(col("tk0")) + size(col("tk1")) - inter), 4))
      .where(col("jaccard") >= threshold)
      .select("id0", "id1", "jaccard")
  }

  /** Word-bigram shingles of a text (deduplicated). Bigrams discriminate
    * documents whose unigram vocabularies overlap heavily (a small-vocab
    * corpus makes unigram MinHash buckets degenerate to all-pairs —
    * measured as a 1000x blowup on the synthetic tables). */
  def shingles2(text: String): Array[String] = {
    val toks = graft.ingest.ClkEncoder.tokens(text)
    if (toks.length < 2) toks
    else Array.tabulate(toks.length - 1)(i => toks(i) + " " + toks(i + 1)).distinct
  }

  private def minhashBandKeys(sh: Array[String], bands: Int, rows: Int,
      seed: Int): Array[String] = {
    if (sh.isEmpty) return Array("b:empty")
    val nh = bands * rows
    val mins = Array.fill(nh)(Int.MaxValue)
    sh.foreach { s =>
      var j = 0
      while (j < nh) {
        val h = MurmurHash3.stringHash(s, seed + j * 0x9e3779b1)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
    }
    Array.tabulate(bands) { b =>
      val sb = new StringBuilder(s"b$b")
      var r = 0
      while (r < rows) { sb.append(':').append(mins(b * rows + r)); r += 1 }
      sb.toString
    }
  }

  /** MinHash-LSH near-dup candidate pairs over word-bigram shingles:
    * band-bucket join, then exact shingle-Jaccard confirm on arrays
    * precomputed once per document (never re-tokenized per pair). The
    * scale path: cost is O(bucket collisions), not O(n^2). */
  def minhashLshPairs(df: DataFrame, id: String, text: String,
      threshold: Double, bands: Int = 8, rowsPerBand: Int = 4,
      seed: Int = 0xd5ed): DataFrame = {
    val shUdf = udf((t: String) => shingles2(if (t == null) "" else t))
    val keysUdf = udf((sh: Seq[String]) =>
      minhashBandKeys(if (sh == null) Array.empty else sh.toArray, bands, rowsPerBand, seed))
    val base = df.select(col(id).as("doc"), shUdf(col(text)).as("sh"))
      .withColumn("bk", explode(keysUdf(col("sh"))))
    val l = base.select(col("bk"), col("doc").as("id0"), col("sh").as("sh0"))
    val r = base.select(col("bk"), col("doc").as("id1"), col("sh").as("sh1"))
    val inter = size(array_intersect(col("sh0"), col("sh1"))).cast("double")
    l.join(r, "bk").where(col("id0") < col("id1"))
      .dropDuplicates("id0", "id1")
      .withColumn("jaccard",
        round(inter / (size(col("sh0")) + size(col("sh1")) - inter), 4))
      .where(col("jaccard") >= threshold)
      .select("id0", "id1", "jaccard")
  }

  /** 64-bit SimHash over word tokens (sign-sum of per-token hash bits). */
  def simhash64(text: String): Long = {
    val toks = graft.ingest.ClkEncoder.tokens(text)
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h1 = MurmurHash3.stringHash(t, 0x51a7)
      val h2 = MurmurHash3.stringHash(t, 0x51a8)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  val simhashUdf = udf((t: String) => simhash64(if (t == null) "" else t))

  /** SimHash near-dup pairs with Hamming distance <= maxDist, bucketed by
    * 16-bit bands (a pair within distance d <= 3 shares at least one of 4
    * bands — pigeonhole), so no all-pairs comparison. */
  def simhashPairs(df: DataFrame, id: String, text: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-band pigeonhole covers Hamming distance <= 3")
    val sh = df.select(col(id).as("doc"), simhashUdf(col(text)).as("sh"))
    val banded = sh.withColumn("band", explode(array((0 until 4).map(lit): _*)))
      .withColumn("bkey", concat(col("band"), lit(":"),
        expr("(sh >> (band * 16)) & 65535")))
    val l = banded.select(col("bkey"), col("doc").as("id0"), col("sh").as("sh0"))
    val r = banded.select(col("bkey"), col("doc").as("id1"), col("sh").as("sh1"))
    l.join(r, "bkey").where(col("id0") < col("id1"))
      .dropDuplicates("id0", "id1")
      .withColumn("dist", bit_count(col("sh0").bitwiseXOR(col("sh1"))))
      .where(col("dist") <= maxDist)
      .select("id0", "id1", "dist")
  }

  /** Cosine similarity of two double-array columns (codegen'd dot/norm,
    * deterministic left-to-right order — bit-compatible with a sequential
    * oracle). */
  def cosine(a: Column, b: Column): Column =
    graft.expr.dotProduct(a, b) / (graft.expr.vectorNorm(a) * graft.expr.vectorNorm(b))

  /** Embedding-cosine near-dup pairs above a threshold. Norms precomputed
    * per row; all-pairs join — adequate below ~10^5 vectors; the scale
    * path is Ann.lshTopK's hyperplane bucketing. */
  def embeddingCosinePairs(df: DataFrame, id: String, vec: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(id).as("vid"), col(vec).cast("array<double>").as("v"))
      .withColumn("nrm", graft.expr.vectorNorm(col("v")))
    val l = v.select(col("vid").as("id0"), col("v").as("v0"), col("nrm").as("n0"))
    val r = v.select(col("vid").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
    l.crossJoin(r).where(col("id0") < col("id1"))
      .withColumn("cos",
        round(graft.expr.dotProduct(col("v0"), col("v1")) / (col("n0") * col("n1")), 6))
      .where(col("cos") >= threshold)
      .select("id0", "id1", "cos")
  }
}
