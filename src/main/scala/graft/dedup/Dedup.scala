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
    * cheap key first (never all-pairs), then score. `blockKey` must be a
    * deterministic function of the text columns. */
  def jaccardPairs(df: DataFrame, id: String, text: String, blockKey: Column,
      threshold: Double): DataFrame = {
    val l = df.select(blockKey.as("bk"), col(id).as("id0"), col(text).as("t0"))
    val r = df.select(blockKey.as("bk"), col(id).as("id1"), col(text).as("t1"))
    l.join(r, "bk").where(col("id0") < col("id1"))
      .withColumn("jaccard", jaccard(col("t0"), col("t1")))
      .where(col("jaccard") >= threshold)
      .select("id0", "id1", "jaccard")
  }

  /** MinHash-LSH near-dup candidate pairs: band-bucket join (reuses the
    * linkage blocking) then exact-Jaccard confirm. The scale path: cost is
    * O(collisions), not O(n^2). */
  def minhashLshPairs(df: DataFrame, id: String, text: String,
      threshold: Double, bands: Int = 16, rowsPerBand: Int = 2,
      seed: Int = 0xd5ed): DataFrame = {
    val withKeys = df.select(col(id).as("doc"), col(text).as("txt"))
      .withColumn("bk", explode(udf((t: String) =>
        Blocking.lshKeys(if (t == null) "" else t, bands, rowsPerBand, seed)).apply(col("txt"))))
    val l = withKeys.select(col("bk"), col("doc").as("id0"), col("txt").as("t0"))
    val r = withKeys.select(col("bk"), col("doc").as("id1"), col("txt").as("t1"))
    l.join(r, "bk").where(col("id0") < col("id1"))
      .select("id0", "id1", "t0", "t1").dropDuplicates("id0", "id1")
      .withColumn("jaccard", jaccard(col("t0"), col("t1")))
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

  /** Cosine similarity of two double-array columns (deterministic
    * left-to-right fold — bit-compatible with a sequential oracle). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na = sqrt(aggregate(a, lit(0.0), (s, x) => s + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (s, x) => s + x * x))
    dot / (na * nb)
  }

  /** Embedding-cosine near-dup pairs above a threshold. All-pairs join —
    * adequate below ~10^5 vectors; the scale path is Ann.lshTopK's
    * hyperplane bucketing. */
  def embeddingCosinePairs(df: DataFrame, id: String, vec: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(id).as("vid"), col(vec).cast("array<double>").as("v"))
    val l = v.select(col("vid").as("id0"), col("v").as("v0"))
    val r = v.select(col("vid").as("id1"), col("v").as("v1"))
    l.crossJoin(r).where(col("id0") < col("id1"))
      .withColumn("cos", round(cosine(col("v0"), col("v1")), 6))
      .where(col("cos") >= threshold)
      .select("id0", "id1", "cos")
  }
}
