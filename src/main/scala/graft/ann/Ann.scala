package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup.cosine
import scala.util.Random

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - `bruteForceTopK`: the exact baseline — broadcast the (small) query
  *   set against the corpus, cosine in codegen'd array expressions,
  *   window top-k. Scales linearly in corpus size, constant in queries.
  * - `lshTopK`: the scale path — random-hyperplane (sign) signatures,
  *   multi-probe via B independent bucket tables; candidates are scored
  *   exactly within buckets only. Recall measured vs brute force in
  *   AnnSpec.
  */
object Ann {

  /** Exact top-k neighbors by cosine for each query vector.
    * Output: (query_id, neighbor_id, rank, cos). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, id: String,
      vec: String, k: Int): DataFrame = {
    val c = corpus.select(col(id).as("neighbor_id"), col(vec).cast("array<double>").as("cv"))
    val q = queries.select(col(id).as("query_id"), col(vec).cast("array<double>").as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Deterministic random hyperplanes: tables x bitsPerTable x dim. */
  private[ann] def hyperplanes(tables: Int, bits: Int, dim: Int,
      seed: Long): Array[Array[Array[Double]]] =
    Array.tabulate(tables, bits) { (t, b) =>
      val r = new Random(seed * 1000003L + t * 8191L + b)
      Array.fill(dim)(r.nextGaussian())
    }

  /** Sign-LSH bucket keys for a vector: one key per table. */
  private[ann] def signKeys(v: Array[Double],
      planes: Array[Array[Array[Double]]]): Array[String] =
    planes.zipWithIndex.map { case (table, t) =>
      val sb = new StringBuilder(s"t$t:")
      table.foreach { plane =>
        var d = 0.0
        var i = 0
        val n = math.min(plane.length, v.length)
        while (i < n) { d += plane(i) * v(i); i += 1 }
        sb.append(if (d >= 0) '1' else '0')
      }
      sb.toString
    }

  /** Per-vector sign-LSH state: (vid, v double[], nrm, bks = one bucket
    * key per table). The dump the DuckDB oracle replays bucketed-pairing
    * semantics from; also the candidate source for
    * Dedup.embeddingCosinePairsApprox. */
  def signatures(df: DataFrame, id: String, vec: String,
      tables: Int = 16, bits: Int = 6, dim: Int = 64,
      seed: Long = 0xa11L): DataFrame = {
    val planes = hyperplanes(tables, bits, dim, seed)
    val keysUdf = udf((v: Seq[Double]) =>
      if (v == null) Array.empty[String] else signKeys(v.toArray, planes))
    df.select(col(id).as("vid"), col(vec).cast("array<double>").as("v"))
      .withColumn("nrm", graft.expr.vectorNorm(col("v")))
      .withColumn("bks", keysUdf(col("v")))
  }

  /** LSH-bucketed approximate top-k: only pairs sharing at least one of
    * `tables` sign-signature buckets are scored. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      k: Int, tables: Int = 16, bits: Int = 6, dim: Int = 64,
      seed: Long = 0xa11L): DataFrame = {
    def bucketed(df: DataFrame, idAs: String, vecAs: String) =
      signatures(df, id, vec, tables, bits, dim, seed)
        .select(col("vid").as(idAs), col("v").as(vecAs), col("bks"))
        .withColumn("bkey", explode(col("bks"))).drop("bks")
    val c = bucketed(corpus, "neighbor_id", "cv")
    val q = bucketed(queries, "query_id", "qv")
    val cands = c.join(q, "bkey")
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "qv", "cv")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
