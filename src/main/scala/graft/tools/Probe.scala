package graft.tools

import org.apache.spark.sql.SparkSession

/** Temp timing probe — delete before round end. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_jaccard_char3", "q_jaccard_pairs", "q_minhash_pairs", "q_dice_token_pairs")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    spark.read.parquet(s"$dir/documents.parquet").groupBy("lang").count().count()
    locally {
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def oldPlan() = graft.dedup.Dedup.jaccardPairsBy(docs, "doc_id",
        graft.dedup.Dedup.charNgrams(col("text"), 3),
        element_at(split(col("text"), " "), 1), 0.5)
      def newPlan() = graft.dedup.Dedup.jaccardPairsHashed(docs, "doc_id",
        graft.expr.hashedCharNgrams(col("text"), 3),
        element_at(split(col("text"), " "), 1), 0.5)
      def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val c = f().count()
        println(f"PROBE $tag rows=$c sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
      (1 to 3).foreach { i => time(s"char3_old_$i", oldPlan); time(s"char3_new_$i", newPlan) }
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"PROBE $n rows=$c sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
