package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.LinkConfig
import graft.ingest.{Ingest, PagesSynth}
import graft.link.Linker

/** Temp perf probe (delete after use): chunk-aim sensitivity at local[32]. */
object Probe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 60000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = PagesSynth.pages(spark, Seq(n, n), overlap = 0.5, noise = 0.05)
    val records = Ingest.encodePages(pages)
      .select("dp", "entity_id", "clk", "popcount")
      .withColumn("block_key", org.apache.spark.sql.functions.lit("1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    records.count()
    // warmup
    Linker.scoreCandidates(records, LinkConfig(0.95), 64000000L).toDF().count()
    for (r <- 1 to 3; aim <- Seq(16000000L, 64000000L, 256000000L)) {
      val t0 = System.nanoTime()
      Linker.scoreCandidates(records, LinkConfig(0.95), aim).toDF().count()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"PROBE aim=${aim / 1000000}M r$r wall=$w%.2f s  (${n.toLong * n / w / 1e6}%.0f M pairs/s)")
    }
    spark.stop()
  }
}
