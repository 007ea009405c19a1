package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.LinkConfig
import graft.ingest.{Ingest, PagesSynth}
import graft.link.Linker

/** Temp perf probe (delete after use): one scaling sweep. */
object Probe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 60000
    for (cores <- Seq(2, 8, 32)) {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
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
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Linker.scoreCandidates(records, LinkConfig(threshold = 0.95)).toDF().count()
        (System.nanoTime() - t0) / 1e9
      }
      val best = walls.min
      println(f"PROBE local[$cores] best=$best%.3f s  pairs/s=${n.toLong * n / best / 1e6}%.1f M  walls=${walls.map(w => f"$w%.2f").mkString(",")}")
      spark.stop()
    }
  }
}
