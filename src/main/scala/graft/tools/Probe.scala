package graft.tools

import org.apache.spark.sql.SparkSession

/** Temp perf probe (delete after use): time named SparkEntry queries. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (round <- 1 to 2; q <- args.drop(1)) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sf).count()
      println(f"PROBE $q r$round rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
