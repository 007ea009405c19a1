package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 stage-isolation probe (guide §1.4): times the FS-family pair
  * job's stages separately with the noop sink so the expensive stage is
  * identified by measurement, not guesswork. Not part of the bench
  * contract — iteration tooling only.
  */
object ProbeR06 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-r06")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")

    def time(label: String)(f: => Unit): Unit = {
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      raw.println(f"$label%-40s min=${samples.min}%8.3f samples=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val base = spark.read.parquet(s"$sfDir/part.parquet").select(
      col("p_partkey").cast("long").as("id"), col("p_brand").as("bk"),
      col("p_name"), col("p_type"), col("p_size"))

    // warmup
    noop(base)

    time("base scan -> noop")(noop(base))
    val pairs0 = graft.dedup.Dedup.saltedSelfPairs(base)
    time("saltedSelfPairs -> noop (no gammas)")(noop(pairs0))
    time("pairs count() (keys only)")(pairs0.count())
    val gammas = pairs0.select(
      (levenshtein(col("p_name0"), col("p_name1"), 4) >= 0)
        .cast("int").as("g_name"),
      (col("p_type0") === col("p_type1")).cast("int").as("g_type"),
      (abs(col("p_size0") - col("p_size1")) <= 2).cast("int").as("g_size"))
    time("pairs + gammas -> noop")(noop(gammas))
    time("gammas groupBy collect") {
      gammas.groupBy("g_name", "g_type", "g_size")
        .agg(count(lit(1)).as("n_pairs")).collect()
    }
    time("full emClassify") {
      graft.link.FellegiSunter
        .emClassify(gammas, Seq("g_name", "g_type", "g_size"), iters = 2)
        .count()
    }
    // gamma variants: which comparator carries the cost?
    time("gammas: eq+size only -> noop") {
      noop(pairs0.select(
        (col("p_type0") === col("p_type1")).cast("int").as("g_type"),
        (abs(col("p_size0") - col("p_size1")) <= 2).cast("int").as("g_size")))
    }
    time("gammas: levenshtein only -> noop") {
      noop(pairs0.select(
        (levenshtein(col("p_name0"), col("p_name1"), 4) >= 0)
          .cast("int").as("g_name")))
    }
    spark.stop()
  }
}
