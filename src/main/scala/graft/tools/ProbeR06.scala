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

    // ---- q_uncertainty_sample stage isolation ----
    if (args.contains("unc")) {
      import org.apache.spark.sql.expressions.Window
      val pairs0u = graft.dedup.Dedup.saltedSelfPairs(base).select(
        col("id0"), col("id1"),
        (graft.expr.levenshteinBand(col("p_name0"), col("p_name1"), 4) >= 0)
          .cast("int").as("g_name"),
        (col("p_type0") === col("p_type1")).cast("int").as("g_type"),
        (abs(col("p_size0") - col("p_size1")) <= 2).cast("int").as("g_size"))
      time("unc: pairs w/ ids -> noop")(noop(pairs0u))
      time("unc: pairs groupBy collect") {
        pairs0u.groupBy("g_name", "g_type", "g_size")
          .agg(count(lit(1))).collect()
      }
      val byP = Window.partitionBy("g_name", "g_type", "g_size")
      val sel = pairs0u
        .withColumn("__n_g", count(lit(1)).over(byP))
        .withColumn("__rn", row_number().over(
          byP.orderBy(col("id0").asc, col("id1").asc)))
        .where(col("__rn") <= 40)
      time("unc: window top-40 count")(sel.count())
      time("unc: full uncertaintySample") {
        graft.link.FellegiSunter.uncertaintySample(pairs0u,
          Seq("g_name", "g_type", "g_size"), Seq("id0", "id1"), k = 40).count()
      }
      // phase split of the persist variant
      val cached = pairs0u.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("unc: cache materialize (count)")(cached.count())
      val fit = graft.link.FellegiSunter.emClassify(
          cached.selectExpr("g_name", "g_type", "g_size"),
          Seq("g_name", "g_type", "g_size"), iters = 2)
        .select(col("g_name"), col("g_type"), col("g_size"), col("posterior"))
      time("unc: emClassify from cache") {
        graft.link.FellegiSunter.emClassify(
          cached.selectExpr("g_name", "g_type", "g_size"),
          Seq("g_name", "g_type", "g_size"), iters = 2).count()
      }
      time("unc: join+TakeOrdered from cache") {
        cached.join(broadcast(fit), Seq("g_name", "g_type", "g_size"))
          .withColumn("uncertainty",
            abs(col("posterior") - lit(500000000L)))
          .orderBy(col("uncertainty").asc, col("id0").asc, col("id1").asc)
          .limit(40).count()
      }
      cached.unpersist()
    }

    // ---- q_prefix_join stage isolation ----
    if (args.contains("prefix")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val D = 10000L
      val tnum = math.ceil(0.7 * D).toLong
      val elems = array_distinct(split(col("text"), " "))
      val toks = docs.select(col("doc_id").cast("long").as("id"),
        explode(elems).as("tok"))
      val sig = docs.select(col("doc_id").cast("long").as("id"),
          graft.dedup.Dedup.hashedSet(elems).as("toks"))
        .withColumn("sz", size(col("toks")).cast("long"))
        .persist()
      sig.count()
      val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("df"), col("tok"))
      val prefix = toks.join(dfreq, "tok")
        .withColumn("rn", row_number().over(w))
        .join(sig.select(col("id"), col("sz")), "id")
        .where(col("rn") <=
          col("sz") - expr(s"(sz * $tnum + ${D - 1}) DIV $D") + 1)
        .select(col("tok").as("bk"), col("id"), col("sz"), col("rn"))
      time("prefix rows count")(prefix.count())
      val alpha = expr(s"($tnum * (sz0 + sz1) + ${D + tnum - 1}) DIV ${D + tnum}")
      val joined = graft.dedup.Dedup.saltedSelfPairs(prefix)
      time("salted join raw count")(joined.count())
      val filt = joined
        .where(least(col("sz0"), col("sz1")) * D >=
          greatest(col("sz0"), col("sz1")) * tnum)
        .where(lit(1L) + least(col("sz0") - col("rn0"),
          col("sz1") - col("rn1")) >= alpha)
      time("after len+pos filters count")(filt.count())
      val cand = filt.select("id0", "id1", "sz0", "sz1").distinct()
      time("distinct cand count")(cand.count())
      val withSets = cand
        .join(sig.select(col("id").as("id0"), col("toks").as("toks0")), "id0")
        .join(sig.select(col("id").as("id1"), col("toks").as("toks1")), "id1")
        .withColumn("inter",
          graft.expr.sortedIntersectCount(col("toks0"), col("toks1"))
            .cast("long"))
      time("verify (sets join + merge scan)") {
        noop(withSets.where(
          col("inter") * D >= (col("sz0") + col("sz1") - col("inter")) * tnum))
      }
      time("full prefixFilterPairs") {
        graft.dedup.Dedup.prefixFilterPairs(docs, "doc_id", "text", 0.7).count()
      }
    }
    spark.stop()
  }
}
