package graft.link

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Edge, LinkConfig}
import graft.expr.dicePre

/** Candidate generation + scoring: the reference's
  * `create_comparison_jobs` / `compute_filter_similarity` stages
  * (`backend/entityservice/tasks/comparing.py:44-99,265-413`) re-expressed
  * as one declarative Spark plan:
  *
  *   blocked ⋈ blocked on block key  →  dice  →  sim >= t  →  dedup
  *
  * Blocking-as-partition-pruning: only records sharing a block key meet in
  * the hash join (the reference intersects block sets per provider pair,
  * `comparing.py:173-187` — the equi-join does this implicitly).
  *
  * Skew: the reference splits big blocks into ~square chunks of
  * `CHUNK_SIZE_AIM`=3e8 comparisons (`comparing.py:102-170`,
  * `settings.py:103`). The no-blocking default puts EVERYTHING in one
  * block, so a plain join would make one partition. We reproduce the
  * square decomposition as two-sided salting: per block compute a salt
  * fan-out k from block-size stats; each pair (u,v) meets exactly once at
  * join key (block, salt(u), salt(v)); the left input is replicated over
  * the second salt component, the right over the first. k=1 for normal
  * blocks, so replication cost is paid only where skew exists.
  */
object Linker {

  @volatile private var lastChunksCache: Option[DataFrame] = None
  @volatile private var lastStatsCache: Option[DataFrame] = None

  /** Register this run's cached frames, unpersisting the previous run's
    * (bounded to ONE cached chunk table + ONE cached stats frame per
    * session — the returned edges Dataset is lazy, so both must outlive
    * this call until the caller's first action; the NEXT call is the
    * earliest safe unpersist point). */
  private def registerRunCaches(chunks: Option[DataFrame], stats: DataFrame): Unit =
    Linker.synchronized {
      (lastChunksCache.toSeq ++ lastStatsCache.toSeq).foreach { prev =>
        // previous cache may belong to an already-stopped session
        try if (!prev.sparkSession.sparkContext.isStopped) prev.unpersist(false)
        catch { case _: Throwable => }
      }
      lastChunksCache = chunks
      lastStatsCache = Some(stats)
    }

  /** Comparisons per task when decomposing blocks (reference
    * CHUNK_SIZE_AIM=3e8, `settings.py:103`, sized for its C++ kernel).
    * 2.56e8 (~16k 128-byte records per side): before the kernel was
    * L2-tiled, big chunks thrashed the shared L3 and 6.4e7 measured 2-3x
    * faster at 32 threads; WITH tiling the cache-active set is one tile
    * regardless of chunk size, so bigger chunks win back the task-count
    * and shuffle-replication overhead (shuffle is 2k·chunkBytes per
    * block, k ~ 1/sqrt(aim)) — re-measured r2: 256M beat 64M in every
    * round at local[32]. The adaptive floor below still splits small jobs
    * across all cores. */
  val ChunkSizeAim: Long = 256000000L

  /** Input: columns (dp int, entity_id long, clk binary, popcount int,
    * block_key string). Output: deduplicated scored edges with dp0 < dp1.
    *
    * Default = the chunked kernel (`scoreCandidatesChunked`): the
    * row-at-a-time join form below is kept as the declarative semantic
    * spec (and equality-tested against the kernel), but a hash/sort-merge
    * join emitting one row per COMPARISON tops out around ~5M rows/s/core
    * — 10-20x below the bit-parallel kernel — so the physical shape of the
    * hot path is chunk-pair nested loops, exactly the reference's work
    * packages (`tasks/comparing.py:102-170`).
    */
  /** Single salt-digit cap; the composite two-level fan-out reaches
    * MaxSaltFanout^2 (graft.link.Salting). */
  val MaxSaltFanout: Int = 4096

  def scoreCandidates(blocked: DataFrame, cfg: LinkConfig,
      chunkSizeAim: Long = ChunkSizeAim): Dataset[Edge] = {
    val scored = scoreCandidatesChunked(blocked, cfg, chunkSizeAim)
    cfg.topKPerRecord.fold(scored)(k => capTopKPerRecord(scored, k))
  }

  /** Optional anonlink-`k` parity: keep the k best candidates per left
    * record (sim desc, ids as tie-break). A per-key window — hash
    * partitioned by (dp0, rec0), never a global sort. */
  def capTopKPerRecord(edges: Dataset[Edge], k: Int): Dataset[Edge] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"dp0", $"rec0")
      .orderBy(desc("sim"), $"dp1", $"rec1")
    edges.toDF()
      .withColumn("__r", row_number().over(w))
      .where($"__r" <= k).drop("__r")
      .as[Edge]
  }

  /** Declarative join formulation (semantic spec; see scoreCandidates). */
  def scoreCandidatesJoin(blocked: DataFrame, cfg: LinkConfig,
      chunkSizeAim: Long = ChunkSizeAim): Dataset[Edge] = {
    val spark = blocked.sparkSession
    import spark.implicits._

    // Per-block fan-out k ~ sqrt(comparisons / aim): block stats are tiny
    // relative to data (one row per distinct block) -> broadcast join.
    // (B3 block-metadata agg, database/insertions.py:50-67, doubles as the
    // skew detector.) The aim adapts downward when the whole job is smaller
    // than aim * parallelism, so a single huge block still fans out across
    // every core instead of one 3e8-comparison task pinning one core
    // (reference behavior: CHUNK_SIZE_AIM splits work into >= #workers
    // packages only when the job is big; we always target full
    // parallelism).
    val statsRaw = blocked.groupBy($"block_key")
      .agg(count(lit(1)).as("n"))
      .persist()
    registerRunCaches(None, statsRaw)
    // decimal agg + saturating cap: at 10^12-row blocks n^2 exceeds Long
    val totalPairsUb = statsRaw
      .agg(coalesce(sum($"n".cast("decimal(38,0)") * $"n"), lit(0)))
      .head().getDecimal(0).toBigInteger.min(
        java.math.BigInteger.valueOf(Long.MaxValue)).longValue()
    val parallelism = math.max(spark.sparkContext.defaultParallelism, 1)
    // effective tasks ~= totalPairs/(2*aim) (the dp0<dp1 filter halves the
    // k^2 chunk pairs) -> divisor 6 targets ~3 waves per core
    val aim = math.max(1000000L,
      math.min(chunkSizeAim, totalPairsUb / (6L * parallelism) + 1))
    val stats = statsRaw
      .withColumn("k",
        least(
          greatest(
            ceil($"n".cast("double") / math.sqrt(aim.toDouble)),
            lit(1L)),
          lit(1024L)).cast("int"))
      .select($"block_key", $"k")

    val salted = blocked.join(broadcast(stats), Seq("block_key"))
      .withColumn("salt", pmod(xxhash64($"dp", $"entity_id"), $"k").cast("int"))

    val left = salted.select(
      $"block_key", $"k",
      $"salt".as("salt0"),
      explode(sequence(lit(0), $"k" - 1)).as("salt1"),
      $"dp".as("dp0"), $"entity_id".as("rec0"), $"clk".as("clk0"), $"popcount".as("pc0"))
    val right = salted.select(
      $"block_key",
      explode(sequence(lit(0), $"k" - 1)).as("salt0"),
      $"salt".as("salt1"),
      $"dp".as("dp1"), $"entity_id".as("rec1"), $"clk".as("clk1"), $"popcount".as("pc1"))

    val scored = left.join(right, Seq("block_key", "salt0", "salt1"))
      .where($"dp0" < $"dp1")
      .select(
        dicePre($"clk0", $"clk1", $"pc0" + $"pc1").as("sim"),
        $"dp0", $"rec0", $"dp1", $"rec1")
      .where($"sim" >= cfg.threshold)

    // A pair can co-occur in multiple shared blocks -> collapse
    // (reference dedups during merge, comparing.py:475-483).
    scored
      .dropDuplicates("dp0", "rec0", "dp1", "rec1")
      .as[Edge]
  }

  /** The hot path. Physical design = the reference's square-chunk work
    * packages re-expressed in Spark:
    *
    *  1. per-block fan-out k from block stats (broadcast);
    *  2. records grouped into chunks keyed (block, dp, salt) with
    *     salt = hash(dp, id) % k — chunk byte size is bounded by the
    *     comparison aim, so no task sees more than ~2 chunks of data;
    *  3. left chunks replicated over the right salt range and vice versa,
    *     equi-join on (block, salt0, salt1): each chunk PAIR meets exactly
    *     once, and the sort-merge join buffers only one chunk per key;
    *  4. a tight array nested loop scores each chunk pair with the
    *     popcount kernel, emitting only >= threshold edges (nothing below
    *     threshold is ever materialized — parity with the reference
    *     kernel's in-loop threshold, `tasks/comparing.py:340-343`).
    *
    * Shuffle volume is 2·k²·chunkBytes per block — for a 10^6-record
    * block at the 3e8 aim that is ~16 GB for 10^12 comparisons, i.e. the
    * kernel, not the shuffle, is the bottleneck at cluster scale.
    */
  /** Broadcast cap for the cross-block keep-list (8-byte hashed keys +
    * overhead; 8M longs ≈ 64 MB — safe at default driver memory). */
  private val MaxCrossBlockBroadcast = 8000000L

  def scoreCandidatesChunked(blocked: DataFrame, cfg: LinkConfig,
      chunkSizeAim: Long = ChunkSizeAim, maxK: Int = MaxSaltFanout): Dataset[Edge] = {
    val spark = blocked.sparkSession
    import spark.implicits._

    // Stats ride a 64-bit hash of the block key: the string key (an LSH
    // band value, often ~50 bytes) would dominate this — the widest —
    // shuffle's bytes, and every consumer of stats is a heuristic
    // (keep-list, salt fan-out, chunk aim) where a hash collision merely
    // keeps or over-salts one extra block. Chunk packing and the
    // chunk-pair join below stay on the TRUE key, so a collision can
    // never cause a cross-block comparison. "spans >1 provider" ==
    // min(dp) != max(dp): cheap single-pass aggs, where a countDistinct
    // would trigger Catalyst's Expand-based distinct rewrite and push 2x
    // the rows through the shuffle.
    val withH = blocked.withColumn("bkh", xxhash64($"block_key"))
    val statsRaw = withH.groupBy($"bkh")
      .agg(count(lit(1)).as("n"),
        (min($"dp") =!= max($"dp")).as("cross_dp"))
      .persist()

    // A block confined to ONE provider can never emit a dp0<dp1 pair.
    // With LSH banding most band values are unique to one document, so at
    // the reference's 100Kx1M shape ~98% of the exploded rows are
    // pair-less; dropping them BEFORE the packing shuffle turns a
    // multi-GB groupByKey + chunk-pair join into megabytes (measured
    // round 4: the kernel does 124k comparisons while the shuffles moved
    // 7+ GB). The keep-list comes out of the SAME stats aggregate the
    // fan-out already needs, so the filter is one broadcast hash join —
    // no extra shuffle. When most blocks are cross-provider (or the list
    // would be too big to broadcast) the filter buys nothing; skip it.
    // ONE driver round-trip for every block-stat scalar this call needs
    // (count, cross count, and the n² sums both with and without the
    // single-provider blocks — the prefilter decision picks which sum
    // applies, so computing both in the same job replaces what used to be
    // two sequential head() actions; ~25 bench queries pay this latency
    // per kernel invocation).
    val (totalBlocks, crossBlocks, pairsUbAll, pairsUbCross) = {
      val r = statsRaw.agg(count(lit(1)),
        coalesce(sum(when($"cross_dp", 1L)), lit(0L)),
        coalesce(sum($"n".cast("decimal(38,0)") * $"n"), lit(0)),
        coalesce(sum(when($"cross_dp", $"n".cast("decimal(38,0)") * $"n")),
          lit(0))).head()
      def sat(d: java.math.BigDecimal): Long = d.toBigInteger.min(
        java.math.BigInteger.valueOf(Long.MaxValue)).longValue()
      (r.getLong(0), r.getLong(1), sat(r.getDecimal(2)), sat(r.getDecimal(3)))
    }
    val prefilter = crossBlocks <= MaxCrossBlockBroadcast &&
      crossBlocks * 2 <= totalBlocks
    val statsBase =
      if (prefilter) statsRaw.where($"cross_dp") else statsRaw
    val kept =
      if (prefilter)
        withH.join(broadcast(statsBase.select($"bkh")), Seq("bkh"))
      else withH

    // decimal agg + saturating cap: at 10^12-row blocks n^2 exceeds Long.
    // Sized over the KEPT blocks so dropped single-provider volume can't
    // inflate the aim (which would under-split what remains).
    val totalPairsUb = if (prefilter) pairsUbCross else pairsUbAll

    val parallelism = math.max(spark.sparkContext.defaultParallelism, 1)
    // effective tasks ~= totalPairs/(2*aim) (the dp0<dp1 filter halves the
    // k^2 chunk pairs) -> divisor 6 targets ~3 waves per core
    val aim = math.max(1000000L,
      math.min(chunkSizeAim, totalPairsUb / (6L * parallelism) + 1))
    // composite two-level fan-out k1*k2 >= n/sqrt(aim) (Salting): one salt
    // digit caps at maxK, so a block needing more splits on a second digit
    // instead of silently under-splitting into ~(needK/maxK)^2-times-aim
    // tasks. Only skewed blocks (k > 1) ride the broadcast; k=1 defaults
    // via the left join (block-key cardinality can be O(rows) at scale).
    val (k1c, k2c) = Salting.fanout($"n", aim, maxK)
    val stats = statsBase
      .select($"bkh", k1c.as("k1"), k2c.as("k2"))
      .where($"k1" > 1 || $"k2" > 1)

    // Chunks are packed ONCE at aggregation time into primitive arrays
    // (ids, popcounts, one contiguous zero-padded clk buffer, sorted by
    // popcount). Boxed per-record structs (collect_list of tuples) were
    // measured to generate enough garbage to send later rounds into GC
    // collapse; primitive arrays deserialize with zero boxing and the
    // popcount sort is paid once per chunk instead of once per chunk pair.
    val chunks = kept.join(broadcast(stats), Seq("bkh"), "left")
      .withColumn("k1", coalesce($"k1", lit(1)))
      .withColumn("k2", coalesce($"k2", lit(1)))
      .withColumn("salt",
        pmod(xxhash64($"dp", $"entity_id"), ($"k1" * $"k2").cast("long")).cast("int"))
      .select($"block_key", $"k1", $"k2", $"dp", $"salt", $"entity_id", $"clk", $"popcount")
      .as[(String, Int, Int, Int, Int, Long, Array[Byte], Int)]
      .groupByKey(r => (r._1, r._2, r._3, r._4, r._5))
      .mapGroups { (key: (String, Int, Int, Int, Int), it: Iterator[(String, Int, Int, Int, Int, Long, Array[Byte], Int)]) =>
        val (bk, k1, k2, dp, salt) = key
        val recs = it.toArray.sortBy(_._8)
        val n = recs.length
        var maxLen = 0
        recs.foreach(r => if (r._7.length > maxLen) maxLen = r._7.length)
        val stride = math.max(((maxLen + 7) / 8) * 8, 8)
        val ids = new Array[Long](n)
        val pcs = new Array[Int](n)
        val pch = new Array[Int](n) // popcount of the first stride/2 bytes
        val flat = new Array[Byte](n * stride)
        val half = stride / 2
        var i = 0
        while (i < n) {
          val r = recs(i); ids(i) = r._6; pcs(i) = r._8
          System.arraycopy(r._7, 0, flat, i * stride, r._7.length)
          pch(i) = graft.core.BitOps.popcount(
            java.util.Arrays.copyOfRange(flat, i * stride, i * stride + half))
          i += 1
        }
        (bk, k1, k2, dp, salt, stride, ids, pcs, pch, flat)
      }
      .toDF("block_key", "k1", "k2", "dp", "salt", "stride", "ids", "pcs", "pch", "flat")
      // both join branches derive from this subtree and AQE compiles them
      // as separate query stages (no exchange reuse) — without caching,
      // the whole scan+encode+pack pipeline runs twice. Bounded to one
      // cached chunk table per session (previous call unpersisted).
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    registerRunCaches(Some(chunks), statsRaw)

    // other-side salt range = two chained explodes (bounded by maxK each),
    // composite digit recombined as ta + k1*tb — equivalent to one
    // sequence(0, k1*k2-1) without ever materializing a k1*k2-long array
    val left = chunks.select($"block_key",
      $"salt".as("salt0"), explode(sequence(lit(0), $"k1" - 1)).as("ta"),
      $"k1", $"k2",
      $"dp".as("dp0"), $"stride".as("stride0"),
      $"ids".as("ids0"), $"pcs".as("pcs0"), $"pch".as("pch0"), $"flat".as("flat0"))
      .withColumn("tb", explode(sequence(lit(0), $"k2" - 1)))
      .withColumn("salt1", $"ta" + $"k1" * $"tb")
      .drop("ta", "tb", "k1", "k2")
    val right = chunks.select($"block_key",
      $"salt".as("salt1"), explode(sequence(lit(0), $"k1" - 1)).as("ta"),
      $"k1", $"k2",
      $"dp".as("dp1"), $"stride".as("stride1"),
      $"ids".as("ids1"), $"pcs".as("pcs1"), $"pch".as("pch1"), $"flat".as("flat1"))
      .withColumn("tb", explode(sequence(lit(0), $"k2" - 1)))
      .withColumn("salt0", $"ta" + $"k1" * $"tb")
      .drop("ta", "tb", "k1", "k2")

    val threshold = cfg.threshold
    val pairsDs = left.join(right, Seq("block_key", "salt0", "salt1"))
      .where($"dp0" < $"dp1")
      .select($"dp0", $"stride0", $"ids0", $"pcs0", $"pch0", $"flat0",
        $"dp1", $"stride1", $"ids1", $"pcs1", $"pch1", $"flat1")
      .as[(Int, Int, Array[Long], Array[Int], Array[Int], Array[Byte],
           Int, Int, Array[Long], Array[Int], Array[Int], Array[Byte])]

    val scored = pairsDs.flatMap {
      case (dp0, stride0, id0, pc0, pch0, flat0, dp1, stride1, id1, pc1, pch1, flat1) =>
      val n0 = id0.length
      val n1 = id1.length
      // AND over the common prefix (same semantics as BitOps.andPopcount's
      // min-length rule; strides are equal when encodings are uniform,
      // which ingest validates)
      val len = math.min(stride0, stride1)
      // the half-popcount upper bound is only sound when both sides were
      // packed with the same stride (uniform encodings — the normal case)
      val halves = stride0 == stride1
      val ratio = threshold / (2.0 - threshold) // in (0,1] for t in (0,1]
      // Tiled scan: the y side is processed in ~256 KB tiles so the tile
      // stays L2-resident while every x row passes over it (without
      // tiling, each x-pass streams the whole chunk from L3/DRAM and the
      // kernel stops scaling past ~8 cores — measured). Within a tile the
      // popcount window [px*ratio, px/ratio] bounds y via monotone
      // pointers over the popcount-sorted order. Lazy: buffers at most
      // one (x, tile) row of survivors.
      new Iterator[Edge] {
        private val tileRows = math.max(512, (256 * 1024) / math.max(stride1, 1))
        private var ts = 0
        private var te = math.min(tileRows, n1)
        private var x = 0
        private var lo = 0 // first in-tile y with pc1(y) >= px*ratio
        private val buf = new scala.collection.mutable.ArrayBuffer[Edge](32)
        private var bi = 0
        fill()
        private def fill(): Unit = {
          buf.clear(); bi = 0
          while (buf.isEmpty && ts < n1 && n0 > 0) {
            if (x >= n0) { // next tile
              ts = te; te = math.min(ts + tileRows, n1); x = 0; lo = ts
            } else {
              val px = pc0(x)
              val minPc = px * ratio
              val maxPc = px / ratio
              while (lo < te && pc1(lo) < minPc) lo += 1
              var y = lo
              val xOff = x * stride0
              val phx = if (halves) pch0(x) else 0
              val ptx = if (halves) px - phx else 0
              while (y < te && pc1(y) <= maxPc) {
                val py = pc1(y)
                // second-level prune: inter <= min(heads) + min(tails)
                val skip = halves && {
                  val phy = pch1(y)
                  val upper = math.min(phx, phy) + math.min(ptx, py - phy)
                  2.0 * upper < threshold * (px + py)
                }
                if (!skip) {
                  val s = graft.core.BitOps.dicePreOff(
                    flat0, xOff, flat1, y * stride1, len, px + py)
                  if (s >= threshold) buf += Edge(s, dp0, id0(x), dp1, id1(y))
                }
                y += 1
              }
              x += 1
            }
          }
        }
        override def hasNext: Boolean = bi < buf.length
        override def next(): Edge = {
          val e = buf(bi); bi += 1
          if (bi >= buf.length) fill()
          e
        }
      }
    }

    scored.dropDuplicates("dp0", "rec0", "dp1", "rec1").as[Edge]
  }

  /** A5: total comparison estimate = sum over (block, dp-pair) of the
    * product of per-dp block sizes (`database/selections.py:231-261`). */
  def totalComparisons(blocked: DataFrame): Long = {
    val spark = blocked.sparkSession
    import spark.implicits._
    val per = blocked.groupBy($"block_key", $"dp").agg(count(lit(1)).as("n"))
    val l = per.select($"block_key", $"dp".as("dp0"), $"n".as("n0"))
    val r = per.select($"block_key", $"dp".as("dp1"), $"n".as("n1"))
    l.join(r, "block_key").where($"dp0" < $"dp1")
      .agg(coalesce(sum($"n0" * $"n1"), lit(0L)))
      .head().getLong(0)
  }

  /** A4 guardrail: fail the run when scored candidates exceed the cap
    * (`settings.py:112`, enforced `comparing.py:363-372`). Returns count. */
  def enforceScoredPairsCap(edges: Dataset[Edge], cfg: LinkConfig): Long = {
    val n = edges.count()
    require(n <= cfg.maxScoredPairs,
      s"run aborted: $n candidate pairs exceeds cap ${cfg.maxScoredPairs}")
    n
  }
}
