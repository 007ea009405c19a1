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

  /** Comparisons per shuffle partition to aim for when salting a huge
    * block (reference CHUNK_SIZE_AIM, `settings.py:103`). */
  val ChunkSizeAim: Long = 300000000L

  /** Input: columns (dp int, entity_id long, clk binary, popcount int,
    * block_key string). Output: deduplicated scored edges with dp0 < dp1.
    */
  def scoreCandidates(blocked: DataFrame, cfg: LinkConfig,
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
    val totalPairsUb = statsRaw
      .agg(coalesce(sum($"n".cast("decimal(28,0)") * $"n"), lit(0)))
      .head().getDecimal(0).longValueExact()
    val parallelism = math.max(spark.sparkContext.defaultParallelism, 1)
    val aim = math.max(1000000L,
      math.min(chunkSizeAim, totalPairsUb / (2L * parallelism) + 1))
    val stats = statsRaw
      .withColumn("k",
        least(
          greatest(
            ceil(sqrt(($"n" * $"n").cast("double") / aim.toDouble)),
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
