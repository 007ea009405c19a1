package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches with BIT-EXACT replay.
  *
  * The reference service publishes run-level statistics (comparison
  * counts, rates — `backend/entityservice/tasks/stats.py:10-36`) computed
  * exactly because its scale allows it; at 100 TB the per-group
  * distinct/frequency statistics a curation pipeline wants (vocabulary
  * size per source, token frequencies for stop-lists) need sketches. The
  * house rule for driver-visible correctness is bit-exact cross-engine
  * replay, which rules out `approx_count_distinct` (HLL++ internals are
  * engine-private); these variants are built from an md5-derived 60-bit
  * hash both engines compute identically, so every register / minimum /
  * cell — and the floored-integer estimate — replays in plain SQL.
  *
  * All three are one-pass, mergeable (min-of-k / max-per-register /
  * cell-sum all commute with union), and bounded: sketch state per group
  * is k values (KMV), 2^p registers (HLL), or d·w cells (CMS) regardless
  * of input size. The exact counts ride along as the estimator audit
  * (same division of labor as [[graft.dedup.Dedup]]'s minhashAccuracy).
  */
object Sketches {

  /** Deterministic 60-bit hash from the md5 hex prefix — 15 hex chars
    * parse to [0, 2^60), positive in a signed long, and DuckDB's
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)` yields the same
    * value for the same UTF-8 bytes. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  private val Pow60 = 1L << 60

  /** KMV (k-minimum-values / bottom-k) distinct sketch per group.
    *
    * Estimate: with the k-th smallest of the distinct 60-bit hash values
    * at `kthMin`, est = (k−1) · 2^60 DIV kthMin (Bar-Yossef et al. 2002,
    * floored to an integer so both engines agree bit-for-bit). Groups
    * with fewer than k distinct values are counted exactly (the sketch
    * holds every value it ever saw).
    *
    * Scale shape: distinct-(group, hash) hash-agg, then TWO bounded
    * windows — a salted partial bottom-k (64 salt lanes, so one giant
    * group sorts in 64 tasks) feeding a final bottom-k over ≤ 64·k
    * survivors per group. Sketch state is k longs per group; merge of
    * two sketches is union → bottom-k, which is exactly what the salted
    * phase computes. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 32): DataFrame = {
    require(k >= 2 && k <= 4096, "k in [2, 4096]")
    val hashed = df
      .select(col(groupCol).as("grp"), hash60(col(valueCol)).as("h"))
      .distinct()
    val partial = hashed
      .withColumn("salt", pmod(col("h"), lit(64L)))
      .withColumn("r",
        row_number().over(Window.partitionBy("grp", "salt").orderBy("h")))
      .where(col("r") <= k).drop("r", "salt")
    val ranked = partial
      .withColumn("r",
        row_number().over(Window.partitionBy("grp").orderBy("h")))
      .where(col("r") <= k)
    val kth = ranked.groupBy("grp").agg(
      max("r").as("k_used"),
      max(when(col("r") === k, col("h"))).as("kth_min"))
    val exact = hashed.groupBy("grp")
      .agg(count(lit(1)).as("exact_distinct"))
    kth.join(exact, "grp")
      .select(col("grp").as(groupCol), lit(k).as("k"), col("k_used"),
        col("kth_min"),
        when(col("k_used") < k, col("exact_distinct"))
          .otherwise(expr(
            s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * ${Pow60}L" +
              " DIV kth_min AS BIGINT)"))
          .as("est_distinct"),
        col("exact_distinct"))
  }

  /** HyperLogLog registers + raw estimate per group, integer-exact.
    *
    * The 60-bit hash splits into a p-bit bucket and a w = 60−p bit
    * remainder; rho = position of the remainder's leftmost 1 (w+1 when
    * zero), registers are max-rho per bucket (absent bucket = 0). The
    * FP-free trick: Σ 2^−reg is carried scaled by 2^(w+1) —
    * s_scaled = Σ 2^(w+1−reg) is an exact BIGINT (m·2^(w+1) < 2^62 for
    * p ≤ 6) — and the raw Flajolet estimate α·m²/Σ2^−reg becomes one
    * floored DECIMAL(38,0) divide with α ≈ 709/1000 (α₆₄ = 0.7213 /
    * (1 + 1.079/64) ≈ 0.70927). No small/large-range bias correction:
    * linear counting needs ln(), which never replays bit-exact — the
    * zero-register count `v_zero` is emitted so a consumer can apply its
    * own correction downstream.
    *
    * Scale shape: one hash-agg to ≤ m rows per group, a broadcast-sized
    * bucket grid for absent registers, one more agg. Register state is
    * 2^p bytes per group and merges by per-register max. */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
      p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 6, "p in [4, 6] (keeps s_scaled in BIGINT)")
    val w = 60 - p
    val m = 1 << p
    val hashed = df.select(col(groupCol).as("grp"),
      hash60(col(valueCol)).as("h"))
    val bucketed = hashed.select(col("grp"),
      expr(s"h DIV ${1L << w}L").as("bucket"),
      (col("h") % lit(1L << w)).as("rem"))
    val withRho = bucketed.select(col("grp"), col("bucket"),
      when(col("rem") === 0L, lit(w + 1))
        .otherwise(instr(lpad(bin(col("rem")), w, "0"), "1")).as("rho"))
    val regs = withRho.groupBy("grp", "bucket").agg(max("rho").as("reg"))
    val grid = df.select(col(groupCol).as("grp")).distinct()
      .select(col("grp"),
        explode(sequence(lit(0L), lit(m - 1L))).as("bucket"))
    val full = grid.join(regs, Seq("grp", "bucket"), "left")
      .na.fill(0, Seq("reg"))
    val summary = full.groupBy("grp").agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - reg)"))
        .cast("long").as("s_scaled"),
      sum(when(col("reg") === 0, 1L).otherwise(0L)).as("v_zero"))
    val alphaNum = BigInt(709) * m * m * (BigInt(1) << (w + 1))
    val exact = hashed.distinct().groupBy("grp")
      .agg(count(lit(1)).as("exact_distinct"))
    summary.join(exact, "grp")
      .select(col("grp").as(groupCol), lit(m).as("m"), col("v_zero"),
        col("s_scaled"),
        expr(s"CAST(CAST('$alphaNum' AS DECIMAL(38,0))" +
          " DIV (1000 * CAST(s_scaled AS DECIMAL(38,0))) AS BIGINT)")
          .as("est_raw"),
        col("exact_distinct"))
  }

  /** Count-min sketch point estimates for a bounded candidate set.
    *
    * The sketch is d rows × w buckets of occurrence sums; every value
    * occurrence adds 1 to one cell per row (bucket = 60-bit hash of
    * "seed#value" mod w), and a point query reads the MINIMUM of its d
    * cells — an overestimate by construction (Cormode–Muthukrishnan
    * 2005), never an under. `est >= exact` therefore holds for every
    * row, and the output says so per candidate.
    *
    * Scale shape: the sketch is ONE hash-agg to exactly d·w cells
    * (bounded, broadcastable, mergeable by cell sum); candidates join
    * against those cells broadcast. Candidate selection is the caller's
    * (a true CMS answers any key — the exact column is the audit). */
  def cmsEstimate(df: DataFrame, valueCol: String, candidates: DataFrame,
      candCol: String, d: Int = 4, w: Int = 64): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 2 && w <= 65536, "d in [1,8], w in [2,65536]")
    val vals = df.select(col(valueCol).cast("string").as("v"))
    def cells(src: DataFrame) = src
      .select(col("v"), explode(sequence(lit(0), lit(d - 1))).as("seed"))
      .select(col("v"), col("seed"),
        pmod(hash60(concat_ws("#", col("seed"), col("v"))), lit(w.toLong))
          .as("bucket"))
    val sketch = cells(vals).groupBy("seed", "bucket")
      .agg(count(lit(1)).as("cell"))
    val exact = vals.groupBy("v").agg(count(lit(1)).as("exact"))
    val cand = candidates.select(col(candCol).cast("string").as("v")).distinct()
    cells(cand)
      .join(broadcast(sketch), Seq("seed", "bucket"), "left")
      .na.fill(0, Seq("cell"))
      .groupBy("v").agg(min("cell").as("est"))
      .join(exact, Seq("v"), "left").na.fill(0, Seq("exact"))
      .select(col("v").as(candCol), col("est"), col("exact"),
        (col("est") >= col("exact")).as("never_under"))
  }

  /** KMV set-operation estimates for every group pair — the multiset
    * side of [[kmvDistinct]] (Beyer et al. SIGMOD'07, "On Synopses for
    * Distinct-Value Estimation Under Multiset Operations"): because a
    * bottom-k sketch of A ∪ B is recoverable from the two sketches alone
    * (union → bottom-k), per-group sketches answer |A∪B|, Jaccard, and
    * |A∩B| for EVERY pair without revisiting the data.
    *
    * With L = bottom-k of sk(A) ∪ sk(B) and kth its k-th smallest:
    *   est_union        = (k−1)·2^60 DIV kth   (exact when |L| < k)
    *   inter_bottomk    = |{h ∈ L : h ∈ sk(A) ∧ h ∈ sk(B)}|
    *   jaccard_scaled   = inter_bottomk·scale DIV k
    *   est_intersection = inter_bottomk·est_union DIV k
    * — every quantity an integer or a floored integer divide, so the
    * whole readout replays bit-for-bit in plain SQL. The exact union /
    * intersection ride along as the estimator audit.
    *
    * Scale shape: the per-group sketch is the same salted bottom-k as
    * [[kmvDistinct]]; after that, everything is pairs-of-groups × ≤ 2k
    * sketch rows (group counts are small by assumption — sources,
    * languages, shards). The exact audit joins distinct-hash sets per
    * pair and is the only input-scale stage; drop it when groups are
    * genuinely huge. */
  def kmvSetOps(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64, scale: Long = 1000000L): DataFrame = {
    require(k >= 2 && k <= 4096, "k in [2, 4096]")
    val hashed = df
      .select(col(groupCol).cast("string").as("grp"),
        hash60(col(valueCol)).as("h"))
      .distinct()
    val partial = hashed
      .withColumn("salt", pmod(col("h"), lit(64L)))
      .withColumn("r",
        row_number().over(Window.partitionBy("grp", "salt").orderBy("h")))
      .where(col("r") <= k).drop("r", "salt")
    val sk = partial
      .withColumn("r",
        row_number().over(Window.partitionBy("grp").orderBy("h")))
      .where(col("r") <= k).drop("r")
    val pairs = sk.select("grp").distinct().as("g0")
      .join(sk.select("grp").distinct().as("g1"),
        col("g0.grp") < col("g1.grp"))
      .select(col("g0.grp").as("grp0"), col("g1.grp").as("grp1"))
    val members = pairs
      .join(sk.withColumnRenamed("grp", "grp0"), Seq("grp0"))
      .select(col("grp0"), col("grp1"), col("h"), lit(1).as("in0"),
        lit(0).as("in1"))
      .unionByName(pairs
        .join(sk.withColumnRenamed("grp", "grp1"), Seq("grp1"))
        .select(col("grp0"), col("grp1"), col("h"), lit(0).as("in0"),
          lit(1).as("in1")))
      .groupBy("grp0", "grp1", "h")
      .agg(max("in0").as("in0"), max("in1").as("in1"))
    val ranked = members
      .withColumn("r", row_number()
        .over(Window.partitionBy("grp0", "grp1").orderBy("h")))
      .where(col("r") <= k)
    val perPair = ranked.groupBy("grp0", "grp1").agg(
      max("r").as("k_used"),
      max(when(col("r") === k, col("h"))).as("kth_union"),
      sum(when(col("in0") === 1 && col("in1") === 1, 1L).otherwise(0L))
        .cast("long").as("inter_bottomk"))
      .withColumn("est_union",
        when(col("k_used") < k, col("k_used"))
          .otherwise(expr(
            s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * ${Pow60}L" +
              " DIV kth_union AS BIGINT)")))
      .withColumn("jaccard_scaled", expr(
        s"CAST(CAST(inter_bottomk AS DECIMAL(38,0)) * ${scale}L" +
          s" DIV ${k}L AS BIGINT)"))
      .withColumn("est_intersection", expr(
        s"CAST(CAST(inter_bottomk AS DECIMAL(38,0)) * est_union" +
          s" DIV ${k}L AS BIGINT)"))
    val exactStats = pairs
      .join(hashed.withColumnRenamed("grp", "grp0").select(
        col("grp0"), col("h")), Seq("grp0"))
      .select(col("grp0"), col("grp1"), col("h"), lit(1).as("in0"),
        lit(0).as("in1"))
      .unionByName(pairs
        .join(hashed.withColumnRenamed("grp", "grp1").select(
          col("grp1"), col("h")), Seq("grp1"))
        .select(col("grp0"), col("grp1"), col("h"), lit(0).as("in0"),
          lit(1).as("in1")))
      .groupBy("grp0", "grp1", "h")
      .agg(max("in0").as("in0"), max("in1").as("in1"))
      .groupBy("grp0", "grp1")
      .agg(count(lit(1)).as("exact_union"),
        sum(when(col("in0") === 1 && col("in1") === 1, 1L).otherwise(0L))
          .cast("long").as("exact_intersection"))
    perPair.join(exactStats, Seq("grp0", "grp1"))
      .select(col("grp0"), col("grp1"), lit(k).as("k"), col("k_used"),
        col("kth_union"), col("est_union"), col("inter_bottomk"),
        col("jaccard_scaled"), col("est_intersection"),
        col("exact_union"), col("exact_intersection"))
  }
}
