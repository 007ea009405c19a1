package graft.cluster

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.ClusterMember

/** 2-party permutation + mask construction — reference semantics at
  * `backend/entityservice/tasks/permutation.py:57-170`:
  *
  *  - matched pairs are packed into the SAME random slot of both
  *    permutations, slots drawn from a shuffle of [0, min(n0,n1));
  *  - mask[slot] = 1 iff slot holds a matched pair;
  *  - unmatched rows of each side fill the remaining slots (the unused
  *    slots below min(n0,n1) plus that side's overflow range) in random
  *    order.
  *
  * The reference uses unseeded `random.shuffle` (nondeterministic by
  * design; its tests only check consistency invariants). Here the shuffle
  * is a deterministic seeded hash order (`xxhash64(seed, idx)`), so runs
  * are reproducible.
  *
  * Scale note: permutations are a 2-party, client-facing result — a dense
  * array of min(n0,n1) slots. The reference materializes both dicts in one
  * worker (`permutation.py:85-145`); here the only global ordering is a
  * window sort over the slot/row ranges, which is fine at result-export
  * sizes (the solver-stage cap is 1e8 pairs, settings.py:111).
  */
object Permutation {

  /** @return (permutation df: (dp, row_index, slot), mask df: (slot, bit)) */
  def permuteAndMask(clusters: Dataset[ClusterMember], n0: Long, n1: Long,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = clusters.sparkSession
    import spark.implicits._

    // 2-party groups -> (aIndex, bIndex) matched pairs
    val pairs = Solver.pairsFromClusters(clusters)
      .where($"dp0" === 0 && $"dp1" === 1)
      .select($"rec0".as("a_index"), $"rec1".as("b_index"))

    val smaller = math.min(n0, n1)

    // shuffled slot sequence = range(smaller) ordered by seeded hash
    // (rank k of the shuffle == remaining_new_indexes[k])
    val slots = spark.range(smaller).select($"id".as("slot"))
      .withColumn("shuffle_rank",
        row_number().over(Window.orderBy(xxhash64(lit(seed), $"slot"), $"slot")) - 1)

    // deterministic group numbering (reference enumerates groups in stored
    // order; any fixed order satisfies the invariants)
    val numbered = pairs.withColumn("group_number",
      row_number().over(Window.orderBy($"a_index")) - 1)

    val matched = numbered.join(slots, $"group_number" === $"shuffle_rank")
      .select($"a_index", $"b_index", $"slot")
      .cache()
    val nMatches = matched.count()

    val mask = slots.select($"slot",
      when($"shuffle_rank" < nMatches, 1).otherwise(0).as("bit"))

    // remaining slots for side X = unused shuffle slots + [smaller, nX)
    def sidePermutation(dp: Int, n: Long, matchedSide: DataFrame): DataFrame = {
      val unusedSlots = slots.where($"shuffle_rank" >= nMatches).select($"slot")
      val overflow = spark.range(smaller, n).select($"id".as("slot"))
      val remaining = unusedSlots.union(overflow)
        .withColumn("rk",
          row_number().over(Window.orderBy(xxhash64(lit(seed + dp + 1), $"slot"), $"slot")))
      val unmatchedRows = spark.range(n).select($"id".as("row_index"))
        .join(matchedSide.select($"row_index"), Seq("row_index"), "left_anti")
        .withColumn("rk", row_number().over(Window.orderBy($"row_index")))
      val filled = unmatchedRows.join(remaining, "rk").select($"row_index", $"slot")
      val matchedPart = matchedSide.select($"row_index", $"slot")
      matchedPart.union(filled).withColumn("dp", lit(dp))
        .select($"dp", $"row_index", $"slot")
    }

    val permA = sidePermutation(0, n0, matched.select($"a_index".as("row_index"), $"slot"))
    val permB = sidePermutation(1, n1, matched.select($"b_index".as("row_index"), $"slot"))

    (permA.union(permB), mask)
  }

  /** M2: dense list form of one side's permutation (row order), as the
    * reference's `convert_mapping_to_list` (`utils.py:181-191`). */
  def toDenseList(perm: DataFrame, dp: Int): Array[Long] = {
    import perm.sparkSession.implicits._
    perm.where(col("dp") === dp).orderBy(col("row_index"))
      .select(col("slot").as[Long]).collect()
  }
}
