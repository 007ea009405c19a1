package graft.cluster

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
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
  * Scale note: every "shuffle rank" here is a DISTRIBUTED global rank —
  * a range-partitioned sort + per-partition offsets (zipWithIndex), never
  * a single-partition window — so permutation export scales with the
  * cluster like any other sort. The rank of a row in a total order is
  * invariant to partition boundaries, so results are identical at any
  * parallelism (PermutationSpec).
  */
object Permutation {

  /** Distributed 0-based global rank in the total order given by `order`
    * (must be a TOTAL order — include a unique tiebreaker). Implemented as
    * sort + zipWithIndex: the one genuinely per-partition-imperative step
    * (offset accumulation) that the DataFrame API lacks. Public: also the
    * rank primitive behind sorted-neighborhood blocking
    * ([[graft.ingest.Blocking.sortedNeighborhoodPairs]]). */
  def withGlobalRank(df: DataFrame, out: String,
      order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(order: _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, sorted.schema.add(out, LongType, nullable = false))
  }

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
    val slots = withGlobalRank(
      spark.range(smaller).select($"id".as("slot")),
      "shuffle_rank", Seq(xxhash64(lit(seed), $"slot"), $"slot"))
      .cache()

    // deterministic group numbering (reference enumerates groups in stored
    // order; any fixed order satisfies the invariants). b_index tiebreaker
    // makes the order TOTAL even when a multi-member cluster yields two
    // cross pairs sharing a_index — a_index alone would leave the rank
    // partition-dependent there.
    val numbered = withGlobalRank(pairs, "group_number",
      Seq($"a_index", $"b_index"))

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
      val remaining = withGlobalRank(unusedSlots.union(overflow),
        "rk", Seq(xxhash64(lit(seed + dp + 1), $"slot"), $"slot"))
      val unmatchedRows = withGlobalRank(
        spark.range(n).select($"id".as("row_index"))
          .join(matchedSide.select($"row_index"), Seq("row_index"), "left_anti"),
        "rk", Seq($"row_index"))
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
