package graft

import org.apache.spark.sql.functions._
import graft.core.LinkConfig
import graft.ingest.ClkIO
import graft.link.Pipeline
import graft.cluster.Permutation

/** Invariant checks mirroring the reference's permutation test strategy
  * (`e2etests/tests/test_results_correctness.py:67-91` checks consistency,
  * not specific random draws). */
class PermutationSpec extends SparkSpec {

  test("permutation + mask invariants on febrl4 matching") {
    import spark.implicits._
    val cfg = LinkConfig(threshold = 0.8)
    val a = ClkIO.readBinary(spark, s"$fixturesDir/febrl4_a.bin", 0, 128)
    val b = ClkIO.readBinary(spark, s"$fixturesDir/febrl4_b.bin", 1, 128)
    val clusters = Pipeline.clusters(Pipeline.defaultBlock(a.union(b)), cfg)
    val nMatches = clusters.select("clusterId").distinct().count()

    val (perm, mask) = Permutation.permuteAndMask(clusters, 1000, 1000, seed = 7)
    val permA = Permutation.toDenseList(perm, 0)
    val permB = Permutation.toDenseList(perm, 1)
    val maskList = mask.orderBy("slot").select($"bit".as[Int]).collect()

    // each permutation is a bijection over its range
    assert(permA.length == 1000 && permA.toSet == (0L until 1000L).toSet)
    assert(permB.length == 1000 && permB.toSet == (0L until 1000L).toSet)
    // mask has exactly one bit per matched pair
    assert(maskList.length == 1000)
    assert(maskList.sum == nMatches)

    // matched pairs land in the same slot, and that slot is masked 1;
    // non-match slots are 0 (reference invariant: permutation.py:97-109)
    val truePairs = graft.cluster.Solver.pairsFromClusters(clusters)
      .select($"rec0".as[Long], $"rec1".as[Long]).collect()
    truePairs.foreach { case (ai, bi) =>
      assert(permA(ai.toInt) == permB(bi.toInt))
      assert(maskList(permA(ai.toInt).toInt) == 1)
    }
    // a masked slot is hit by exactly one matched pair
    val matchedSlots = truePairs.map { case (ai, _) => permA(ai.toInt) }
    assert(matchedSlots.distinct.length == matchedSlots.length)

    // determinism: same seed -> same output
    val (perm2, _) = Permutation.permuteAndMask(clusters, 1000, 1000, seed = 7)
    assert(Permutation.toDenseList(perm2, 0).sameElements(permA))
  }

  test("permutation identical at different input parallelism (distributed global rank)") {
    import spark.implicits._
    val cfg = LinkConfig(threshold = 0.85)
    val a = ClkIO.readBinary(spark, s"$fixturesDir/febrl4_a.bin", 0, 128)
    val b = ClkIO.readBinary(spark, s"$fixturesDir/febrl4_b.bin", 1, 128)
    val clusters = Pipeline.clusters(Pipeline.defaultBlock(a.union(b)), cfg)
    def canon(c: org.apache.spark.sql.Dataset[graft.core.ClusterMember]) = {
      val (perm, mask) = Permutation.permuteAndMask(c, 1000, 1000)
      (perm.select($"dp".as[Int], $"row_index".as[Long], $"slot".as[Long]).collect().toSet,
        mask.select($"slot".as[Long], $"bit".as[Int]).collect().toSet)
    }
    val (p1, m1) = canon(clusters)
    val (p2, m2) = canon(clusters.repartition(23))
    assert(p1 == p2 && m1 == m2)
    assert(p1.nonEmpty)
  }

  test("unequal sizes: mask length = min(n0,n1); overflow rows get slots >= min or unused") {
    import spark.implicits._
    // synthetic tiny matching: 3 matches between sides of 6 and 9 rows
    val members = Seq(
      (100L, 0, 0L), (100L, 1, 5L),
      (101L, 0, 2L), (101L, 1, 1L),
      (102L, 0, 4L), (102L, 1, 7L)
    ).map { case (c, dp, r) => graft.core.ClusterMember(c, dp, r) }
    val clusters = spark.createDataset(members)
    val (perm, mask) = Permutation.permuteAndMask(clusters, 6, 9, seed = 3)
    val permA = Permutation.toDenseList(perm, 0)
    val permB = Permutation.toDenseList(perm, 1)
    val maskList = mask.orderBy("slot").select($"bit".as[Int]).collect()
    assert(maskList.length == 6)
    assert(maskList.sum == 3)
    assert(permA.length == 6 && permA.toSet == (0L until 6L).toSet)
    assert(permB.length == 9 && permB.toSet == (0L until 9L).toSet)
    assert(permA(0) == permB(5) && permA(2) == permB(1) && permA(4) == permB(7))
  }
}
