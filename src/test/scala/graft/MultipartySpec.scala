package graft

import org.apache.spark.sql.functions._
import graft.core.LinkConfig
import graft.ingest.ClkIO
import graft.link.{Linker, Pipeline}
import graft.cluster.Solver

/** 5-party fixture (sizes 3228/3242/3256/3242/3260, 128-byte CLKs,
  * t=0.8 per `test_results_correctness_multiparty.py:11-12`). No labels in
  * the pickle; per FIXTURES.md §A2 we assert structural invariants and
  * partitioning invariance, plus exact equality of the edge set with a
  * brute-force threshold cut on a subsample.
  */
class MultipartySpec extends SparkSpec {

  private def loadAll() = (0 until 5).map { k =>
    ClkIO.readBinary(spark, s"$fixturesDir/multiparty_$k.bin", k, 128)
  }.reduce(_ union _)

  test("5-party groups well-formed at t=0.8") {
    import spark.implicits._
    val cfg = LinkConfig(threshold = 0.8)
    val blocked = Pipeline.defaultBlock(loadAll())
    val edges = Pipeline.edges(blocked, cfg).cache()

    // candidate generation never pairs records of the same provider
    assert(edges.where($"dp0" >= $"dp1").count() == 0)

    val clusters = Solver.solve(edges, cfg).cache()
    val byCluster = clusters.groupBy("clusterId")
      .agg(count(lit(1)).as("n"), countDistinct($"dp").as("ndp"))
    // no singletons; a group never holds two rows of one provider
    // (same-provider cross pairs can't be candidates -> merge rule forbids)
    assert(byCluster.where($"n" < 2).count() == 0)
    assert(byCluster.where($"n" =!= $"ndp").count() == 0)
    assert(byCluster.where($"n" > 5).count() == 0)
    // every record is in at most one group
    val dup = clusters.groupBy("dp", "entityId").count().where($"count" > 1)
    assert(dup.count() == 0)
    info(s"edges=${edges.count()} groups=${byCluster.count()}")
  }

  test("5-party groups exactly equal the frozen golden output at t=0.8") {
    // Golden file = this repo's own solver output, frozen by
    // tools/MakeOracleFixtures (documented circularity — the reference
    // freezes anonlink's output the same way,
    // test_results_correctness_multiparty.py:15-45). Gate catches any
    // regression in kernel / CC / greedy-merge determinism.
    import spark.implicits._
    val golden = scala.io.Source.fromFile(
      s"$fixturesDir/multiparty_golden_groups.csv").getLines().drop(1)
      .map { l =>
        val Array(c, d, e) = l.split(",")
        (c.toLong, d.toInt, e.toLong)
      }.toSet
    val got = Solver.solve(
      Pipeline.edges(Pipeline.defaultBlock(loadAll()), LinkConfig(threshold = 0.8)),
      LinkConfig(threshold = 0.8))
      .select($"clusterId".as[Long], $"dp".as[Int], $"entityId".as[Long])
      .collect().toSet
    assert(got.size == golden.size, s"member count ${got.size} != golden ${golden.size}")
    assert(got == golden)
  }

  test("result invariant under repartitioning/parallelism") {
    import spark.implicits._
    val cfg = LinkConfig(threshold = 0.85)
    val all = loadAll()
    val blocked1 = Pipeline.defaultBlock(all)
    val blocked2 = Pipeline.defaultBlock(all).repartition(17, col("entity_id"))
    def canon(c: org.apache.spark.sql.Dataset[graft.core.ClusterMember]) =
      c.select($"clusterId".as[Long], $"dp".as[Int], $"entityId".as[Long])
        .collect().toSet
    val c1 = canon(Pipeline.clusters(blocked1, cfg))
    val c2 = canon(Pipeline.clusters(blocked2, cfg))
    assert(c1 == c2)
    assert(c1.nonEmpty)
  }

  test("chunked kernel == declarative join formulation (exact edge equality)") {
    import spark.implicits._
    val cfg = LinkConfig(threshold = 0.8)
    val a = ClkIO.readBinary(spark, s"$fixturesDir/multiparty_0.bin", 0, 128)
      .filter(_.entityId < 600)
    val b = ClkIO.readBinary(spark, s"$fixturesDir/multiparty_1.bin", 1, 128)
      .filter(_.entityId < 600)
    val c = ClkIO.readBinary(spark, s"$fixturesDir/multiparty_2.bin", 2, 128)
      .filter(_.entityId < 600)
    val blocked = Pipeline.defaultBlock(a.union(b).union(c))
    def canon(e: org.apache.spark.sql.Dataset[graft.core.Edge]) =
      e.collect().map(x => (x.dp0, x.rec0, x.dp1, x.rec1, x.sim)).toSet
    val chunked = canon(Linker.scoreCandidatesChunked(blocked, cfg))
    val joined = canon(Linker.scoreCandidatesJoin(blocked, cfg))
    assert(chunked == joined)
    assert(chunked.nonEmpty)
  }

  test("edge set equals brute-force threshold cut (subsampled providers 0x1)") {
    import spark.implicits._
    val cfg = LinkConfig(threshold = 0.8)
    // first 400 records of providers 0 and 1
    val a = ClkIO.readBinary(spark, s"$fixturesDir/multiparty_0.bin", 0, 128)
      .filter(_.entityId < 400)
    val b = ClkIO.readBinary(spark, s"$fixturesDir/multiparty_1.bin", 1, 128)
      .filter(_.entityId < 400)
    val edges = Pipeline.edges(Pipeline.defaultBlock(a.union(b)), cfg)
      .map(e => (e.rec0, e.rec1, e.sim)).collect().toSet

    val rawA = a.collect().sortBy(_.entityId)
    val rawB = b.collect().sortBy(_.entityId)
    val expected = (for {
      x <- rawA.iterator
      y <- rawB.iterator
      s = graft.core.BitOps.dicePre(x.clk, y.clk, x.popcount + y.popcount)
      if s >= cfg.threshold
    } yield (x.entityId, y.entityId, s)).toSet
    assert(edges == expected)
    assert(expected.nonEmpty)
  }
}
