package graft

import org.apache.spark.sql.functions._
import graft.cluster.PageRank

class PageRankSpec extends SparkSpec {

  test("hand-computed two-iteration oracle on a 3-node graph") {
    import spark.implicits._
    // 1 -> {2,3}, 2 -> 1, 3 -> 1; scale 1000, base = 150
    // r0 = (1000, 1000, 1000)
    // it1: c(1)=1000+1000=2000, c(2)=c(3)=1000 DIV 2=500
    //      r1 = (150+1700, 150+425, 150+425) = (1850, 575, 575)
    // it2: c(1)=575+575=1150, c(2)=c(3)=1850 DIV 2=925
    //      r2 = (150+977, 150+786, 150+786) = (1127, 936, 936)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val got = PageRank.run(edges, iters = 2, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1127L, 2L -> 936L, 3L -> 936L))
  }

  test("personalized: == scalar oracle; unreachable nodes stay exactly 0") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val reachable = (1 to 150).map(_ =>
      (rng.nextInt(30).toLong, rng.nextInt(30).toLong))
    // an isolated island the seeds can never reach
    val island = Seq((100L, 101L), (101L, 102L), (102L, 100L))
    val edges = (reachable ++ island).filter(e => e._1 != e._2)
    val seeds = Seq(0L, 5L)
    val scale = 1000000000000L
    // scalar replication
    val e0 = edges.distinct
    val outs = e0.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val nodes = (e0.map(_._1) ++ e0.map(_._2)).distinct
    val base = scale * 15L / 100L
    var r = nodes.map(n => n -> (if (seeds.contains(n)) scale else 0L)).toMap
    for (_ <- 1 to 3) {
      val in = nodes.map(n => n -> BigInt(0)).to(collection.mutable.Map)
      outs.foreach { case (s, ds) =>
        val c = r(s) / ds.size
        ds.foreach(d => in(d) += c)
      }
      r = nodes.map(n => n ->
        ((if (seeds.contains(n)) base else 0L) +
          (in(n) * 85 / 100).toLong)).toMap
    }
    val got = PageRank.runPersonalized(edges.toDF("src", "dst"),
        seeds.toDF("node"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == r)
    assert(Seq(100L, 101L, 102L).forall(got(_) == 0L), "island must be 0")
    assert(got(0L) >= base, "seed keeps restart mass")
  }

  test("bit-identical across parallelism; hub outranks spokes") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val star = (2L to 40L).flatMap(i => Seq((i, 1L), (1L, i)))
    val noise = (1 to 120).map(_ =>
      (rng.nextInt(40).toLong + 1, rng.nextInt(40).toLong + 1))
    val edges = (star ++ noise).toDF("src", "dst")
    val a = PageRank.run(edges.repartition(1), iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = PageRank.run(edges.repartition(13), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "integer PageRank must not depend on partitioning")
    val hub = a(1L)
    assert((2L to 40L).forall(i => a(i) < hub), "hub must outrank spokes")
  }
}
