package graft

import graft.cluster.ConnectedComponents
import scala.util.Random

/** Connected-components gate: the distributed large-star/small-star path
  * and the driver-side union-find early-exit must agree with each other
  * and with an in-test brute-force (BFS) oracle on random graphs, and the
  * mid-loop drop-to-local path must match the pure-distributed fixpoint.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    val nodes = scala.collection.mutable.Set[Long]()
    edges.foreach { case (u, v) =>
      // self-loop-only nodes are dropped by run() — mirror that here
      if (u != v) { nodes += u; nodes += v; adj(u) ::= v; adj(v) ::= u }
    }
    val comp = scala.collection.mutable.Map[Long, Long]()
    nodes.toSeq.sorted.foreach { start =>
      if (!comp.contains(start)) {
        var frontier = List(start)
        val members = scala.collection.mutable.ArrayBuffer[Long]()
        while (frontier.nonEmpty) {
          val h = frontier.head
          frontier = frontier.tail
          if (!comp.contains(h)) {
            comp(h) = start
            members += h
            frontier = adj(h) ::: frontier
          }
        }
        val m = members.min
        members.foreach(comp(_) = m)
      }
    }
    comp.toMap
  }

  private def runToMap(edges: Seq[(Long, Long)], localMax: Long): Map[Long, Long] =
    ConnectedComponents.run(edges.toDS(), localSolveMaxEdges = localMax)
      .as[(Long, Long)].collect().toMap

  test("random graphs: distributed == local union-find == brute force") {
    val rnd = new Random(42)
    for (trial <- 1 to 4) {
      val n = 200 + trial * 100
      val edges = Seq.fill(n)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)) ++
        Seq((1000L, 2000L), (2000L, 3000L), (3000L, 1000L)) // ring far from the rest
      val oracle = bruteForce(edges)
      val dist = runToMap(edges, localMax = 0) // forces the star iterations
      val local = runToMap(edges, localMax = Long.MaxValue) // forces union-find
      assert(dist === oracle, s"distributed path diverged (trial $trial)")
      assert(local === oracle, s"local union-find diverged (trial $trial)")
    }
  }

  test("mid-loop drop-to-local matches pure-distributed on a long chain") {
    // chain contracts over iterations; localMax=64 triggers the mid-loop
    // collect once the star rounds shrink the edge set under the bound
    val chain = (0L until 300L).map(i => (i, i + 1))
    val oracle = bruteForce(chain)
    assert(runToMap(chain, localMax = 64) === oracle)
    assert(runToMap(chain, localMax = 0) === oracle)
  }

  test("self-loops dropped (isolated nodes are the caller's concern)") {
    val edges = Seq((5L, 5L), (1L, 2L))
    assert(runToMap(edges, localMax = Long.MaxValue) === Map(1L -> 1L, 2L -> 1L))
    assert(runToMap(edges, localMax = 0) === Map(1L -> 1L, 2L -> 1L))
  }

  test("kCore: == local peel oracle; pendant structure peels away") {
    import spark.implicits._
    import graft.cluster.KCore
    // triangle with a pendant chain: the triangle is the whole 2-core
    val hand = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val got = KCore.run(hand.toDS(), k = 2).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // a pure path has NO 2-core (cascading peel to empty)
    assert(KCore.run(Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDS(), k = 2)
      .count() == 0)
    // random graphs vs a local peel oracle
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(300)(
        (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(e => e._1 != e._2).distinct
      val k = 3
      var cur: Set[(Long, Long)] =
        edges.map(e => (e._1 min e._2, e._1 max e._2)).toSet
      var changed = true
      while (changed) {
        val deg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = cur.filter(e => keep(e._1) && keep(e._2))
        changed = next != cur
        cur = next
      }
      val wantDeg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val g = KCore.run(edges.toDS(), k).as[(Long, Long)].collect().toMap
      assert(g == wantDeg, s"trial $trial")
    }
  }

  test("incrementalRun == from-scratch run over the union graph") {
    import spark.implicits._
    import graft.cluster.ConnectedComponents
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      // random graph; the delta split exercises new nodes, edges inside
      // one old component (collapse to self-loops), and merges ACROSS
      // old components
      val all = Seq.fill(400)(
        (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)).distinct
      val (delta, old) = all.partition(e => (e._1 + e._2) % 3 == 0)
      val prev = ConnectedComponents.run(old.toDS())
      val got = ConnectedComponents.incrementalRun(prev, delta.toDS())
        .as[(Long, Long)].collect()
      assert(got.map(_._1).distinct.length == got.length,
        s"trial $trial: duplicate node assignments")
      val want = ConnectedComponents.run(all.toDS())
        .as[(Long, Long)].collect().toSet
      assert(got.toSet == want, s"trial $trial")
    }
    // delta merging two previously separate components relabels BOTH
    val prev = ConnectedComponents.run(Seq((1L, 2L), (10L, 11L)).toDS())
    val got = ConnectedComponents.incrementalRun(prev, Seq((2L, 10L)).toDS())
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L))
    // empty delta is the identity
    val same = ConnectedComponents.incrementalRun(prev,
      spark.emptyDataset[(Long, Long)]).as[(Long, Long)].collect().toMap
    assert(same == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("Bfs == local level-set oracle; radius bound; unreachable absent") {
    import spark.implicits._
    // deterministic directed graph on 40 nodes: i -> (i*3+1)%40, and
    // i -> (i+7)%40 for even i; node 39 isolated from the seeds' reach?
    // (the oracle decides — no hand-assumed structure)
    val edgeSeq = (0L until 40L).flatMap { i =>
      Seq((i, (i * 3 + 1) % 40)) ++
        (if (i % 2 == 0) Seq((i, (i + 7) % 40)) else Nil)
    }
    val edges = edgeSeq.toDF("src", "dst")
    val seeds = Seq(0L, 20L).toDF("node")
    val maxHops = 3
    val got = graft.cluster.Bfs.run(edges, seeds, maxHops)
      .as[(Long, Int)].collect().toMap
    // local BFS
    val adj = edgeSeq.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var want = Map(0L -> 0, 20L -> 0)
    var frontier = Set(0L, 20L)
    for (h <- 1 to maxHops) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(want.contains)
      next.foreach(n => want += n -> h)
      frontier = next
    }
    assert(got == want)
    assert(got.values.max <= maxHops)
    assert(want.size < 40 || got.size == 40)
    // partition invariance
    val got2 = graft.cluster.Bfs.run(edges.repartition(7), seeds, maxHops)
      .as[(Long, Int)].collect().toMap
    assert(got2 == got)
    // maxHops = 0 returns just the seeds
    assert(graft.cluster.Bfs.run(edges, seeds, 0)
      .as[(Long, Int)].collect().toMap == Map(0L -> 0, 20L -> 0))
  }
}
