package graft

import graft.cluster.{LabelProp, LinkPredict}

class GraphOpsSpec extends SparkSpec {

  private def undirect(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet

  test("resourceAllocation == scalar oracle; adjacent pairs excluded") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val edges = (1 to 300).map(_ =>
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    val und = undirect(edges)
    val adj = und.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val scale = 1000000L
    val cand = (for {
      x <- adj.keys; y <- adj.keys
      if x < y && !und((x, y))
      common = adj(x) intersect adj(y)
      pivots = common.filter(z => adj(z).size <= 64)
      if pivots.nonEmpty
      s = pivots.toSeq.map(z => scale / adj(z).size).sum
    } yield (x, y, s)).toSeq
    val expect = cand.sortBy(t => (-t._3, t._1, t._2)).take(50)
    val got = LinkPredict.resourceAllocation(
        edges.toDF("src", "dst").repartition(7), topK = 50)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expect)
    assert(got.nonEmpty)
    got.foreach { case (x, y, _) => assert(!und((x, y)), "adjacent leaked") }
  }

  test("resourceAllocation drops pivots above maxPivotDeg") {
    import spark.implicits._
    // hub 0 joins every pair; spokes also chained so low-deg pivots exist
    val hub = (1L to 20L).map(i => (0L, i))
    val chain = (1L until 20L).map(i => (i, i + 1))
    val got = LinkPredict.resourceAllocation(
        (hub ++ chain).toDF("src", "dst"), maxPivotDeg = 5, topK = 1000)
      .as[(Long, Long, Long)].collect()
    // hub (deg 20) may never be a pivot: pairs whose ONLY common
    // neighbor is the hub must be absent
    assert(got.nonEmpty)
    got.foreach { case (x, y, _) =>
      val commonLow = (1L to 20L).filter(z =>
        z != x && z != y && (math.abs(z - x) == 1 || (x == 0L)) &&
          math.abs(z - y) == 1)
      assert(x != 0L || commonLow.nonEmpty || y - x == 2,
        s"($x,$y) must share a low-degree pivot")
    }
    // concretely: (1,3) share only node 2 (deg<=3) -> present;
    // (1,20) share only hub -> absent
    assert(got.exists(t => t._1 == 1L && t._2 == 3L))
    assert(!got.exists(t => t._1 == 1L && t._2 == 20L))
  }

  test("mutualBest == brute-force reciprocal top-1; subset of edges") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val edges = (for {
      r0 <- 0L until 30L; r1 <- 0L until 30L
      if rng.nextInt(5) == 0
    } yield (math.rint(rng.nextDouble() * 100) / 100, 0, r0, 1, r1)).toSeq
    val df = edges.toDF("sim", "dp0", "rec0", "dp1", "rec1")
    val got = graft.cluster.Solver.mutualBest(df.repartition(9))
      .as[(Double, Int, Long, Int, Long)].collect().toSet
    def top1[K](g: Map[K, Seq[(Double, Long)]]): Map[K, Long] =
      g.view.mapValues(_.minBy { case (s, p) => (-s, p) }._2).toMap
    val b1 = top1(edges.groupBy(_._3).view
      .mapValues(_.map(e => (e._1, e._5)).toSeq).toMap)
    val b0 = top1(edges.groupBy(_._5).view
      .mapValues(_.map(e => (e._1, e._3)).toSeq).toMap)
    val expect = edges.filter(e =>
      b1(e._3) == e._5 && b0(e._5) == e._3).toSet
    assert(got == expect)
    assert(expect.nonEmpty)
    // 1:1: no record appears twice on either side
    assert(got.map(_._3).size == got.size && got.map(_._5).size == got.size)
  }

  test("labelProp == scalar synchronous oracle; partition-invariant") {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    // two dense 12-cliques plus sparse random noise between them
    val cliqueA = for { i <- 0L to 11L; j <- 0L to 11L if i < j } yield (i, j)
    val cliqueB = for { i <- 20L to 31L; j <- 20L to 31L if i < j } yield (i, j)
    val noise = (1 to 8).map(_ =>
      (rng.nextInt(12).toLong, rng.nextInt(12).toLong + 20L))
    val edges = cliqueA ++ cliqueB ++ noise
    val und = undirect(edges)
    val adj = und.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = adj.map { case (n, ns) =>
        val counts = ns.groupBy(lab).view.mapValues(_.size)
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    def run(parts: Int) = LabelProp.run(
        edges.toDF("src", "dst").repartition(parts), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(run(1) == lab)
    assert(run(11) == lab)
    // communities recovered: each clique converges to one label,
    // different between the cliques
    val la = (0L to 11L).map(lab).distinct
    val lb = (20L to 31L).map(lab).distinct
    assert(la.size == 1 && lb.size == 1 && la != lb)
  }

  test("Star.assign == local one-round star cover; no adjacent centers") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val edges = (1 to 400).map(_ =>
      (rng.nextInt(60).toLong, rng.nextInt(60).toLong))
    val und = undirect(edges)
    val adj = und.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    def key(n: Long) = (deg(n), n)
    val expect = adj.keys.map { n =>
      val isCenter = adj(n).forall(z =>
        Ordering[(Long, Long)].gt(key(n), key(z)))
      if (isCenter) (n, "center", n)
      else {
        val cNbs = adj(n).filter(z =>
          adj(z).forall(w => Ordering[(Long, Long)].gt(key(z), key(w))))
        if (cNbs.isEmpty) (n, "orphan", n)
        else { val c = cNbs.maxBy(key); (n, "satellite", c) }
      }
    }.toSet
    val got = graft.cluster.Star.assign(
        edges.toDF("src", "dst").repartition(7))
      .as[(Long, String, Long)].collect().toSet
    assert(got == expect)
    // structural invariants: centers never adjacent; satellites point at
    // an adjacent center
    val centers = got.filter(_._2 == "center").map(_._1)
    centers.foreach(c => assert((adj(c) intersect centers).isEmpty))
    got.filter(_._2 == "satellite").foreach { case (n, _, s) =>
      assert(centers(s) && adj(n)(s))
    }
  }

  test("Triangles.edgeSupport == brute-force common-neighbor counts") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val edges = (1 to 350).map(_ =>
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    val und = undirect(edges)
    val adj = und.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = und.map { case (u, v) =>
      val s = (adj(u) intersect adj(v)).size.toLong
      (u, v, s, s == 0L)
    }
    val got = graft.cluster.Triangles.edgeSupport(
        edges.toDF("src", "dst").repartition(5))
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == expect)
    assert(got.exists(_._3 > 0) && expect.nonEmpty)
  }

  test("Scc.run == brute-force mutual reachability (random digraphs)") {
    import spark.implicits._
    for (seed <- Seq(7, 29)) {
      val rng = new scala.util.Random(seed)
      val n = 48
      // sparse random digraph + a planted 6-cycle so a non-trivial SCC
      // is guaranteed
      val edges = ((1 to 120).map(_ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)) ++
        (0 until 6).map(i => (i.toLong, ((i + 1) % 6).toLong)))
        .filter(e => e._1 != e._2).distinct
      // boolean Floyd-Warshall closure
      val reach = Array.fill(n, n)(false)
      edges.foreach { case (u, v) => reach(u.toInt)(v.toInt) = true }
      for (k <- 0 until n; i <- 0 until n if reach(i)(k);
           j <- 0 until n if reach(k)(j)) reach(i)(j) = true
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expect = nodes.map { v =>
        val mutual = nodes.filter(u =>
          reach(v.toInt)(u.toInt) && reach(u.toInt)(v.toInt))
        v -> ((mutual :+ v).min)
      }.toMap
      val got = graft.cluster.Scc.run(
          edges.toDF("src", "dst").repartition(7))
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"seed $seed")
      // the planted cycle is one SCC rooted at 0
      assert((0 until 6).forall(i => got(i.toLong) == 0L), s"seed $seed")
    }
  }

  test("Bowtie.classify == planted structure and brute force") {
    import spark.implicits._
    // planted: core cycle {10,11,12}, IN chain 1->2->10, OUT 12->20->21,
    // tendril 2->30 (reached from IN, never reaches core), second small
    // cycle {40,41} disconnected from everything
    val planted = Seq((10L, 11L), (11L, 12L), (12L, 10L), (1L, 2L),
      (2L, 10L), (12L, 20L), (20L, 21L), (2L, 30L), (40L, 41L), (41L, 40L))
    val gotP = graft.cluster.Bowtie.classify(planted.toDF("src", "dst"))
      .as[(Long, String)].collect().toMap
    assert(gotP == Map(10L -> "core", 11L -> "core", 12L -> "core",
      1L -> "in", 2L -> "in", 20L -> "out", 21L -> "out",
      30L -> "tendril", 40L -> "disconnected", 41L -> "disconnected"))

    // random digraph vs closure-based brute force
    val rng = new scala.util.Random(31)
    val n = 40
    val edges = ((1 to 90).map(_ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong)) ++
      (0 until 5).map(i => (i.toLong, ((i + 1) % 5).toLong)))
      .filter(e => e._1 != e._2).distinct
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (u, v) => reach(u.toInt)(v.toInt) = true }
    for (k <- 0 until n; i <- 0 until n if reach(i)(k);
         j <- 0 until n if reach(k)(j)) reach(i)(j) = true
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val sccOf = nodes.map { v =>
      v -> (nodes.filter(u => reach(v.toInt)(u.toInt) &&
        reach(u.toInt)(v.toInt)) :+ v).min
    }.toMap
    val coreLbl = sccOf.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (lbl, sz) => (-sz, lbl) }.head._1
    val coreSet = sccOf.filter(_._2 == coreLbl).keySet
    // undirected closure for weak connectivity
    val wreach = Array.fill(n, n)(false)
    edges.foreach { case (u, v) =>
      wreach(u.toInt)(v.toInt) = true; wreach(v.toInt)(u.toInt) = true }
    for (k <- 0 until n; i <- 0 until n if wreach(i)(k);
         j <- 0 until n if wreach(k)(j)) wreach(i)(j) = true
    val expect = nodes.map { v =>
      val cls =
        if (coreSet(v)) "core"
        else if (coreSet.exists(c => reach(v.toInt)(c.toInt))) "in"
        else if (coreSet.exists(c => reach(c.toInt)(v.toInt))) "out"
        else if (coreSet.exists(c => v == c ||
          wreach(v.toInt)(c.toInt))) "tendril"
        else "disconnected"
      v -> cls
    }.toMap
    val got = graft.cluster.Bowtie.classify(
        edges.toDF("src", "dst").repartition(5))
      .as[(Long, String)].collect().toMap
    assert(got == expect)
  }
}
