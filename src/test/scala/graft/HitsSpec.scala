package graft

import graft.cluster.Hits

class HitsSpec extends SparkSpec {

  /** Independent scalar HITS with the same max-normalised fixed-point
    * rule, written over plain Maps. */
  private def referenceHits(edges: Seq[(Long, Long)], iters: Int,
      scale: Long): Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    def norm(raw: Map[Long, BigInt]): Map[Long, Long] = {
      val mx = raw.values.max
      nodes.map(n =>
        n -> raw.get(n).map(r => (r * scale / mx).toLong).getOrElse(0L))
        .toMap
    }
    var hub = nodes.map(_ -> scale).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      auth = norm(e.groupBy(_._2).view.mapValues(
        es => es.map(x => BigInt(hub(x._1))).sum).toMap)
      hub = norm(e.groupBy(_._1).view.mapValues(
        es => es.map(x => BigInt(auth(x._2))).sum).toMap)
    }
    nodes.map(n => n -> (hub(n), auth.getOrElse(n, 0L))).toMap
  }

  test("hits == independent scalar reimplementation; partition-invariant") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val edges = (1 to 400).map(_ =>
      (rng.nextInt(50).toLong, rng.nextInt(50).toLong))
    val expect = referenceHits(edges, iters = 2, scale = 1000000L)
    def run(parts: Int) = Hits.run(
        edges.toDF("src", "dst").repartition(parts), iters = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(run(1) == expect)
    assert(run(13) == expect)
  }

  test("authority/hub separation on a bipartite fan graph") {
    import spark.implicits._
    // hubs 100..104 each point at authorities 1..3; no back-links
    val edges = for { h <- 100L to 104L; a <- 1L to 3L } yield (h, a)
    val got = Hits.run(edges.toDF("src", "dst"), iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    (1L to 3L).foreach { a =>
      assert(got(a)._2 == 1000000L, "authorities saturate auth")
      assert(got(a)._1 == 0L, "authorities have no out-links: hub 0")
    }
    (100L to 104L).foreach { h =>
      assert(got(h)._1 == 1000000L, "hubs saturate hub")
      assert(got(h)._2 == 0L, "hubs have no in-links: auth 0")
    }
  }
}
