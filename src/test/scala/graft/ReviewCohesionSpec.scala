package graft

import org.apache.spark.sql.functions._
import graft.link.Review
import graft.cluster.Evaluation

/** Three-zone clerical band: zones partition the edge set at the upper
  * threshold and review queue positions are dense per left record in
  * (sim DESC, dp1, rec1) order. */
class ReviewSpec extends SparkSpec {

  private def edges(rows: (Double, Int, Long, Int, Long)*) = {
    import spark.implicits._
    rows.toDF("sim", "dp0", "rec0", "dp1", "rec1")
  }

  test("zones partition at upper; accept rows never queue") {
    val e = edges((0.95, 0, 1L, 1, 10L), (0.85, 0, 1L, 1, 11L),
      (0.75, 0, 1L, 1, 12L), (0.72, 0, 2L, 1, 10L))
    val out = Review.threeZone(e, upper = 0.8).collect()
    assert(out.length == 4)
    out.foreach { r =>
      val accept = r.getAs[Double]("sim") >= 0.8
      assert(r.getAs[String]("zone") == (if (accept) "accept" else "review"))
      if (accept) assert(r.getAs[Int]("queue_pos") == 0)
    }
  }

  test("review queue is dense per left record, most match-like first") {
    val e = edges(
      (0.79, 0, 1L, 1, 12L), (0.71, 0, 1L, 1, 10L), (0.75, 0, 1L, 1, 11L),
      // tie on sim -> dp1/rec1 ascending breaks it
      (0.75, 0, 2L, 1, 21L), (0.75, 0, 2L, 1, 20L))
    val out = Review.threeZone(e, upper = 0.8)
      .where(col("rec0") === 1L).orderBy(col("queue_pos"))
      .select("sim", "queue_pos").collect().toSeq
    assert(out.map(r => (r.getDouble(0), r.getInt(1))) ==
      Seq((0.79, 1), (0.75, 2), (0.71, 3)))
    val ties = Review.threeZone(e, upper = 0.8)
      .where(col("rec0") === 2L).orderBy(col("queue_pos"))
      .select("rec1", "queue_pos").collect().toSeq
    assert(ties.map(r => (r.getLong(0), r.getInt(1))) == Seq((20L, 1), (21L, 2)))
  }

  test("matches a brute-force zone/rank replay on a fixture slice") {
    import graft.core.LinkConfig
    import graft.link.Pipeline
    import graft.ingest.ClkIO
    val a = ClkIO.readBinary(spark, s"$fixturesDir/febrl4_a.bin", 0, 128)
      .where(col("entityId") < 200)
    val b = ClkIO.readBinary(spark, s"$fixturesDir/febrl4_b.bin", 1, 128)
      .where(col("entityId") < 200)
    val blocked = Pipeline.defaultBlock(a.union(b))
    val e = Pipeline.edges(blocked, LinkConfig(threshold = 0.7)).toDF()
    val out = Review.threeZone(e, upper = 0.8)
    val rows = out.collect()
    // brute-force replay: group review rows by (dp0, rec0), sort, rank
    val review = rows.filter(_.getAs[String]("zone") == "review")
    review.groupBy(r => (r.getAs[Int]("dp0"), r.getAs[Long]("rec0")))
      .foreach { case (_, grp) =>
        val sorted = grp.sortBy(r => (-r.getAs[Double]("sim"),
          r.getAs[Int]("dp1").toLong, r.getAs[Long]("rec1")))
        assert(sorted.map(_.getAs[Int]("queue_pos")).toSeq ==
          (1 to sorted.length).toSeq)
      }
    assert(rows.forall(r => (r.getAs[Double]("sim") >= 0.8) ==
      (r.getAs[String]("zone") == "accept")))
  }

  test("unlinkables == local best-score sweep incl. no-candidate records") {
    import spark.implicits._
    val e = Seq(
      (0.95, 0, 1L, 1, 10L), (0.72, 0, 1L, 1, 11L),
      (0.80, 0, 2L, 1, 10L), (0.71, 0, 3L, 1, 12L))
      .toDF("sim", "dp0", "rec0", "dp1", "rec1")
    // universe: 4 left + 3 right records, one (0,4) with no candidates
    val recs = Seq((0, 1L), (0, 2L), (0, 3L), (0, 4L),
      (1, 10L), (1, 11L), (1, 12L)).toDF("dp", "rec")
    val thresholds = Seq(0.7, 0.8, 0.9)
    val got = Review.unlinkables(e, recs, thresholds).collect()
      .map(r => r.getAs[Double]("threshold") ->
        (r.getAs[Long]("n_records"), r.getAs[Long]("n_unlinkable")))
      .toMap
    // local: best per record over both endpoints, absent -> 0.0
    val best = Map((0, 1L) -> 0.95, (0, 2L) -> 0.80, (0, 3L) -> 0.71,
      (0, 4L) -> 0.0, (1, 10L) -> 0.95, (1, 11L) -> 0.72, (1, 12L) -> 0.71)
    thresholds.foreach { t =>
      val want = best.values.count(_ < t).toLong
      assert(got(t) == (7L, want), s"t=$t")
    }
  }

  test("unlinkables frac is n_unlinkable / n_records rounded to 6") {
    import spark.implicits._
    val e = Seq((0.9, 0, 1L, 1, 10L)).toDF("sim", "dp0", "rec0", "dp1", "rec1")
    val recs = Seq((0, 1L), (0, 2L), (0, 3L)).toDF("dp", "rec")
    val r = Review.unlinkables(e, recs, Seq(0.8)).collect().head
    assert(r.getAs[Long]("n_unlinkable") == 2L)
    assert(math.abs(r.getAs[Double]("frac") - 0.666667) < 1e-9)
  }

  test("modularity == local computation on a known two-cluster graph") {
    import spark.implicits._
    // two triangles joined by one bridge edge; labels = the triangles
    val e = Seq(
      (1.0, 0, 1L, 0, 2L), (1.0, 0, 2L, 0, 3L), (1.0, 0, 1L, 0, 3L),
      (1.0, 0, 4L, 0, 5L), (1.0, 0, 5L, 0, 6L), (1.0, 0, 4L, 0, 6L),
      (0.9, 0, 3L, 0, 4L))
      .toDF("sim", "dp0", "rec0", "dp1", "rec1")
    val labels = Seq((0, 1L, 100L), (0, 2L, 100L), (0, 3L, 100L),
      (0, 4L, 200L), (0, 5L, 200L), (0, 6L, 200L))
      .toDF("dp", "rec", "label")
    val r = Evaluation.modularity(e, labels).collect().head
    // m=7, intra=6, degrees: cluster 100 d=7, cluster 200 d=7 -> dsq=98
    assert(r.getAs[Long]("n_edges") == 7L)
    assert(r.getAs[Long]("n_intra") == 6L)
    assert(r.getAs[Long]("deg_sq_sum") == 98L)
    val want = (4.0 * 7 * 6 - 98.0) / (4.0 * 7 * 7)
    assert(math.abs(r.getAs[Double]("modularity") -
      math.rint(want * 1e6) / 1e6) < 1e-12)
  }

  test("scoreCalibration: per-bin observed match rates == local bucketing") {
    import spark.implicits._
    val e = Seq(
      (0.52, 0, 1L, 1, 10L), (0.54, 0, 2L, 1, 11L), // bin 10: 1 true of 2
      (0.81, 0, 3L, 1, 12L), (0.83, 0, 4L, 1, 13L), // bin 16: 2 true of 2
      (0.95, 0, 5L, 1, 14L))                         // bin 19: 0 true of 1
      .toDF("sim", "dp0", "rec0", "dp1", "rec1")
    val truth = Seq((1L, 10L), (3L, 12L), (4L, 13L), (9L, 99L))
      .toDF("rec0", "rec1")
    val got = Evaluation.scoreCalibration(e, truth).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_true"),
          r.getAs[Double]("match_rate"), r.getAs[Double]("bin_lo"))).toMap
    assert(got(10L) == (2L, 1L, 0.5, 0.5))
    assert(got(16L) == (2L, 2L, 1.0, 0.8))
    assert(got(19L) == (1L, 0L, 0.0, 0.95))
    assert(got.size == 3)
  }

  test("matchMultiplicity: per-record accepted-edge count distribution") {
    import spark.implicits._
    val e = Seq(
      (0.9, 0, 1L, 1, 10L), (0.9, 0, 1L, 1, 11L), (0.9, 0, 1L, 1, 12L),
      (0.9, 0, 2L, 1, 10L), (0.9, 0, 3L, 1, 13L))
      .toDF("sim", "dp0", "rec0", "dp1", "rec1")
    val got = Evaluation.matchMultiplicity(e).collect()
      .map(r => (r.getAs[Int]("dp"), r.getAs[Long]("n_matches")) ->
        r.getAs[Long]("n_records")).toMap
    // dp0: rec1 has 3 matches, rec2 and rec3 one each
    // dp1: rec10 has 2 matches, rec11/12/13 one each
    assert(got == Map((0, 3L) -> 1L, (0, 1L) -> 2L,
      (1, 2L) -> 1L, (1, 1L) -> 3L))
  }

  test("persistentIds: reciprocal best carries; splits/merges don't double-claim") {
    import spark.implicits._
    // old: A={1,2,3}, B={4,5}, C={6}
    val oldA = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 30L)).toDF("id", "c")
    // new: X={1,2} (best of A), Y={3,4,5} (overlaps A(1) and B(2) ->
    // best old is B), Z={7} (no overlap)
    val newA = Seq((1L, 100L), (2L, 100L), (3L, 200L), (4L, 200L),
      (5L, 200L), (7L, 300L)).toDF("id", "c")
    val got = Evaluation.persistentIds(oldA, newA, "id", "c").collect()
      .map(r => r.getAs[Long]("new_cluster") ->
        (Option(r.getAs[java.lang.Long]("persistent_id")).map(_.toLong),
          r.getAs[Long]("overlap"), r.getAs[Boolean]("carried"),
          r.getAs[Long]("n_members"))).toMap
    assert(got(100L) == (Some(10L), 2L, true, 2L)) // X <-> A reciprocal
    assert(got(200L) == (Some(20L), 2L, true, 3L)) // Y <-> B reciprocal
    assert(got(300L) == (None, 0L, false, 1L))     // Z: fresh id needed
  }

  test("persistentIds: a split's two fragments cannot both claim the old id") {
    import spark.implicits._
    val oldA = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)).toDF("id", "c")
    // split into X={1,2,3} and Y={4}: only X (larger overlap) carries
    val newA = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 200L))
      .toDF("id", "c")
    val got = Evaluation.persistentIds(oldA, newA, "id", "c").collect()
      .map(r => r.getAs[Long]("new_cluster") -> r.getAs[Boolean]("carried"))
      .toMap
    assert(got == Map(100L -> true, 200L -> false))
  }

  test("intraClusterSims == local popcount Dice over implied member pairs") {
    import spark.implicits._
    val clks = spark.read.parquet(s"$fixturesDir/febrl4_clks.parquet")
      .select(col("dp"), col("entity_id").as("rec"), col("pc"), col("words"))
      .where(col("rec") < 100)
    // labels: pair each record (0, r) with (1, r) — entity-truth-ish
    val labels = clks.select(col("dp"), col("rec"),
      col("rec").as("label"))
    val got = Evaluation.intraClusterSims(labels, clks).collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("n_pairs"),
          r.getAs[Double]("min_sim"), r.getAs[Double]("max_sim"))).toMap
    val local = clks.collect()
      .map(r => (r.getAs[Int]("dp"), r.getAs[Long]("rec")) ->
        (r.getAs[Int]("pc").toLong, r.getAs[Seq[Long]]("words").toArray))
      .toMap
    def dice(a: (Long, Array[Long]), b: (Long, Array[Long])): Double = {
      val inter = a._2.zip(b._2)
        .map { case (x, y) => java.lang.Long.bitCount(x & y).toLong }.sum
      2.0 * inter / (a._1 + b._1)
    }
    var n = 0
    local.keys.filter(_._1 == 0).foreach { case (_, r) =>
      if (local.contains((1, r))) {
        val s = dice(local((0, r)), local((1, r)))
        assert(got(r) == (2L, 1L, s, s), s"label $r")
        n += 1
      }
    }
    assert(n > 10 && got.size == n)
  }

  test("modularity: unlabeled endpoints get unique singleton labels") {
    import spark.implicits._
    val e = Seq((0.9, 0, 1L, 1, 2L), (0.9, 0, 1L, 1, 3L))
      .toDF("sim", "dp0", "rec0", "dp1", "rec1")
    // only record (0,1) is labeled; (1,2) and (1,3) are singletons
    val labels = Seq((0, 1L, 7L)).toDF("dp", "rec", "label")
    val r = Evaluation.modularity(e, labels).collect().head
    assert(r.getAs[Long]("n_edges") == 2L)
    assert(r.getAs[Long]("n_intra") == 0L)
    // degrees: label 7 d=2, two singletons d=1 each -> dsq = 4+1+1
    assert(r.getAs[Long]("deg_sq_sum") == 6L)
  }
}

/** Cluster-cohesion audit: per-component implied-pair closure vs scored
  * edge support, checked against a local union-find brute force. */
class CohesionSpec extends SparkSpec {

  test("dendrogramCuts: per-threshold structure matches a local union-find sweep") {
    import spark.implicits._
    // sims chosen so each cut peels one edge: chain 1-2-3 + pair 5
    val raw = Seq(
      (0.90, 0, 1L, 1, 1L), (0.78, 0, 2L, 1, 1L), // chain joins only at 0.75
      (0.82, 0, 5L, 1, 5L))
    val cuts = Seq(0.75, 0.8, 0.85)
    val out = graft.cluster.Evaluation.dendrogramCuts(
        raw.toDF("sim", "dp0", "rec0", "dp1", "rec1"), cuts)
      .orderBy("threshold").collect()
    def n(dp: Int, rec: Long): Long = (dp.toLong << 40) | rec
    val expect = cuts.map { t =>
      val kept = raw.filter(_._1 >= t)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      kept.foreach { case (_, d0, r0, d1, r1) =>
        val (a, b) = (find(n(d0, r0)), find(n(d1, r1)))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
      val comps = parent.keys.map(find).toSeq
        .groupBy(identity).view.mapValues(_.size)
      val sizes = parent.keys.toSeq.map(find)
        .groupBy(identity).view.mapValues(_.size).values
      (t, comps.size.toLong, sizes.sum.toLong,
        if (sizes.isEmpty) null else sizes.max.toLong, kept.size.toLong)
    }
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (row, (t, nc, nr, mx, ne)) =>
      assert(row.getDouble(0) == t)
      assert(row.getLong(1) == nc, s"n_clusters at $t")
      assert(row.getLong(2) == nr, s"n_records at $t")
      assert(row.getLong(3) == mx, s"max_size at $t")
      assert(row.getLong(4) == ne, s"n_edges at $t")
    }
  }

  test("component labels, member counts, and edge support match a local union-find") {
    import spark.implicits._
    // two chains + one triangle-ish component, cross-provider node ids
    def n(dp: Int, rec: Long): Long = (dp.toLong << 40) | rec
    val raw = Seq(
      (0.90, 0, 1L, 1, 1L), (0.85, 0, 2L, 1, 1L), // chain of 3
      (0.80, 0, 5L, 1, 5L), // pair
      (0.95, 0, 7L, 1, 7L), (0.76, 0, 7L, 1, 8L), (0.88, 0, 9L, 1, 7L))
    val out = Evaluation.clusterCohesion(
        raw.toDF("sim", "dp0", "rec0", "dp1", "rec1"))
      .orderBy("component").collect()

    // local union-find oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    raw.foreach { case (_, d0, r0, d1, r1) => union(n(d0, r0), n(d1, r1)) }
    val comp = parent.keys.map(k => k -> find(k)).toMap
    val byComp = comp.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    assert(out.length == byComp.size)
    out.foreach { r =>
      val c = r.getAs[Long]("component")
      val members = byComp(c)
      assert(r.getAs[Long]("n_members") == members.size)
      assert(r.getAs[Long]("n_pairs_implied") ==
        members.size.toLong * (members.size - 1) / 2)
      val inEdges = raw.filter { case (_, d0, r0, _, _) =>
        find(n(d0, r0)) == c }
      assert(r.getAs[Long]("n_edges") == inEdges.size)
      assert(r.getAs[Double]("min_sim") == inEdges.map(_._1).min)
      assert(r.getAs[Double]("max_sim") == inEdges.map(_._1).max)
    }
  }

  test("adjustedRandIndex == exact BigInt ARI; perfect match scores 1.0") {
    import spark.implicits._
    import graft.cluster.Evaluation
    val rng = new scala.util.Random(17)
    // 200 items, 12 true clusters, prediction = truth with 15% noise
    val assign = (0 until 200).map { i =>
      val t = (i % 12).toLong
      val p = if (rng.nextDouble() < 0.15) rng.nextInt(12).toLong else t
      (p, t)
    }
    val r = Evaluation.adjustedRandIndex(
      assign.toDF("pred", "truth"), "pred", "truth").collect().head

    def comb2(x: Long) = BigInt(x) * (x - 1) / 2
    val sij = assign.groupBy(identity).values
      .map(g => comb2(g.size.toLong)).sum
    val sa = assign.groupBy(_._1).values.map(g => comb2(g.size.toLong)).sum
    val sb = assign.groupBy(_._2).values.map(g => comb2(g.size.toLong)).sum
    val c = comb2(assign.size.toLong)
    val num = 2 * (c * sij - sa * sb)
    val den = c * (sa + sb) - 2 * sa * sb
    assert(BigInt(r.getAs[Long]("s_ij")) == sij)
    assert(BigInt(r.getDecimal(5).toBigInteger) == num)
    assert(BigInt(r.getDecimal(6).toBigInteger) == den)
    assert(r.getAs[Long]("ari_scaled") ==
      (num * 1000000000L / den).toLong)
    // noisy-but-correlated prediction: well inside (0, 1)
    assert(r.getAs[Long]("ari_scaled") > 400000000L &&
      r.getAs[Long]("ari_scaled") < 1000000000L)
    // identical clusterings hit exactly scale
    val perfect = Evaluation.adjustedRandIndex(
      assign.map(t => (t._2, t._2)).toDF("pred", "truth"), "pred", "truth")
      .collect().head
    assert(perfect.getAs[Long]("ari_scaled") == 1000000000L)
  }

  test("lDiversityStats == brute-force distinct-sensitive-per-block") {
    import spark.implicits._
    import graft.ingest.Blocking
    val rng = new scala.util.Random(19)
    val rows = (0 until 300).map { i =>
      (i % 2, i.toLong, s"b${rng.nextInt(20)}", s"s${rng.nextInt(4)}")
    }
    val df = rows.toDF("dp", "entity_id", "block_key", "sens")
    val got = Blocking.lDiversityStats(df, "sens", l = 3).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toMap
    val expect = rows.groupBy(_._1).view.mapValues { g =>
      val div = g.groupBy(_._3).view
        .mapValues(_.map(_._4).distinct.size.toLong)
      (div.size.toLong, div.values.count(_ < 3).toLong,
        div.values.min, div.values.max, 3)
    }.toMap
    assert(got == expect)
  }

  test("tClosenessStats == brute-force grid TVD (absent cells included)") {
    import spark.implicits._
    import graft.ingest.Blocking
    val rng = new scala.util.Random(23)
    val rows = (0 until 400).map { i =>
      (i % 2, s"b${rng.nextInt(12)}", s"s${rng.nextInt(5)}")
    }
    val scale = 1000000L
    val tScaled = 300000L
    val got = Blocking.tClosenessStats(
        rows.toDF("dp", "block_key", "sens"), "sens", tScaled, scale)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // brute force over the FULL block x value grid (the operator's
    // algebraic collapse of absent cells must agree with it)
    val expect = rows.groupBy(_._1).view.mapValues { g =>
      val n = BigInt(g.size)
      val glob = g.groupBy(_._3).view.mapValues(x => BigInt(x.size)).toMap
      val vals = glob.keySet
      val dists = g.groupBy(_._2).values.map { b =>
        val nb = BigInt(b.size)
        val cnt = b.groupBy(_._3).view.mapValues(x => BigInt(x.size)).toMap
        val num = vals.iterator
          .map(v => (cnt.getOrElse(v, BigInt(0)) * n - glob(v) * nb).abs)
          .sum
        (num * scale / (2 * nb * n)).toLong
      }.toSeq
      (dists.size.toLong, dists.count(_ > tScaled).toLong,
        dists.min, dists.max, tScaled, scale)
    }.toMap
    assert(got == expect)
    // a uniform corpus is 0-distant from itself: one block = everything
    val self = Blocking.tClosenessStats(
      rows.map(r => (r._1, "all", r._3)).toDF("dp", "block_key", "sens"),
      "sens", tScaled, scale).collect()
    assert(self.forall(_.getAs[Long]("max_t_scaled") == 0L))
  }
}

/** Deterministic rule cascade: first-match-wins over an ordered rule
  * list, non-matching pairs dropped; verified against a local
  * re-evaluation of the same predicates. */
class RulesSpec extends SparkSpec {
  import graft.link.Rules

  private def pairs() = {
    import spark.implicits._
    Seq(
      (1L, 2L, "abc", "abc", 10, 10),  // matches r1 AND r2 -> r1 wins
      (1L, 3L, "abc", "abd", 10, 10),  // only r2 (same len)
      (2L, 3L, "xy", "zq", 2, 9),      // r3 only (sum parity)
      (4L, 5L, "aa", "bbb", 3, 5)      // matches nothing -> dropped
    ).toDF("rec0", "rec1", "t0", "t1", "v0", "v1")
  }
  private val rules = Seq(
    "r1_exact" -> (col("t0") === col("t1")),
    "r2_len" -> (col("v0") === col("v1")),
    "r3_parity" -> ((col("v0") + col("v1")) % 2 === 1))

  test("first-match-wins; non-matching pairs dropped") {
    val out = Rules.cascade(pairs(), rules)
      .select("rec0", "rec1", "matched_rule").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(out == Map((1L, 2L) -> "r1_exact", (1L, 3L) -> "r2_len",
      (2L, 3L) -> "r3_parity"))
  }

  test("cascade == local first-match evaluation (brute force)") {
    val rows = Seq(
      ("abc", "abc", 10, 10), ("abc", "abd", 10, 10), ("xy", "zq", 2, 9),
      ("aa", "bbb", 3, 4), ("q", "q", 1, 2), ("m", "n", 5, 5), ("m", "n", 5, 6))
    import spark.implicits._
    val df = rows.zipWithIndex
      .map { case ((a, b, x, y), i) => (i.toLong, i.toLong + 100, a, b, x, y) }
      .toDF("rec0", "rec1", "t0", "t1", "v0", "v1")
    val got = Rules.cascade(df, rules).select("rec0", "matched_rule")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = rows.zipWithIndex.flatMap { case ((a, b, x, y), i) =>
      val m = if (a == b) Some("r1_exact")
        else if (x == y) Some("r2_len")
        else if ((x + y) % 2 == 1) Some("r3_parity") else None
      m.map(i.toLong -> _)
    }.toMap
    assert(got == want)
  }

  test("cascadeStats counts each rule's winners only") {
    val stats = Rules.cascadeStats(pairs(), rules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("r1_exact" -> 1L, "r2_len" -> 1L, "r3_parity" -> 1L))
  }

  test("empty rule list is rejected") {
    intercept[IllegalArgumentException] { Rules.cascade(pairs(), Nil) }
  }

  test("lambdaPrior == local union-of-rule-pairs estimate (exact)") {
    import spark.implicits._
    val recs = Seq(
      (1L, "alpha", "en", 10), (2L, "alpha", "en", 10), // r1 AND r2 pair
      (3L, "alpha", "de", 11), // r1 with 1,2
      (4L, "beta", "en", 10),  // r2 with 1,2
      (5L, "gamma", "fr", 99), (6L, "delta", "fr", 99), // r2 pair only
      (7L, "omega", "zz", 1))  // matches nothing
    val df = recs.toDF("id", "key", "lang", "len").repartition(3)
    val got = Rules.lambdaPrior(df, "id",
      Seq("r1_key" -> Seq("key"), "r2_lang_len" -> Seq("lang", "len")),
      recallScaled = 8000L).collect().head
    // local brute force: union-distinct of per-rule equality pairs
    val byKey = recs.combinations(2).filter(p => p(0)._2 == p(1)._2)
    val byLL = recs.combinations(2)
      .filter(p => p(0)._3 == p(1)._3 && p(0)._4 == p(1)._4)
    val matched = (byKey ++ byLL)
      .map(p => (math.min(p(0)._1, p(1)._1), math.max(p(0)._1, p(1)._1)))
      .toSet
    val total = recs.size.toLong * (recs.size - 1) / 2
    val lam = (BigInt(matched.size) * 1000000000L * 10000L /
      (BigInt(total) * 8000L)).toLong
    assert(got.getAs[Long]("n_matched") == matched.size.toLong)
    assert(got.getAs[Long]("total_pairs") == total)
    assert(got.getAs[Long]("recall_scaled") == 8000L)
    assert(got.getAs[Long]("lambda_scaled") == lam)
  }
}
