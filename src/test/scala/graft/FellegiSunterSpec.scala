package graft

import graft.link.FellegiSunter
import org.apache.spark.sql.functions.{col, split}

class FellegiSunterSpec extends SparkSpec {

  /** Independent EM reimplementation: same math, structurally different —
    * posteriors/params as BigInt rationals carried explicitly, patterns
    * processed via functional folds rather than the while-loop
    * accumulator form in the library. */
  private def referenceEm(counts: Seq[(Seq[Int], Long)], iters: Int,
      scale: Long): (Long, Seq[Long], Seq[Long], Seq[Long]) = {
    val S = BigInt(scale)
    val K = counts.head._1.size
    def clamp(x: BigInt) = x.max(1).min(S - 1).toLong
    def post(lam: Long, m: Seq[Long], u: Seq[Long])(g: Seq[Int]): Long = {
      val a = g.zipWithIndex.foldLeft(BigInt(lam)) { case (acc, (gi, k)) =>
        acc * (if (gi == 1) BigInt(m(k)) else S - BigInt(m(k))) / S
      }
      val b = g.zipWithIndex.foldLeft(S - BigInt(lam)) { case (acc, (gi, k)) =>
        acc * (if (gi == 1) BigInt(u(k)) else S - BigInt(u(k))) / S
      }
      if (a + b == 0) 0L else (a * S / (a + b)).toLong
    }
    var (lam, m, u) = (scale / 10, Seq.fill(K)(scale * 9 / 10),
      Seq.fill(K)(scale / 10))
    for (_ <- 1 to iters) {
      val w = counts.map { case (g, _) => post(lam, m, u)(g) }
      val cw = counts.zip(w).map { case ((_, c), wi) => BigInt(c) * wi }
      val cv = counts.zip(w).map { case ((_, c), wi) =>
        BigInt(c) * (S - wi) }
      val sumCW = cw.sum
      val sumCV = cv.sum
      lam = clamp(sumCW / counts.map(c => BigInt(c._2)).sum)
      m = (0 until K).map { k =>
        val num = counts.indices.filter(i => counts(i)._1(k) == 1)
          .map(cw).sum
        clamp(if (sumCW == 0) BigInt(0) else num * S / sumCW)
      }
      u = (0 until K).map { k =>
        val num = counts.indices.filter(i => counts(i)._1(k) == 1)
          .map(cv).sum
        clamp(if (sumCV == 0) BigInt(0) else num * S / sumCV)
      }
    }
    (lam, m, u, counts.map { case (g, _) => post(lam, m, u)(g) })
  }

  private val scale = FellegiSunter.Scale

  test("emClassify == independent EM reimplementation on a mixed corpus") {
    import spark.implicits._
    // 60 dup pairs (mostly-agreeing patterns) + 400 random pairs
    val rnd = new scala.util.Random(7)
    val dup = Seq.fill(60)((1, if (rnd.nextInt(10) < 9) 1 else 0,
      if (rnd.nextInt(10) < 8) 1 else 0))
    val non = Seq.fill(400)((if (rnd.nextInt(10) < 1) 1 else 0,
      if (rnd.nextInt(10) < 2) 1 else 0, if (rnd.nextInt(10) < 1) 1 else 0))
    val pairs = (dup ++ non).toDF("g_a", "g_b", "g_c")
      .repartition(8) // partitioning must not change anything
    val got = FellegiSunter
      .emClassify(pairs, Seq("g_a", "g_b", "g_c"), iters = 3)
      .orderBy("g_a", "g_b", "g_c")
      .collect()

    val counts = (dup ++ non)
      .groupBy(identity).map { case (g, v) =>
        (Seq(g._1, g._2, g._3), v.size.toLong) }
      .toSeq.sortBy(_._1.mkString)
    val (lam, m, u, posts) = referenceEm(counts, 3, scale)
    val expect = counts.zip(posts).sortBy(_._1._1.mkString("", ",", ""))

    assert(got.length == counts.size)
    got.foreach { r =>
      val g = Seq(r.getInt(0), r.getInt(1), r.getInt(2))
      val i = counts.indexWhere(_._1 == g)
      assert(i >= 0, s"pattern $g missing from reference")
      assert(r.getAs[Long]("n_pairs") == counts(i)._2)
      assert(r.getAs[Long]("posterior") == posts(i), s"posterior @ $g")
      assert(r.getAs[Long]("lambda") == lam)
      assert(r.getAs[Long]("m_g_a") == m(0) && r.getAs[Long]("m_g_b") == m(1)
        && r.getAs[Long]("m_g_c") == m(2))
      assert(r.getAs[Long]("u_g_a") == u(0) && r.getAs[Long]("u_g_b") == u(1)
        && r.getAs[Long]("u_g_c") == u(2))
      assert(r.getAs[Boolean]("is_match") ==
        (r.getAs[Long]("posterior") * 2 > scale))
    }
  }

  test("emTrace: row i == final params of an i-iteration fit; last == fit") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dup = Seq.fill(50)((1, if (rnd.nextInt(10) < 9) 1 else 0,
      if (rnd.nextInt(10) < 8) 1 else 0))
    val non = Seq.fill(300)((if (rnd.nextInt(10) < 1) 1 else 0,
      if (rnd.nextInt(10) < 2) 1 else 0, if (rnd.nextInt(10) < 1) 1 else 0))
    val pairs = (dup ++ non).toDF("g_a", "g_b", "g_c").repartition(6)
    val gcols = Seq("g_a", "g_b", "g_c")
    val trace = FellegiSunter.emTrace(pairs, gcols, iters = 3)
      .orderBy("iter").collect()
    assert(trace.map(_.getAs[Int]("iter")).toSeq == Seq(1, 2, 3))
    // prefix property: iteration i's row equals an i-iter fit's params
    (1 to 3).foreach { i =>
      val fit = FellegiSunter.emClassify(pairs, gcols, iters = i)
        .collect().head
      val row = trace(i - 1)
      assert(row.getAs[Long]("lambda") == fit.getAs[Long]("lambda"), s"λ @ $i")
      gcols.foreach { c =>
        assert(row.getAs[Long](s"m_$c") == fit.getAs[Long](s"m_$c"), s"m @ $i")
        assert(row.getAs[Long](s"u_$c") == fit.getAs[Long](s"u_$c"), s"u @ $i")
      }
    }
    // the trajectory actually moves (iteration 1 != iteration 3)
    assert(trace(0).getAs[Long]("lambda") != trace(2).getAs[Long]("lambda"))
  }

  test("emClassifyFixedU == independent fixed-u EM; u echoes frozen values") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val dup = Seq.fill(45)((1, if (rnd.nextInt(10) < 9) 1 else 0,
      if (rnd.nextInt(10) < 8) 1 else 0))
    val non = Seq.fill(350)((if (rnd.nextInt(10) < 1) 1 else 0,
      if (rnd.nextInt(10) < 2) 1 else 0, if (rnd.nextInt(10) < 1) 1 else 0))
    val pairs = (dup ++ non).toDF("g_a", "g_b", "g_c").repartition(7)
    val gcols = Seq("g_a", "g_b", "g_c")
    val frozen = Seq(123456789L, 87654321L, 0L) // 0 must clamp to 1
    val got = FellegiSunter
      .emClassifyFixedU(pairs, gcols, frozen, iters = 3)
      .orderBy("g_a", "g_b", "g_c").collect()
    // independent reimplementation with frozen u (functional folds)
    val S = BigInt(scale)
    def clamp(x: BigInt) = x.max(1).min(S - 1).toLong
    val u = frozen.map(v => clamp(BigInt(v)))
    val counts = (dup ++ non).groupBy(identity)
      .map { case (g, v) => (Seq(g._1, g._2, g._3), v.size.toLong) }
      .toSeq.sortBy(_._1.mkString(","))
    def post(lam: Long, m: Seq[Long])(g: Seq[Int]): Long = {
      val a = g.zipWithIndex.foldLeft(BigInt(lam)) { case (acc, (gi, k)) =>
        acc * (if (gi == 1) BigInt(m(k)) else S - BigInt(m(k))) / S }
      val b = g.zipWithIndex.foldLeft(S - BigInt(lam)) { case (acc, (gi, k)) =>
        acc * (if (gi == 1) BigInt(u(k)) else S - BigInt(u(k))) / S }
      if (a + b == 0) 0L else (a * S / (a + b)).toLong
    }
    var (lam, m) = (scale / 10, Seq.fill(3)(scale * 9 / 10))
    for (_ <- 1 to 3) {
      val w = counts.map { case (g, _) => post(lam, m)(g) }
      val cw = counts.zip(w).map { case ((_, c), wi) => BigInt(c) * wi }
      val sumCW = cw.sum
      lam = clamp(sumCW / counts.map(c => BigInt(c._2)).sum)
      m = (0 until 3).map { k =>
        val num = counts.indices.filter(i => counts(i)._1(k) == 1)
          .map(cw).sum
        clamp(if (sumCW == 0) BigInt(0) else num * S / sumCW)
      }
    }
    val posts = counts.map { case (g, _) => post(lam, m)(g) }
    assert(got.length == counts.size)
    got.zip(counts.zip(posts)).foreach { case (r, ((g, c), w)) =>
      assert(Seq(r.getInt(0), r.getInt(1), r.getInt(2)) == g)
      assert(r.getAs[Long]("n_pairs") == c)
      assert(r.getAs[Long]("posterior") == w, s"posterior @ $g")
      assert(r.getAs[Long]("lambda") == lam)
      gcols.zipWithIndex.foreach { case (cn, k) =>
        assert(r.getAs[Long](s"m_$cn") == m(k))
        assert(r.getAs[Long](s"u_$cn") == u(k), "frozen u echoed")
      }
    }
  }

  test("modelPrCurve == local BigInt cumulative sums over the fitted patterns") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val dup = Seq.fill(40)((1, if (rnd.nextInt(10) < 9) 1 else 0,
      if (rnd.nextInt(10) < 8) 1 else 0))
    val non = Seq.fill(250)((if (rnd.nextInt(10) < 1) 1 else 0,
      if (rnd.nextInt(10) < 2) 1 else 0, if (rnd.nextInt(10) < 1) 1 else 0))
    val pairs = (dup ++ non).toDF("g_a", "g_b", "g_c").repartition(5)
    val gcols = Seq("g_a", "g_b", "g_c")
    val fit = FellegiSunter.emClassify(pairs, gcols, iters = 2).collect()
      .map(r => (r.getAs[Long]("posterior"), r.getAs[Long]("n_pairs")))
    val byw = fit.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(-_._1)
    val S = BigInt(scale)
    val totTp = byw.map { case (w, n) => BigInt(n) * w }.sum
    var tp = BigInt(0); var fp = BigInt(0)
    val want = byw.map { case (w, n) =>
      tp += BigInt(n) * w; fp += BigInt(n) * (S - w)
      (w, n, tp.toLong, fp.toLong, totTp.toLong)
    }
    val got = FellegiSunter.modelPrCurve(pairs, gcols, iters = 2)
      .orderBy(org.apache.spark.sql.functions.desc("posterior")).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (r, (w, n, etp, efp, tot)) =>
      assert(r.getAs[Long]("posterior") == w)
      assert(r.getAs[Long]("n_pairs") == n)
      assert(r.getAs[Long]("exp_tp_scaled") == etp)
      assert(r.getAs[Long]("exp_fp_scaled") == efp)
      assert(r.getAs[Long]("exp_matches_scaled") == tot)
      assert(math.abs(r.getAs[Double]("precision") -
        math.rint(etp.toDouble / (etp + efp) * 1e6) / 1e6) < 1e-12)
      assert(math.abs(r.getAs[Double]("recall") -
        math.rint(etp.toDouble / tot * 1e6) / 1e6) < 1e-12)
    }
    // precision falls and recall rises as the cut loosens
    val precs = got.map(_.getAs[Double]("precision")).toSeq
    val recs = got.map(_.getAs[Double]("recall")).toSeq
    assert(recs == recs.sorted)
    assert(precs.head >= precs.last)
  }

  test("patternIndependence == local BigInt marginal products; lift caps") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(500)((if (rnd.nextInt(4) == 0) 1 else 0,
      if (rnd.nextInt(3) == 0) 1 else 0, if (rnd.nextInt(5) == 0) 1 else 0))
    val pairs = rows.toDF("g_a", "g_b", "g_c").repartition(4)
    val gcols = Seq("g_a", "g_b", "g_c")
    val got = FellegiSunter.patternIndependence(pairs, gcols)
      .collect()
      .map(r => Seq(r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("expected_scaled"),
          r.getAs[Long]("lift_scaled"))).toMap
    val counts = rows.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val n = BigInt(rows.size)
    val S = BigInt(scale)
    val ones = (0 until 3).map(k => BigInt(rows.count(r =>
      k match { case 0 => r._1 == 1; case 1 => r._2 == 1; case _ => r._3 == 1 })))
    assert(got.size == counts.size)
    counts.foreach { case (g, c) =>
      val gs = Seq(g._1, g._2, g._3)
      val prod = (0 until 3).map(k =>
        if (gs(k) == 1) ones(k) else n - ones(k)).product
      val expected = (prod * S / n.pow(2)).toLong
      val lift = if (prod == 0) 0L
        else (BigInt(c) * S * n.pow(2) / prod).min(S * 1000000L).toLong
      val (gn, ge, gl) = got(gs)
      assert(gn == c && ge == expected && gl == lift, s"pattern $gs")
    }
  }

  test("EM separates planted duplicates: m>u per field, posterior ordering") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dup = Seq.fill(80)((1, 1, if (rnd.nextInt(4) < 3) 1 else 0))
    val non = Seq.fill(800)((if (rnd.nextInt(20) == 0) 1 else 0,
      if (rnd.nextInt(10) == 0) 1 else 0, if (rnd.nextInt(8) == 0) 1 else 0))
    val out = FellegiSunter.emClassify(
      (dup ++ non).toDF("g_a", "g_b", "g_c"), Seq("g_a", "g_b", "g_c"),
      iters = 4).collect()
    val r0 = out.head
    Seq("a", "b", "c").foreach { f =>
      assert(r0.getAs[Long](s"m_g_$f") > r0.getAs[Long](s"u_g_$f"),
        s"m > u for $f")
    }
    // all-agree pattern must classify as match, all-disagree as non-match
    val byG = out.map(r => (Seq(r.getInt(0), r.getInt(1), r.getInt(2)),
      r.getAs[Long]("posterior"))).toMap
    assert(byG(Seq(1, 1, 1)) * 2 > scale)
    assert(byG(Seq(0, 0, 0)) * 2 < scale)
    // posterior is monotone when adding agreements on informative fields
    assert(byG(Seq(1, 1, 1)) > byG(Seq(0, 0, 0)))
  }

  test("emClassifyLevels == independent level-EM reimplementation") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    // dups: mostly level-2 name, level-2 size; non: mostly level 0
    val dup = Seq.fill(70)((2 - rnd.nextInt(10) / 9, 2 - rnd.nextInt(10) / 8))
    val non = Seq.fill(600)((rnd.nextInt(10) / 8, rnd.nextInt(10) / 7))
    val pairs = (dup ++ non).toDF("g_a", "g_b").repartition(6)
    val got = FellegiSunter
      .emClassifyLevels(pairs, Seq(("g_a", 3), ("g_b", 3)), iters = 3)
      .collect()

    // independent reimplementation: BigInt rationals, functional folds
    val S = BigInt(scale)
    val counts = (dup ++ non).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .map { case (g, c) => (Seq(g._1, g._2), c) }
      .sortBy(_._1.mkString)
    def clamp(x: BigInt) = x.max(1).min(S - 1).toLong
    var lam = scale / 10
    var m = Seq(Seq(150000000L, 150000000L, 700000000L),
      Seq(150000000L, 150000000L, 700000000L))
    var u = Seq(Seq(700000000L, 150000000L, 150000000L),
      Seq(700000000L, 150000000L, 150000000L))
    def post(g: Seq[Int]): Long = {
      val a = g.zipWithIndex.foldLeft(BigInt(lam)) { case (acc, (gi, k)) =>
        acc * m(k)(gi) / S }
      val b = g.zipWithIndex.foldLeft(S - BigInt(lam)) { case (acc, (gi, k)) =>
        acc * u(k)(gi) / S }
      if (a + b == 0) 0L else (a * S / (a + b)).toLong
    }
    for (_ <- 1 to 3) {
      val w = counts.map { case (g, _) => post(g) }
      val cw = counts.zip(w).map { case ((_, c), wi) => BigInt(c) * wi }
      val cv = counts.zip(w).map { case ((_, c), wi) => BigInt(c) * (S - wi) }
      val (sw, sv) = (cw.sum, cv.sum)
      lam = clamp(sw / counts.map(c => BigInt(c._2)).sum)
      m = (0 until 2).map(k => (0 until 3).map(lv =>
        clamp(counts.indices.filter(i => counts(i)._1(k) == lv)
          .map(cw).sum * S / sw)).toSeq).toSeq
      u = (0 until 2).map(k => (0 until 3).map(lv =>
        clamp(counts.indices.filter(i => counts(i)._1(k) == lv)
          .map(cv).sum * S / sv)).toSeq).toSeq
    }
    assert(got.length == counts.size)
    got.foreach { r =>
      val g = Seq(r.getInt(0), r.getInt(1))
      val i = counts.indexWhere(_._1 == g)
      assert(r.getAs[Long]("posterior") == post(g), s"posterior @ $g")
      assert(r.getAs[Long]("lambda") == lam)
      (0 until 3).foreach { lv =>
        assert(r.getAs[Long](s"m_g_a_$lv") == m(0)(lv))
        assert(r.getAs[Long](s"u_g_b_$lv") == u(1)(lv))
      }
    }
    // levels informative: the all-level-2 pattern beats all-level-0
    val byG = got.map(r => (Seq(r.getInt(0), r.getInt(1)),
      r.getAs[Long]("posterior"))).toMap
    assert(byG(Seq(2, 2)) > byG(Seq(0, 0)))
  }

  test("emClassify == reference across 25 random seeded pattern tables") {
    import spark.implicits._
    val rnd = new scala.util.Random(101)
    for (case_ <- 1 to 25) {
      val k = 1 + rnd.nextInt(3)
      val nPat = 1 + rnd.nextInt((1 << k))
      val pats = rnd.shuffle((0 until (1 << k)).toList).take(nPat)
      val rows = pats.flatMap { p =>
        val g = (0 until k).map(b => (p >> b) & 1)
        Seq.fill(1 + rnd.nextInt(40))(g)
      }
      val cols = (0 until k).map(i => s"g$i")
      val df = rows.map(g => (g :+ 0).mkString(","))
        .toDF("s")
        .select((0 until k).map(i =>
          split(col("s"), ",").getItem(i).cast("int").as(s"g$i")): _*)
      val iters = 1 + rnd.nextInt(3)
      val got = FellegiSunter.emClassify(df, cols, iters).collect()
      val counts = rows.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq
        .map { case (g, c) => (g, c) }.sortBy(_._1.mkString)
      val (lam, m, u, posts) = referenceEm(counts, iters, scale)
      assert(got.length == counts.size, s"case $case_")
      got.foreach { r =>
        val g = (0 until k).map(r.getInt)
        val i = counts.indexWhere(_._1 == g)
        assert(i >= 0 && r.getAs[Long]("posterior") == posts(i) &&
          r.getAs[Long]("lambda") == lam &&
          (0 until k).forall(kk => r.getAs[Long](s"m_g$kk") == m(kk) &&
            r.getAs[Long](s"u_g$kk") == u(kk)),
          s"case $case_ pattern $g mismatch")
      }
    }
  }

  test("determinism: same input twice, any partitioning → identical rows") {
    import spark.implicits._
    val data = Seq.tabulate(300)(i => (i % 2, (i / 2) % 2, (i / 4) % 2))
    def run(parts: Int) = FellegiSunter
      .emClassify(data.toDF("x", "y", "z").repartition(parts),
        Seq("x", "y", "z"), iters = 2)
      .orderBy("x", "y", "z").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }

  test("estimateU: agreement rates as exact scaled quotients; nulls count 0") {
    import spark.implicits._
    val S = FellegiSunter.Scale
    val pairs = Seq[(Integer, Integer)](
      (1, 1), (1, 0), (0, 1), (0, 0), (1, null), (null, null), (0, 1))
      .toDF("gx", "gy")
    val out = FellegiSunter.estimateU(pairs, Seq("gx", "gy"))
      .orderBy("field").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("gx") == ((7L, 3L, BigInt(3) * S / 7)))
    assert(out("gy") == ((7L, 3L, BigInt(3) * S / 7)))
  }

  test("estimateMFromLabels: m = intra-label agreement rate, exact quotient") {
    import spark.implicits._
    val S = FellegiSunter.Scale
    // 5 intra-label pairs: gx agrees on 4, gy on 1, null counts as 0
    val pairs = Seq[(Integer, Integer)](
      (1, 1), (1, 0), (1, 0), (1, null), (0, 0))
      .toDF("gx", "gy")
    val out = FellegiSunter.estimateMFromLabels(pairs, Seq("gx", "gy"))
      .orderBy("field").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("gx") == ((5L, 4L, BigInt(4) * S / 5)))
    assert(out("gy") == ((5L, 1L, BigInt(1) * S / 5)))
  }

  test("uncertaintySample: k pairs nearest posterior 1/2, id tie-break") {
    import spark.implicits._
    val S = FellegiSunter.Scale
    // pattern mix strong enough for EM to separate: ids encode pattern
    val data = Seq.tabulate(240)(i =>
      (i.toLong, (i + 1000).toLong, i % 2, (i / 2) % 2))
    val pairs = data.toDF("id0", "id1", "gx", "gy")
    val got = FellegiSunter.uncertaintySample(pairs, Seq("gx", "gy"),
      Seq("id0", "id1"), k = 7).collect()
    assert(got.length == 7)
    // replicate: classify patterns, join, order
    val fit = FellegiSunter.emClassify(
        pairs.select("gx", "gy"), Seq("gx", "gy"), iters = 2)
      .select($"gx".as[Int], $"gy".as[Int], $"posterior".as[Long])
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val want = data
      .map { case (a, b, gx, gy) =>
        (math.abs(fit((gx, gy)) - S / 2), a, b, gx, gy) }
      .sorted.take(7)
    val gotT = got.map(r => (r.getAs[Long]("uncertainty"),
      r.getAs[Long]("id0"), r.getAs[Long]("id1"),
      r.getAs[Int]("gx"), r.getAs[Int]("gy"))).toSeq
    assert(gotT == want.toSeq)
    // selected pairs carry the pattern posterior
    got.foreach(r => assert(
      r.getAs[Long]("posterior") ==
        fit((r.getAs[Int]("gx"), r.getAs[Int]("gy")))))
  }

  test("waterfall: factors select m/u by gamma; refold reproduces posterior") {
    import spark.implicits._
    val S = FellegiSunter.Scale
    val data = Seq.tabulate(300)(i => (i % 2, (i / 2) % 2, (i / 4) % 2))
    val df = data.toDF("x", "y", "z")
    val cols = Seq("x", "y", "z")
    val fit = FellegiSunter.emClassify(df, cols, iters = 2)
      .orderBy("x", "y", "z").collect()
    val wf = FellegiSunter.waterfall(df, cols, iters = 2)
      .orderBy("x", "y", "z", "field").collect()
    assert(wf.length == fit.length * cols.size)
    // per-pattern: the 3 waterfall rows carry exactly the fitted m/u
    // choice, the exact integer bayes factor, and refold to the posterior
    val byPat = wf.groupBy(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    fit.foreach { fr =>
      val g = (fr.getInt(0), fr.getInt(1), fr.getInt(2))
      val rows = byPat(g).sortBy(_.getAs[String]("field"))
      val lambda = fr.getAs[Long]("lambda")
      var a = BigInt(lambda)
      var b = BigInt(S - lambda)
      cols.zip(rows).zip(Seq(g._1, g._2, g._3)).foreach {
        case ((c, r), gi) =>
          val m = fr.getAs[Long](s"m_$c")
          val u = fr.getAs[Long](s"u_$c")
          val fm = r.getAs[Long]("f_m")
          val fu = r.getAs[Long]("f_u")
          assert(r.getAs[String]("field") == c)
          assert(fm == (if (gi == 1) m else S - m))
          assert(fu == (if (gi == 1) u else S - u))
          assert(r.getAs[Long]("bayes_scaled") == BigInt(fm) * S / fu)
          assert(r.getAs[Long]("posterior") == fr.getAs[Long]("posterior"))
          a = a * fm / S
          b = b * fu / S
      }
      assert((a * S / (a + b)).toLong == fr.getAs[Long]("posterior"),
        s"refold mismatch at $g")
    }
  }

  test("tfAdjustedPosteriors == local BigInt refold from the fitted params") {
    import spark.implicits._
    val S = FellegiSunter.Scale
    // synthetic pairs: 2 gammas, the tf field is "y" with a value column
    // skewed so "common" dominates the record population
    val records = (Seq.fill(60)("common") ++ Seq.fill(8)("rare") ++
      Seq.fill(32)("mid")).toDF("v")
    val pairs = Seq.tabulate(400) { i =>
      val gx = if (i % 3 == 0) 1 else 0
      val gy = if (i % 4 != 3) 1 else 0
      val v = if (gy == 0) null
        else if (i % 10 < 7) "common" else if (i % 10 == 7) "rare" else "mid"
      (gx, gy, v)
    }.toDF("gx", "gy", "v")
    val got = FellegiSunter.tfAdjustedPosteriors(pairs, Seq("gx", "gy"),
        "gy", "v", records, "v", iters = 2)
      .orderBy("gx", "gy", "tf_val").collect()

    // fitted params from the separately-spec'd emClassify
    val fit = FellegiSunter.emClassify(pairs.select(col("gx"), col("gy")),
      Seq("gx", "gy"), iters = 2).collect()
    val lam = fit.head.getAs[Long]("lambda")
    val m = Seq("gx", "gy").map(c => fit.head.getAs[Long](s"m_$c"))
    val u = Seq("gx", "gy").map(c => fit.head.getAs[Long](s"u_$c"))
    val nRec = 100L
    val tfOf = Map("common" -> 60L, "rare" -> 8L, "mid" -> 32L)
      .map { case (k, n) => k -> math.max(1L, n * S / nRec) }
    def refold(g: Seq[Int], tfVal: Option[String]): Long = {
      val B = BigInt(S)
      var num = BigInt(lam); var den = B - BigInt(lam)
      Seq(0, 1).foreach { k =>
        num = num * (if (g(k) == 1) BigInt(m(k)) else B - BigInt(m(k))) / B
        val uk =
          if (k == 1 && g(k) == 1)
            BigInt(math.max(1L, math.min(S - 1, tfOf(tfVal.get))))
          else if (g(k) == 1) BigInt(u(k))
          else B - BigInt(u(k))
        den = den * uk / B
      }
      (num * B / (num + den).max(1)).toLong
    }
    assert(got.nonEmpty && got.exists(_.getAs[String]("tf_val") == "rare"))
    got.foreach { r =>
      val g = Seq(r.getAs[Int]("gx"), r.getAs[Int]("gy"))
      val tfVal = Option(r.getAs[String]("tf_val"))
      assert(r.getAs[Long]("posterior_adj") == refold(g, tfVal),
        s"pattern $g value $tfVal")
    }
    // rare-value agreement must outrank common-value agreement at the
    // same pattern (the point of the adjustment)
    val byVal = got.filter(r => r.getAs[Int]("gx") == 1 && r.getAs[Int]("gy") == 1)
      .map(r => r.getAs[String]("tf_val") -> r.getAs[Long]("posterior_adj")).toMap
    assert(byVal("rare") > byVal("common"))
  }
}
