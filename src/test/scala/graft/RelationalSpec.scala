package graft

import org.apache.spark.sql.functions._
import graft.rel.Relational

class RelationalSpec extends SparkSpec {

  test("skyline2d == brute-force dominance; ties on both objectives survive") {
    import spark.implicits._
    // deterministic pseudo-random points with deliberate x-ties and
    // exact (x, y) duplicates; 40 distinct x values force several range
    // partitions' worth of groups through the two-phase running min
    val pts = (0 until 400).map { i =>
      val x = (i * 2654435761L) % 40
      val y = (i * 40503L) % 97
      (i.toLong, x, y)
    }
    val df = pts.toDF("id", "x", "y")
    val got = Relational.skyline2d(df, "x", "y")
      .select($"id".as[Long]).collect().toSet
    val want = pts.filter { case (_, xa, ya) =>
      !pts.exists { case (_, xb, yb) =>
        xb >= xa && yb <= ya && (xb > xa || yb < ya)
      }
    }.map(_._1).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // all survivors with equal (x, y) co-survive (no strict dominance)
    val byXy = pts.filter(p => want.contains(p._1)).groupBy(p => (p._2, p._3))
    byXy.foreach { case (_, g) => assert(g.forall(p => got.contains(p._1))) }
    // strictly monotone staircase: under (max x, min y), a larger-x
    // skyline point must pay strictly MORE y, else it would dominate
    val sky = pts.filter(p => got.contains(p._1)).map(p => (p._2, p._3))
      .distinct.sortBy(_._1)
    sky.sliding(2).foreach {
      case Seq((x0, y0), (x1, y1)) => assert(x0 < x1 && y0 < y1)
      case _ => ()
    }
  }

  test("hilbertAssign == textbook xy2d; bijective; unit-step walk") {
    import spark.implicits._
    // full 256x256 grid: quantization is the identity (min=0, max=255)
    val grid = spark.range(65536L)
      .select((col("id") / 256).cast("long").as("x"),
        (col("id") % 256).cast("long").as("y"))
    val got = graft.rel.Layout.hilbertAssign(grid, "x", "y")
      .select("x", "y", "h").as[(Long, Long, Long)].collect()

    def xy2d(n: Int, xi: Int, yi: Int): Long = {
      var x = xi; var y = yi; var d = 0L; var s = n / 2
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s /= 2
      }
      d
    }
    got.foreach { case (x, y, h) =>
      assert(h == xy2d(256, x.toInt, y.toInt), s"($x,$y)")
    }
    // bijective onto [0, 65536) and every consecutive step is a unit
    // move — THE Hilbert property (Morton fails this at every
    // power-of-two boundary)
    val byH = got.sortBy(_._3)
    assert(byH.map(_._3).toSeq == (0L until 65536L))
    byH.sliding(2).foreach { case Array((x0, y0, _), (x1, y1, _)) =>
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1)
    }
  }

  test("zonemapPrunePlan == brute-force envelopes; clustered prunes") {
    import spark.implicits._
    val rows = (0L until 2000L).map(v => (v / 100, v)) // 20 sorted files
    val got = graft.rel.Layout.zonemapPrunePlan(
        rows.toDF("f", "v"), "f", "v", lo = 450L, hi = 760L)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    val expect = rows.groupBy(_._1).map { case (f, g) =>
      val vs = g.map(_._2)
      (f, vs.size.toLong, vs.min, vs.max,
        vs.min <= 760L && vs.max >= 450L)
    }.toSet
    assert(got == expect)
    // only files 4..7 overlap [450, 760]
    assert(got.filter(_._5).map(_._1) == Set(4L, 5L, 6L, 7L))
  }

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  // deterministic corpus with equal-time collisions: times land on a
  // coarse grid so left rows frequently share a timestamp with a right
  // row (the <= boundary is exercised, not just the strict case)
  private lazy val rng = new scala.util.Random(7)
  private lazy val leftRows: Seq[(Long, Long, java.sql.Timestamp)] =
    (0L until 300L).map(i => (i, rng.nextInt(5).toLong, ts(rng.nextInt(100).toLong * 10)))
  private lazy val rightRows: Seq[(Long, Long, java.sql.Timestamp)] = {
    val raw = (0L until 200L).map(j =>
      (1000L + j, rng.nextInt(5).toLong, ts(rng.nextInt(100).toLong * 10)))
    // unique per (key, time): keep the max id (the asofJoin contract)
    raw.groupBy(r => (r._2, r._3)).values.map(_.maxBy(_._1)).toSeq
  }

  private def bruteAsof(): Set[(Long, Option[Long])] =
    leftRows.map { case (lid, k, lt) =>
      val cands = rightRows.filter(r => r._2 == k && !r._3.after(lt))
      (lid, if (cands.isEmpty) None
            else Some(cands.maxBy(r => r._3.getTime)._1))
    }.toSet

  private def leftDf = {
    import spark.implicits._
    leftRows.toDF("lid", "k", "lt")
  }
  private def rightDf = {
    import spark.implicits._
    rightRows.toDF("rid", "rk", "rt")
  }

  test("asofJoin matches the brute-force latest-at-or-before oracle") {
    import spark.implicits._
    val got = Relational.asofJoin(leftDf, "k", "lt", rightDf, "rk", "rt")
      .select($"lid".as[Long], $"rid".as[Long]).collect()
      .map { case (l, r) => (l, Option(r)) }.toSet
    val want = bruteAsof().filter(_._2.isDefined)
    assert(got == want)
    assert(got.nonEmpty)
    // some left rows must be unmatched for the inner filter to matter
    assert(want.size < leftRows.size)
  }

  test("asofJoin inner=false keeps unmatched left rows with null payload") {
    import spark.implicits._
    val got = Relational.asofJoin(leftDf, "k", "lt", rightDf, "rk", "rt",
        inner = false)
      .select($"lid".as[Long], $"rid".as[Option[Long]]).collect().toSet
    assert(got == bruteAsof())
  }

  test("asofJoinBucketed == asofJoin at several bucket widths") {
    import spark.implicits._
    val base = Relational.asofJoin(leftDf, "k", "lt", rightDf, "rk", "rt")
      .select($"lid".as[Long], $"rid".as[Long]).collect().toSet
    for (b <- Seq(1L, 7L, 86400L)) {
      val got = Relational
        .asofJoinBucketed(leftDf, "k", "lt", rightDf, "rk", "rt", b)
        .select($"lid".as[Long], $"rid".as[Long]).collect().toSet
      assert(got == base, s"bucketSeconds=$b")
    }
  }

  test("profile: exact per-column stats on a crafted table") {
    import spark.implicits._
    val df = Seq(
      (Option(1L), Option("ab"), Option(1.5)),
      (Option(2L), Option.empty[String], Option(2.5)),
      (Option(2L), Option("abcd"), Option.empty[Double])
    ).toDF("k", "s", "v")
    val got = graft.rel.Profile.profile(df, Seq("k", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5)), r.getInt(6), r.getInt(7)))
      .toMap
    assert(got("k") == ((3L, 0L, 2L, Some(1.0), Some(2.0), 1, 1)))
    assert(got("s") == ((3L, 1L, 2L, None, None, 2, 4)))
    assert(got("v") == ((3L, 1L, 2L, Some(1.5), Some(2.5), 3, 3)))
  }

  test("percentile_approx (sketch path) tracks exact percentiles on events") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfTiny/events.parquet")
    val vals = ev.select($"value".as[Double]).collect().sorted
    val n = vals.length
    for (p <- Seq(0.25, 0.5, 0.9)) {
      val approx = ev.agg(
        expr(s"percentile_approx(value, $p, 10000)")).head().getDouble(0)
      // the sketch returns an actual element whose RANK is within the
      // sketch tolerance of n*p (value-distance bounds are data-dependent)
      val rank = vals.count(_ <= approx).toDouble / n
      assert(math.abs(rank - p) < 0.02,
        s"approx p$p rank off: value $approx at rank $rank")
    }
  }

  test("rangeJoin emits each qualifying pair exactly once, boundaries [lo, hi)") {
    import spark.implicits._
    val lower = -120L
    val upper = 40L
    val got = Relational.rangeJoin(leftDf, "k", "lt", rightDf, "rk", "rt",
        lower, upper)
      .select($"lid".as[Long], $"rid".as[Long]).collect().toSeq
    val want = for {
      (lid, k, lt) <- leftRows
      (rid, rk, rt) <- rightRows
      if rk == k
      d = (rt.getTime - lt.getTime) / 1000L
      if d >= lower && d < upper
    } yield (lid, rid)
    assert(got.sorted == want.sorted) // exact multiset: no dup pairs
    assert(got.nonEmpty)
    // the grid guarantees boundary hits on both edges; prove they behave
    assert(want.exists { case (lid, rid) =>
      val lt = leftRows.find(_._1 == lid).get._3
      val rt = rightRows.find(_._1 == rid).get._3
      (rt.getTime - lt.getTime) / 1000L == lower
    }, "inclusive lower boundary not exercised")
    assert(!got.exists { case (lid, rid) =>
      val lt = leftRows.find(_._1 == lid).get._3
      val rt = rightRows.find(_._1 == rid).get._3
      (rt.getTime - lt.getTime) / 1000L == upper
    }, "upper boundary must be exclusive")
  }

  // CDC changelog: (key, seq, op, v) — seq unique per key; includes keys
  // that are insert-only, update-then-delete, delete-then-reinsert, a
  // null-valued update (must NOT fall back to the snapshot value), and
  // untouched snapshot keys
  private lazy val cdcSnapshot: Seq[(Long, Option[Long])] =
    Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(30L)), (4L, Some(40L)))
  private lazy val cdcChanges: Seq[(Long, Long, String, Option[Long])] = Seq(
    (2L, 1L, "U", Some(21L)), (2L, 5L, "U", Some(22L)),   // update twice
    (3L, 2L, "D", None),                                   // delete
    (4L, 3L, "U", None),                                   // null update
    (5L, 4L, "U", Some(50L)),                              // insert
    (6L, 6L, "U", Some(60L)), (6L, 7L, "D", None),         // insert+delete
    (7L, 8L, "D", None), (7L, 9L, "U", Some(70L)))         // del, reinsert

  test("applyChanges: latest-wins merge with deletes, inserts, null updates") {
    import spark.implicits._
    val snap = cdcSnapshot.toDF("k", "v")
    val chg = cdcChanges.toDF("k", "seq", "op", "v")
    val got = Relational.applyChanges(snap, chg, "k", "seq", "op")
      .as[(Long, Option[Long])].collect().toSet
    // brute force: latest change per key, else snapshot
    val latest = cdcChanges.groupBy(_._1).view
      .mapValues(_.maxBy(_._2)).toMap
    val want = (cdcSnapshot.map(_._1) ++ cdcChanges.map(_._1)).distinct
      .flatMap { k =>
        latest.get(k) match {
          case Some((_, _, "D", _)) => None
          case Some((_, _, _, v))   => Some((k, v))
          case None => cdcSnapshot.find(_._1 == k).map(s => (k, s._2))
        }
      }.toSet
    assert(got == want)
    assert(got.contains((4L, None)), "null update must override the snapshot")
    assert(got.contains((1L, Some(10L))), "untouched key keeps snapshot row")
    assert(!got.exists(_._1 == 3L) && !got.exists(_._1 == 6L))
  }

  test("scd2: validity intervals in seq order, deletes close without opening") {
    import spark.implicits._
    val chg = cdcChanges.toDF("k", "seq", "op", "v")
    val got = Relational.scd2(chg, "k", "seq", "op")
      .select("k", "v", "eff_from", "eff_to", "is_current")
      .as[(Long, Option[Long], Long, Option[Long], Boolean)]
      .collect().toSet
    val want = cdcChanges.groupBy(_._1).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.zipWithIndex.collect {
        case ((k, seq, op, v), i) if op != "D" =>
          val to = sorted.lift(i + 1).map(_._2)
          (k, v, seq, to, to.isEmpty)
      }
    }.toSet
    assert(got == want)
    // delete-then-reinsert: key 7's reinsert is current
    assert(got.contains((7L, Some(70L), 9L, None, true)))
    // insert-then-delete: key 6's only interval is CLOSED by the delete
    assert(got.contains((6L, Some(60L), 6L, Some(7L), false)))
  }

  test("prefixSum: two-phase distributed == local cumsum; no Window node") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val data = rnd.shuffle((0L until 5000L).toList)
      .map(k => (k, rnd.nextInt(100).toLong))
    val df = data.toDF("k", "v").repartition(16)
    val res = Relational.prefixSum(df, "k", "v")
    val got = res.as[(Long, Long, Long)].collect().sortBy(_._1).toList
    var acc = 0L
    val want = data.sortBy(_._1).map { case (k, v) =>
      val b = acc; acc += v; (k, v, b)
    }
    assert(got == want)
    // the whole point: no single-partition global-order Window
    assert(!res.queryExecution.executedPlan.toString.contains("Window"),
      res.queryExecution.executedPlan.toString)
  }

  test("gridJoin: == all-pairs integer radius oracle, inclusive boundary") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val R = 1000L
    val ls = (1L to 150L).map(i =>
      (i, rnd.nextLong(20000) - 10000, rnd.nextLong(20000) - 10000))
    val rs = (1L to 150L).map(i =>
      (i, rnd.nextLong(20000) - 10000, rnd.nextLong(20000) - 10000)) ++
      // exact-boundary pair vs left point 1, plus a just-outside one
      Seq((900L, ls.head._2 + R, ls.head._3),
        (901L, ls.head._2 + R + 1, ls.head._3))
    val got = graft.rel.Spatial.gridJoin(
        ls.toDF("lid", "lat", "lon"), "lid",
        rs.toDF("rid", "lat", "lon"), "rid", "lat", "lon", R)
      .select($"lid".as[Long], $"rid".as[Long], $"dist2".as[Long])
      .collect().toSet
    val want = (for {
      (li, la, lo) <- ls; (ri, ra, ro) <- rs
      d2 = (la - ra) * (la - ra) + (lo - ro) * (lo - ro)
      if d2 <= R * R
    } yield (li, ri, d2)).toSet
    assert(got == want)
    assert(got.contains((1L, 900L, R * R)), "inclusive boundary")
    assert(!got.exists(t => t._2 == 901L && t._1 == 1L), "exclusive beyond")
    assert(want.nonEmpty)
  }

  test("compactionPlan: running-offset bin packing, oversize file isolated") {
    import spark.implicits._
    val files = Seq((1L, 60L), (2L, 60L), (3L, 250L), (4L, 10L), (5L, 95L))
      .toDF("fid", "sz")
    val got = graft.rel.Layout.compactionPlan(files, "fid", "sz", 100L)
      .select($"file_id".as[Long], $"size".as[Long], $"start_off".as[Long],
        $"out_group".as[Long]).collect().sortBy(_._1)
    // offsets: 0, 60, 120, 370, 380 -> groups 0, 0, 1, 3, 3
    assert(got.toList == List((1L, 60L, 0L, 0L), (2L, 60L, 60L, 0L),
      (3L, 250L, 120L, 1L), (4L, 10L, 370L, 3L), (5L, 95L, 380L, 3L)))
  }

  test("drift: injected null/cardinality shifts flag, stable columns don't") {
    import spark.implicits._
    val old = (0L until 100L).map(i => (i, s"v$i", s"t${i % 5}"))
      .toDF("id", "a", "b")
    // new snapshot: 'a' nulled 30%, 'b' collapsed to one value, id stable
    val neu = (0L until 100L).map(i =>
        (i, if (i % 10 < 3) None else Some(s"v$i"), "t0"))
      .toDF("id", "a", "b")
    val got = graft.rel.Profile.drift(old, neu, Seq("id", "a", "b"))
      .select($"column".as[String], $"null_drift".as[Boolean],
        $"cardinality_drift".as[Boolean]).collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got("id") == ((false, false)))
    assert(got("a")._1, "null jump on 'a' must flag")
    assert(got("b")._2, "cardinality collapse on 'b' must flag")
  }

  test("rendezvousAssign == local md5 argmax; reshard moves only onto the new shard") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keys = (0L until 500L)
    val df = keys.toDF("k")
    def local(n: Int)(k: Long): Int =
      (0 until n).maxBy(s => (md5hex(s"$k#$s"), s))
    val got4 = graft.rel.Layout.rendezvousAssign(df, "k", 4)
      .select($"k".as[Long], $"shard".as[Int]).collect().toMap
    assert(keys.forall(k => got4(k) == local(4)(k)))
    // movement audit: everything off-diagonal flows into shard 4 only
    val mv = graft.rel.Layout.reshardMovement(df, "k", 4, 5)
      .select($"shard_before".as[Int], $"shard_after".as[Int],
        $"n_keys".as[Long]).collect()
    assert(mv.forall { case (b, a, _) => a == b || a == 4 })
    val moved = mv.filter { case (b, a, _) => a != b }.map(_._3).sum
    assert(moved > 0 && moved < 500 * 2 / 5, s"moved $moved of 500")
    assert(mv.map(_._3).sum == 500)
  }

  test("morton16 == transparent per-bit formula; zorder buckets are 16x16 rectangles") {
    import spark.implicits._
    // kernel vs the per-bit definition on the full 8-bit plane corners +
    // a random sample
    def mortonRef(x: Int, y: Int): Int =
      (0 until 8).map(i => (((x >> i) & 1) << (2 * i + 1)) |
        (((y >> i) & 1) << (2 * i))).sum
    val rnd = new scala.util.Random(7)
    val pts = Seq((0, 0), (255, 255), (255, 0), (0, 255), (1, 2)) ++
      Seq.fill(500)((rnd.nextInt(256), rnd.nextInt(256)))
    pts.foreach { case (x, y) =>
      assert(graft.core.BitOps.morton16(x, y) == mortonRef(x, y), s"($x,$y)")
    }
    // locality contract: with bucketBits=8 each bucket fixes the top 4
    // bits of qx and qy, so every bucket envelope is a 16x16 rectangle
    val df = (0L until 4000L).map(i => (i * 37 % 1000, i * 91 % 517))
      .toDF("x", "y")
    val st = graft.rel.Layout.zorderStats(df, "x", "y", bucketBits = 8)
      .as[(Int, Long, Int, Int, Int, Int)].collect()
    assert(st.nonEmpty && st.map(_._2).sum == 4000L)
    st.foreach { case (b, _, x0, x1, y0, y1) =>
      assert(x1 - x0 <= 15 && y1 - y0 <= 15, s"bucket $b envelope too wide")
      assert(x0 / 16 == x1 / 16 && y0 / 16 == y1 / 16,
        s"bucket $b crosses a 16-cell boundary")
    }
  }

  test("bloomSemiJoin == exact semi join; empty build side; prefilter prunes") {
    import spark.implicits._
    val big = (0L until 5000L).map(i => (i, i % 97)).toDF("id", "key")
    val small = (0L until 10L).map(k => k).toDF("skey")
    val got = Relational.bloomSemiJoin(big, "key", small, "skey")
      .select($"id").as[Long].collect().toSet
    val want = big.where($"key" < 10).select($"id").as[Long].collect().toSet
    assert(got == want && want.nonEmpty)
    // empty build side -> empty result, no crash
    assert(Relational.bloomSemiJoin(big, "key",
      small.where(lit(false)), "skey").count() == 0)
    // the probe expression itself prunes: build the same filter directly
    // and check pass-through is close to selectivity (10/97 + fpp)
    val n = 10L; val bpk = 10
    val m = ((n * bpk + 63) / 64) * 64
    val k = math.round(bpk * math.log(2)).toInt
    val bits = new Array[Long]((m / 64).toInt)
    // rebuild via the Spark-side hash to stay consistent with the probe
    val hs = small.select(xxhash64($"skey").as[Long]).collect()
    hs.foreach { h =>
      val ps = graft.core.BloomOps.positions(h, k, m)
      (0 until k).foreach { i =>
        val p = ps.getLong(i); bits((p >>> 6).toInt) |= 1L << (p & 63L).toInt
      }
    }
    val passed = big.where(graft.expr.bloomMightContain(
      xxhash64($"key"), bits, k, m)).count()
    val members = want.size.toLong
    assert(passed >= members, "bloom dropped a true member")
    assert(passed <= members + (5000 - members) / 10,
      s"prefilter barely prunes: $passed passed vs $members members")
  }

  test("resampleLocf: == local LOCF oracle; same-second ties; lone-obs key") {
    import spark.implicits._
    val step = 10L
    // key 1: gaps + a same-second duplicate (max wins); key 2: single
    // observation off-grid (no grid point in span -> no rows); key 3:
    // observation exactly on a grid point (obs sorts before grid tag)
    val rows = Seq(
      (1L, 3L, 5.0), (1L, 3L, 7.0), (1L, 17L, 1.5), (1L, 41L, 2.5),
      (2L, 15L, 9.0),
      (3L, 20L, 4.0), (3L, 35L, 6.0))
    val df = rows.toDF("k", "t", "v")
    val got = graft.rel.Relational.resampleLocf(df, "k", "t", "v", step)
      .select($"k".as[Long], $"grid_t".as[Long], $"v".as[Double])
      .collect().toSet
    // local oracle: dedup to max per (k,t), grid = multiples of step in
    // [min, max], value = latest obs <= grid point
    val obs = rows.groupBy(r => (r._1, r._2)).map { case ((k, t), g) =>
      (k, t, g.map(_._3).max) }.toSeq
    val want = obs.groupBy(_._1).flatMap { case (k, os) =>
      val ts = os.map(_._2)
      val gs = ((ts.min + step - 1) / step) * step
      val ge = (ts.max / step) * step
      (gs to ge by step).map { g =>
        val (_, _, v) = os.filter(_._2 <= g).maxBy(_._2)
        (k, g, v)
      }
    }.toSet
    assert(got == want)
    assert(got.contains((1L, 10L, 7.0)), "same-second max must win")
    assert(got.contains((3L, 20L, 4.0)), "on-grid observation is its own fill")
    assert(!got.exists(_._1 == 2L), "span without grid points emits nothing")
    // partition invariance
    val got2 = graft.rel.Relational.resampleLocf(df.repartition(7), "k", "t", "v", step)
      .select($"k".as[Long], $"grid_t".as[Long], $"v".as[Double])
      .collect().toSet
    assert(got2 == got)
  }
}
