package graft

import org.apache.spark.sql.functions._
import graft.rel.Sketches

/** Brute-force equality gates for the exact-replay sketches: the Spark
  * plans must reproduce, bit-for-bit, a local reimplementation of the
  * md5-derived hash, the bottom-k / register / cell states, and the
  * floored-integer estimates — plus the estimator-quality properties the
  * sketches are bought for. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  // two groups straddling k: "small" has 10 distinct values (counted
  // exactly), "big" has 5000 (estimated from the bottom-k)
  private lazy val kmvRows: Seq[(String, String)] =
    (0 until 10).map(i => ("small", s"s$i")) ++
      (0 until 5000).flatMap(i => Seq(("big", s"b$i"), ("big", s"b$i")))

  test("kmvDistinct: bit-exact vs local bottom-k, small groups exact") {
    val k = 64
    val out = Sketches.kmvDistinct(kmvRows.toDF("g", "v"), "g", "v", k)
      .collect().map(r => r.getString(0) ->
        (r.getInt(2), r.get(3), r.getLong(4), r.getLong(5))).toMap

    assert(out("small") == ((10, null, 10L, 10L)))

    val hs = (0 until 5000).map(i => h60(s"b$i")).distinct.sorted
    val kth = hs(k - 1)
    val est = (BigInt(k - 1) * (BigInt(1) << 60) / kth).toLong
    assert(out("big") == ((k, kth, est, hs.size.toLong)))
    // the property the sketch is bought for: ~1/sqrt(k-2) relative error
    assert(math.abs(est - 5000.0) / 5000.0 < 0.4)
  }

  test("hllDistinct: registers and floored estimate replay exactly") {
    val p = 6; val w = 60 - p; val m = 1 << p
    val df = (0 until 3000).map(i => ("g", s"v$i")).toDF("g", "v")
    val out = Sketches.hllDistinct(df, "g", "v", p).collect()
    assert(out.length == 1)
    val r = out.head

    val regs = Array.fill(m)(0)
    (0 until 3000).map(i => h60(s"v$i")).foreach { h =>
      val bucket = (h >> w).toInt
      val rem = h & ((1L << w) - 1)
      val rho = if (rem == 0L) w + 1
        else w - (63 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val sScaled = regs.map(reg => 1L << (w + 1 - reg)).sum
    val vZero = regs.count(_ == 0).toLong
    val est = (BigInt(709) * m * m * (BigInt(1) << (w + 1)) /
      (BigInt(1000) * sScaled)).toLong
    assert(r.getInt(1) == m && r.getLong(2) == vZero &&
      r.getLong(3) == sScaled && r.getLong(4) == est)
    assert(r.getLong(5) == 3000L)
    // raw HLL at m=64: ~1.04/sqrt(64) = 13% standard error
    assert(math.abs(est - 3000.0) / 3000.0 < 0.4)
  }

  test("cmsEstimate: min-of-cells replays exactly and never underestimates") {
    val d = 4; val w = 32
    // zipf-ish: value i appears (200/(i+1)) times — collisions guaranteed
    val rows = (0 until 100).flatMap(i => Seq.fill(200 / (i + 1))(s"t$i"))
    val df = rows.toDF("v")
    val cand = (0 until 100 by 7).map(i => s"t$i").toDF("c")
    val out = Sketches.cmsEstimate(df, "v", cand, "c", d, w).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1)

    val cells = scala.collection.mutable.Map[(Int, Long), Long]()
    rows.foreach { v =>
      (0 until d).foreach { s =>
        val b = h60(s"$s#$v") % w
        cells((s, b)) = cells.getOrElse((s, b), 0L) + 1L
      }
    }
    val exact = rows.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val expected = (0 until 100 by 7).map { i =>
      val v = s"t$i"
      val est = (0 until d).map(s => cells((s, h60(s"$s#$v") % w))).min
      (v, est, exact(v), est >= exact(v))
    }.sortBy(_._1)
    assert(out.toSeq == expected)
    assert(out.forall(_._4), "CMS must never underestimate")
  }

  test("kmvSetOps: bit-exact vs local union/intersect sketch math") {
    val k = 64
    val scale = 1000000L
    // A = 0..999, B = 500..1499 (true Jaccard 1/3), C = 0..49 (sub-k)
    val rows =
      (0 until 1000).map(i => ("A", s"v$i")) ++
        (500 until 1500).map(i => ("B", s"v$i")) ++
        (0 until 50).map(i => ("C", s"v$i"))
    val out = Sketches.kmvSetOps(rows.toDF("g", "v"), "g", "v", k, scale)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(2), r.getInt(3), r.get(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10))).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))

    val sets = rows.groupBy(_._1).view
      .mapValues(_.map(t => h60(t._2)).distinct.sorted).toMap
    def skOf(g: String) = sets(g).take(k).toSet
    for (((g0, g1), got) <- out) {
      val union = (skOf(g0) ++ skOf(g1)).toSeq.sorted
      val bottom = union.take(k)
      val kUsed = bottom.size
      val kth: Any = if (kUsed == k) bottom.last else null
      val estU = if (kUsed < k) kUsed.toLong
        else (BigInt(k - 1) * (BigInt(1) << 60) / bottom.last).toLong
      val inter = bottom.count(h => skOf(g0)(h) && skOf(g1)(h)).toLong
      val jacc = (BigInt(inter) * scale / k).toLong
      val estI = (BigInt(inter) * estU / k).toLong
      val exU = (sets(g0).toSet ++ sets(g1)).size.toLong
      val exI = (sets(g0).toSet & sets(g1).toSet).size.toLong
      assert(got == ((k, kUsed, kth, estU, inter, jacc, estI, exU, exI)),
        s"($g0,$g1)")
    }
    // estimator quality on the straddling pair: true J = 1/3
    val ab = out(("A", "B"))
    assert(math.abs(ab._6 / scale.toDouble - 1.0 / 3) < 0.2)
    // sub-k pair is exact: A∪C bottom-k saturates (|A|≥k) but A∩C=C
    val ac = out(("A", "C"))
    assert(ac._8 == 1000L && ac._9 == 50L)
  }
}
