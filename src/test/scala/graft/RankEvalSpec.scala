package graft

import graft.cluster.RankEval
import scala.util.Random

/** RankEval vs brute-force definitions on random labeled instances with
  * deliberate score ties (the Mann–Whitney tie credit, KS argmax
  * tie-break, and bucket-boundary behavior all get exercised). */
class RankEvalSpec extends SparkSpec {

  private case class Inst(pairs: Seq[(Long, Long, Double, Boolean)])

  private def randomInst(seed: Int, n: Int): Inst = {
    val rnd = new Random(seed)
    // coarse score grid => plenty of exact ties, like a Dice kernel
    val pairs = (0 until n).map { i =>
      val r0 = i.toLong / 3
      val r1 = 1000L + i
      val isTrue = rnd.nextBoolean() && rnd.nextBoolean()
      val sim = (rnd.nextInt(20) + (if (isTrue) 5 else 0)).toDouble / 25.0
      (r0, r1, sim, isTrue)
    }
    Inst(pairs)
  }

  private def frames(inst: Inst) = {
    import spark.implicits._
    val edges = inst.pairs.map(p => (p._1, p._2, p._3))
      .toDF("rec0", "rec1", "sim")
    val truth = inst.pairs.filter(_._4).map(p => (p._1, p._2))
      .toDF("rec0", "rec1")
    (edges, truth)
  }

  test("rocAuc == brute-force pair counting with half-credit ties") {
    for (seed <- 1 to 4) {
      val inst = randomInst(seed, 400)
      val (edges, truth) = frames(inst)
      val row = RankEval.rocAuc(edges, truth).collect().head
      val pos = inst.pairs.filter(_._4).map(_._3)
      val neg = inst.pairs.filterNot(_._4).map(_._3)
      var conc = BigInt(0); var tied = BigInt(0)
      for (p <- pos; q <- neg) {
        if (p > q) conc += 1 else if (p == q) tied += 1
      }
      assert(row.getAs[Long]("n_pos") == pos.size.toLong)
      assert(row.getAs[Long]("n_neg") == neg.size.toLong)
      assert(BigInt(row.getAs[java.math.BigDecimal]("n_concordant")
        .toBigInteger) == conc)
      assert(BigInt(row.getAs[java.math.BigDecimal]("n_tied")
        .toBigInteger) == tied)
      val expected = (2 * conc + tied).toDouble /
        (2.0 * pos.size * neg.size)
      assert(math.abs(row.getAs[Double]("auc") - expected) < 1e-6)
    }
  }

  test("ksStatistic == brute-force max CDF gap, smallest-score argmax") {
    for (seed <- 5 to 8) {
      val inst = randomInst(seed, 300)
      val (edges, truth) = frames(inst)
      val row = RankEval.ksStatistic(edges, truth).collect().head
      val pos = inst.pairs.filter(_._4).map(_._3)
      val neg = inst.pairs.filterNot(_._4).map(_._3)
      val cuts = inst.pairs.map(_._3).distinct.sorted
      val best = cuts.map { v =>
        val num = (BigInt(pos.count(_ <= v)) * neg.size -
          BigInt(neg.count(_ <= v)) * pos.size).abs
        (num, v)
      }.maxBy { case (num, v) => (num, -v) } // max num, then SMALLEST v
      assert(BigInt(row.getAs[java.math.BigDecimal]("ks_num")
        .toBigInteger) == best._1)
      assert(row.getAs[Double]("at_sim") == best._2)
      val expected = best._1.toDouble / (pos.size.toLong * neg.size)
      assert(math.abs(row.getAs[Double]("ks_d") - expected) < 1e-6)
    }
  }

  test("gainsTable == brute-force ranked bucketing; capture ends at 1") {
    val inst = randomInst(11, 500)
    val (edges, truth) = frames(inst)
    val out = RankEval.gainsTable(edges, truth, buckets = 10)
      .orderBy("bucket").collect()
    val ranked = inst.pairs.sortBy(p => (-p._3, p._1, p._2))
    val n = ranked.size
    val nPos = ranked.count(_._4)
    val byBucket = ranked.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / n }
    assert(out.length == byBucket.size)
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val exp = byBucket(b)
      assert(r.getAs[Long]("n_pairs") == exp.size.toLong)
      assert(r.getAs[Long]("n_true") == exp.count(_._1._4).toLong)
    }
    val last = out.last
    assert(last.getAs[Long]("cum_pairs") == n.toLong)
    assert(last.getAs[Long]("cum_true") == nPos.toLong)
    assert(last.getAs[Double]("capture") == 1.0)
    assert(math.abs(last.getAs[Double]("lift") - 1.0) < 1e-9)
  }

  test("averagePrecision == brute-force AP over the ranked list") {
    for (seed <- 21 to 23) {
      val inst = randomInst(seed, 350)
      val (edges, truth) = frames(inst)
      val row = RankEval.averagePrecision(edges, truth).collect().head
      val ranked = inst.pairs.sortBy(p => (-p._3, p._1, p._2))
      var tp = 0L
      var sumE9 = 0L
      ranked.zipWithIndex.foreach { case (p, i) =>
        if (p._4) {
          tp += 1
          sumE9 += math.round(1e9 * tp / (i + 1L))
        }
      }
      assert(row.getAs[Long]("n_pos") == tp)
      assert(row.getAs[Long]("n_ranked") == ranked.size.toLong)
      assert(row.getAs[Long]("ap_sum_e9") == sumE9)
      assert(math.abs(row.getAs[Double]("avg_precision") -
        sumE9 / (tp * 1e9)) < 1e-6)
    }
  }

  test("degenerate labels: all-positive / all-negative stay defined") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 0.9), (1L, 3L, 0.8)).toDF("rec0", "rec1", "sim")
    val allTruth = Seq((1L, 2L), (1L, 3L)).toDF("rec0", "rec1")
    val none = allTruth.limit(0)
    val a = RankEval.rocAuc(edges, allTruth).collect().head
    assert(a.isNullAt(a.fieldIndex("auc"))) // n_neg = 0 -> undefined
    val ap = RankEval.averagePrecision(edges, none).collect().head
    assert(ap.getAs[Long]("ap_sum_e9") == 0L)
    assert(ap.isNullAt(ap.fieldIndex("avg_precision")))
  }
}
