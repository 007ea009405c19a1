package graft

import org.apache.spark.sql.functions._
import graft.link.StableMatching

/** Deferred acceptance vs the textbook sequential Gale–Shapley: both
  * compute the unique left-optimal stable matching for the same
  * preference orders (score desc, id asc on both sides), so the
  * distributed synchronized rounds must land on exactly the sequential
  * result — plus the definitional gate: no blocking pair exists. */
class StableMatchingSpec extends SparkSpec {
  import spark.implicits._

  private def sequentialGs(pairs: Seq[(Long, Long, Long)])
      : Map[Long, (Long, Long)] = {
    val score = pairs.map(p => (p._1, p._2) -> p._3).toMap
    val prefs = pairs.groupBy(_._1).view.mapValues(
      _.map(p => (p._2, p._3)).sortBy(t => (-t._2, t._1)).map(_._1)).toMap
    val nextIdx = scala.collection.mutable.Map[Long, Int]()
      .withDefaultValue(0)
    val heldBy = scala.collection.mutable.Map[Long, Long]() // r -> l
    val free = scala.collection.mutable.Queue[Long](
      prefs.keys.toSeq.sorted: _*)
    while (free.nonEmpty) {
      val l = free.dequeue()
      val list = prefs(l)
      if (nextIdx(l) < list.size) {
        val r = list(nextIdx(l))
        nextIdx(l) += 1
        heldBy.get(r) match {
          case None => heldBy(r) = l
          case Some(cur) =>
            val (sNew, sCur) = (score((l, r)), score((cur, r)))
            if (sNew > sCur || (sNew == sCur && l < cur)) {
              heldBy(r) = l; free.enqueue(cur)
            } else free.enqueue(l)
        }
      }
    }
    heldBy.map { case (r, l) => l -> (r, score((l, r))) }.toMap
  }

  test("run == sequential Gale-Shapley and is stable (random instances)") {
    for (seed <- Seq(3, 17, 41)) {
      val rng = new scala.util.Random(seed)
      val pairs = (1 to 120).map(_ => (rng.nextInt(20).toLong,
          (100 + rng.nextInt(18)).toLong, rng.nextInt(50).toLong))
        .groupBy(p => (p._1, p._2)).values
        .map(g => g.maxBy(_._3)).toSeq
      val expect = sequentialGs(pairs)
      val got = StableMatching.run(pairs.toDF("l", "r", "score")
          .repartition(5))
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
      assert(got == expect, s"seed $seed")

      // definitional stability: no input pair (l, r, s) where both sides
      // prefer each other over their assigned partners
      val matchOfL = got
      val matchOfR = got.map { case (l, (r, s)) => r -> (l, s) }
      pairs.foreach { case (l, r, s) =>
        val lWants = matchOfL.get(l) match {
          case None => true
          case Some((r0, s0)) => s > s0 || (s == s0 && r < r0)
        }
        val rWants = matchOfR.get(r) match {
          case None => true
          case Some((l0, s0)) => s > s0 || (s == s0 && l < l0)
        }
        assert(!(lWants && rWants), s"blocking pair ($l,$r,$s) seed $seed")
      }
    }
  }
}
