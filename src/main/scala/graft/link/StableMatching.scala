package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable one-to-one assignment over a scored candidate pair set via
  * synchronized deferred acceptance (Gale–Shapley 1962; the
  * hospitals/residents form with partial preference lists). The 1:1
  * enforcement step of an ER pipeline: [[graft.cluster.Solver]] merges
  * transitively and mutual-best keeps only reciprocal argmaxes —
  * deferred acceptance instead GUARANTEES a maximal stable matching: no
  * unmatched pair (l, r) exists where both prefer each other over their
  * assigned partners. Preferences are the scores, ties broken by id on
  * both sides, so the run is deterministic at any parallelism.
  *
  * Synchronized rounds: every unheld left proposes to its best
  * not-yet-rejecting right; every right keeps the best offer among its
  * current hold and the new proposals; losers are rejected and never
  * re-propose to that right. Each round either rejects ≥ 1 pair or
  * terminates, so rounds are bounded by |pairs|; in practice a handful.
  * Post-convergence rounds are no-ops (no active proposer), which is
  * what lets the oracle replay a FIXED round count safely.
  *
  * Scale shape per round: two ranked windows (per-left argmax over
  * alive pairs, per-right argmax over offers) + one anti-join to apply
  * rejections — all hash-partitioned on the respective key; the alive
  * set only shrinks. Fixpoint checks are scalar counts; lineage is
  * truncated per round.
  *
  * @param pairs (l, r, score) candidate pairs — duplicates collapse to
  *              their max score.
  * @return (l, r, score): the left-optimal stable matching. */
object StableMatching {

  def run(pairs: DataFrame, maxRounds: Int = 10000): DataFrame = {
    var alive = pairs
      .groupBy(col("l"), col("r")).agg(max(col("score")).as("score"))
      .localCheckpoint(true)
    var holds = alive.limit(0)
    var round = 0
    var active = 1L
    while (active > 0 && round < maxRounds) {
      round += 1
      val proposals = alive
        .join(holds.select("l"), Seq("l"), "left_anti")
        .withColumn("rk", row_number().over(
          Window.partitionBy("l")
            .orderBy(col("score").desc, col("r").asc)))
        .where(col("rk") === 1).drop("rk")
        .localCheckpoint(true)
      active = proposals.count()
      if (active > 0) {
        val offers = holds.unionByName(proposals)
        val winners = offers
          .withColumn("rk", row_number().over(
            Window.partitionBy("r")
              .orderBy(col("score").desc, col("l").asc)))
          .where(col("rk") === 1).drop("rk")
          .localCheckpoint(true)
        val rejected = offers.select("l", "r")
          .join(winners.select("l", "r"), Seq("l", "r"), "left_anti")
        alive = alive.join(rejected, Seq("l", "r"), "left_anti")
          .localCheckpoint(true)
        holds = winners
      }
    }
    require(active == 0,
      s"stable matching did not converge in $maxRounds rounds")
    holds
  }
}
