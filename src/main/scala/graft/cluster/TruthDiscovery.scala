package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Truth discovery / data fusion over conflicting claims (the
  * TruthFinder family — Yin, Han & Yu, TKDE 2008; surveyed in Li et al.
  * VLDB 2015 "A survey on truth discovery"): sources make claims
  * `(src, obj, val)`; source trust and claim confidence reinforce each
  * other — a claim is believable when trusted sources make it, a source
  * is trustworthy when its claims are believable. The resolution step a
  * linkage pipeline needs AFTER clustering, when merged records disagree
  * on a field and majority vote would let a sloppy bulk source outvote a
  * careful one.
  *
  * This engine's variant is frozen to an EXACT integer fixed point so
  * any engine replays it bit-for-bit (the repo-wide convention — same
  * trade as the PageRank/HITS/EM replays): trust starts at scale/2 for
  * every source; each round computes claim confidence = Σ trust of the
  * claiming sources, normalizes per object with one floored divide
  * (`conf·scale DIV Σ_obj conf`), and re-derives trust as the floored
  * mean of the source's claim confidences. No damping, no smoothing —
  * the two documented rounds are plurality vote (round 1) re-weighted by
  * source agreement (round 2).
  *
  * Scale shape: per round, TWO hash aggs (claim confidence, per-object
  * total) + one join back to claims + one per-source agg — all keyed
  * shuffles, no collects, no windows over unbounded partitions; the
  * winner cut is one min(struct) agg per object. Rounds are a small
  * constant, so the plan is a shallow chain.
  *
  * Overflow bounds (stated exactly, not hedged): the raw confidence sum
  * holds `n_src · scale` in Long (≤ 9.2e18 → ~9.2e12 sources per value
  * at scale=10^6); the normalize multiply `conf · scale` is widened to
  * decimal(38,0) BEFORE the floored divide, so it cannot wrap; the
  * normalized confidences and the per-source mean are ≤ scale.
  *
  * @param claims frame with (src, obj, val) columns (duplicates
  *               collapse: one claim per source per object-value).
  * @param rounds trust-iteration rounds (≥ 1).
  * @param scale  fixed-point scale.
  * @return one row per object: (obj, val, conf, n_votes) — the winning
  *         value, its normalized confidence after the last round, and
  *         how many sources claimed it; ties broken by smaller val. */
object TruthDiscovery {
  def resolve(claims: DataFrame, srcCol: String, objCol: String,
      valCol: String, rounds: Int = 2, scale: Long = 1000000L): DataFrame = {
    require(rounds >= 1 && scale >= 2, s"rounds=$rounds scale=$scale")
    val c = claims.select(col(srcCol).cast("long").as("src"),
        col(objCol).cast("string").as("obj"),
        col(valCol).cast("string").as("val"))
      .where(col("obj").isNotNull && col("val").isNotNull)
      .distinct()
    var trust = c.select(col("src")).distinct()
      .select(col("src"), lit(scale / 2).as("t"))
    var confN: DataFrame = null
    (1 to rounds).foreach { _ =>
      val conf = c.join(trust, "src")
        .groupBy("obj", "val")
        .agg(sum(col("t")).as("conf"), count(lit(1)).as("n_votes"))
      val tot = conf.groupBy("obj").agg(sum(col("conf")).as("tot"))
      confN = conf.join(tot, "obj")
        .select(col("obj"), col("val"),
          expr(s"CAST((CAST(conf AS DECIMAL(38,0)) * $scale) DIV tot" +
            " AS BIGINT)").as("conf"), col("n_votes"))
      trust = c.join(confN, Seq("obj", "val"))
        .groupBy("src")
        .agg(expr("sum(conf) DIV count(*)").as("t"))
    }
    confN.groupBy("obj")
      .agg(min(struct((-col("conf")).as("nc"), col("val").as("v"),
        col("n_votes").as("n"))).as("w"))
      .select(col("obj"), col("w.v").as("val"), (-col("w.nc")).as("conf"),
        col("w.n").as("n_votes"))
  }
}
