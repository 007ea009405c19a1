package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic rule-cascade match tier — the "link by ordered exact
  * rules before you score" stage every production ER system runs in front
  * of the probabilistic kernel (splink's deterministic/blocking rules;
  * the reference exposes only the probabilistic Dice path, so this is an
  * engine extension, not a port).
  *
  * Semantics: rules are an ORDERED list of (name, predicate). Each
  * candidate pair gets the FIRST rule whose predicate holds; pairs no
  * rule matches are dropped. The cascade compiles to one nested CASE
  * projection over the candidate frame — pure codegen, no UDFs, no
  * shuffle beyond whatever join produced the candidates — so at 100 TB
  * the cost is the candidate generation (blocked + salted elsewhere),
  * never the cascade itself.
  */
object Rules {

  /** Tag each candidate pair with the first matching rule name (column
    * `matched_rule`), dropping pairs that match no rule. */
  def cascade(pairs: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "rule cascade needs at least one rule")
    val firstMatch = rules.foldRight(lit(null).cast("string")) {
      case ((name, pred), tail) => when(pred, lit(name)).otherwise(tail)
    }
    pairs.withColumn("matched_rule", firstMatch)
      .where(col("matched_rule").isNotNull)
  }

  /** Per-rule firing counts (the cascade audit readout). */
  def cascadeStats(pairs: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    cascade(pairs, rules).groupBy("matched_rule")
      .agg(count(lit(1)).as("n_pairs"))

  /** λ prior from deterministic rules — splink's
    * `estimate_probability_two_random_records_match`: the EM prior
    * P(two random records match) estimated as
    *
    *   λ = |pairs matched by ANY rule| / (C(n,2) · recall)
    *
    * where `recall` is the analyst's judgement of what fraction of true
    * matches the rules collectively catch. Each rule is an
    * equality-key set, so its pair set is a self-equi-join on those
    * keys (never a cartesian); the union is de-duplicated before
    * counting so overlapping rules don't double-count. All arithmetic
    * is exact: λ is emitted scaled by 10⁹ via a decimal(38,0) floored
    * divide.
    *
    * Scale shape: one blocked self-join per rule (each skew-bounded by
    * its own key's group sizes), one distinct on bare id pairs, three
    * 1-row aggregates. At 100 TB the distinct is the only real shuffle
    * and it carries two longs per matched pair.
    *
    * @param rules (name, equality-key columns) — name is documentation
    *              only; a pair matching several rules counts once.
    * @param recallScaled assumed rule recall in [1, 10000] (10000 = the
    *                     rules catch every true match). */
  def lambdaPrior(records: DataFrame, id: String,
      rules: Seq[(String, Seq[String])],
      recallScaled: Long = 10000L, scale: Long = 1000000000L): DataFrame = {
    require(rules.nonEmpty && rules.forall(_._2.nonEmpty),
      "at least one rule, each with at least one key column")
    require(recallScaled >= 1L && recallScaled <= 10000L,
      "recallScaled in [1, 10000]")
    val pairSets = rules.map { case (_, keys) =>
      val proj = records.select((col(id).as("id") +: keys.map(col)): _*)
      proj.as("a").join(proj.as("b"),
          keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id0"), col("b.id").as("id1"))
    }
    val matched = pairSets.reduce(_ unionByName _).distinct()
      .agg(count(lit(1)).as("n_matched"))
    val total = records.agg(
      expr("count(1) * (count(1) - 1) DIV 2").as("total_pairs"))
    matched.crossJoin(total)
      .select(col("n_matched"), col("total_pairs"),
        lit(recallScaled).as("recall_scaled"),
        expr(s"""CAST(CAST(n_matched AS DECIMAL(38,0)) * ${scale}L * 10000
                 DIV (CAST(total_pairs AS DECIMAL(38,0)) * $recallScaled)
                 AS BIGINT)""").as("lambda_scaled"))
  }
}
