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
}
