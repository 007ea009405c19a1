package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden-record survivorship: collapse each resolved entity cluster to
  * ONE canonical record. The reference stops at group membership
  * (`solver.py` → groups sink); any consumer of a linkage result
  * immediately needs the merge step — pick, per field, which member's
  * value survives. Two standard rules are implemented:
  *
  *   - `voteFields`: most-frequent non-null value wins (categorical
  *     fields — lang, source, country); ties broken by the smaller
  *     value, so the result is deterministic and SQL-replayable.
  *   - `maxFields`: largest value wins (recency/completeness proxies —
  *     longest text, latest timestamp, highest quality score).
  *
  * Scale shape: one hash-partitioned count agg per the melted
  * (group, field, value) rows — a single shuffle regardless of how many
  * vote fields — then a per-(group, field) window rank over the counted
  * rows (grouped-top-1: the window partitions by the agg's own keys, so
  * it reuses the exchange and never sees more rows than distinct values),
  * pivoted back wide by a plain group agg. `maxFields` ride the same
  * final agg as plain max()s. No collects, no cross products.
  *
  * All surviving values are returned as strings (the melt casts to
  * string — one schema for arbitrarily mixed field types; numeric max
  * fields are maxed BEFORE the cast so ordering is numeric).
  */
object Survivorship {

  /** @param df      member rows: groupCol + the named fields.
    * @param groupCol cluster/entity id column.
    * @return one row per group: (groupCol, n_members,
    *         <f> for each vote field, max_<f> for each max field). */
  def goldenRecord(df: DataFrame, groupCol: String,
      voteFields: Seq[String], maxFields: Seq[String] = Nil): DataFrame = {
    require(voteFields.nonEmpty, "need at least one vote field")
    val g = col(groupCol).as("_sv_g")

    // melt: (group, field, value) — one row per member per vote field
    val melted = df.select(g, explode(map(
      voteFields.flatMap(f => Seq(lit(f), col(f).cast("string"))): _*
    )).as(Seq("_sv_f", "_sv_v"))).where(col("_sv_v").isNotNull)

    val counted = melted.groupBy("_sv_g", "_sv_f", "_sv_v")
      .agg(count(lit(1)).as("_sv_n"))
    val w = Window.partitionBy("_sv_g", "_sv_f")
      .orderBy(col("_sv_n").desc, col("_sv_v").asc)
    val winners = counted.withColumn("_sv_r", row_number().over(w))
      .where(col("_sv_r") === 1)

    val wide = winners.groupBy("_sv_g").agg(
      voteFields.map(f =>
        max(when(col("_sv_f") === f, col("_sv_v"))).as(f)).head,
      voteFields.map(f =>
        max(when(col("_sv_f") === f, col("_sv_v"))).as(f)).tail: _*)

    val sizeAggs = count(lit(1)).as("n_members") +:
      maxFields.map(f => max(col(f)).as(s"max_$f"))
    val sizes = df.groupBy(g).agg(sizeAggs.head, sizeAggs.tail: _*)

    sizes.join(wide, Seq("_sv_g"), "left")
      .withColumnRenamed("_sv_g", groupCol)
      .select(col(groupCol) +: col("n_members") +:
        (voteFields.map(col) ++ maxFields.map(f => col(s"max_$f"))): _*)
  }
}
