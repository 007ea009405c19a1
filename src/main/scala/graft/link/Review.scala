package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Three-zone Fellegi–Sunter decision surface: auto-accept at/above the
  * upper threshold, clerical review in [lower, upper), reject below —
  * the standard deployment shape for a linkage engine whose operators
  * feed a human adjudication queue (the reference exposes only the
  * single-threshold cut, `entityservice/views/project.py` run threshold;
  * the band is what its users build around it).
  *
  * Determinism discipline: the queue rank orders by (sim DESC, dp1 ASC,
  * rec1 ASC) — edge sims are exact IEEE doubles from the integer Dice
  * kernel, so ranks are engine-identical and SQL-replayable.
  *
  * Scale shape: one codegen'd CASE column plus ONE keyed window
  * partitioned by (zone, left record) — parallel across records, no
  * global sort, no collects. */
object Review {

  /** @param edges Edge-shaped frame (sim, dp0, rec0, dp1, rec1) already
    *              thresholded at the band's LOWER bound.
    * @param upper auto-accept threshold (>= upper ⇒ zone 'accept').
    * @return input + zone + queue_pos: review rows get a per-left-record
    *         review position (1 = most match-like first); accept rows
    *         carry 0 (never queued). */
  def threeZone(edges: DataFrame, upper: Double): DataFrame = {
    require(upper > 0 && upper <= 1.0, s"upper threshold in (0,1]: $upper")
    val z = edges.withColumn("zone",
      when(col("sim") >= upper, lit("accept")).otherwise(lit("review")))
    val w = Window.partitionBy(col("zone"), col("dp0"), col("rec0"))
      .orderBy(col("sim").desc, col("dp1"), col("rec1"))
    z.withColumn("queue_pos",
      when(col("zone") === "review", row_number().over(w)).otherwise(lit(0)))
  }

  /** Unlinkables curve (splink's `unlinkables_chart`): for each candidate
    * threshold, the share of records whose BEST candidate score falls
    * below it — i.e. records that no threshold choice at or above t can
    * ever link. The deployment-tuning readout that shows what raising
    * the cut costs in coverage before anyone reruns the pipeline.
    *
    * Scale shape: one union of the two edge endpoints, ONE max-aggregate
    * keyed by record (map-side partial combine), a keyed left join onto
    * the record universe (records with no candidate at the generation
    * floor count as best = 0.0), then a literal threshold explode over
    * the already-aggregated per-record frame — T·N rows into a T-key
    * hash-agg, no window, no collect.
    *
    * @param edges   Edge-shaped frame (sim, dp0, rec0, dp1, rec1)
    *                thresholded at the pipeline's generation floor; the
    *                curve is exact for thresholds >= that floor.
    * @param records record universe, columns (dp, rec) — one row per
    *                record the coverage is measured over.
    * @param thresholds candidate cuts to evaluate (each >= the floor).
    * @return (threshold, n_records, n_unlinkable, frac) per threshold. */
  def unlinkables(edges: DataFrame, records: DataFrame,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "at least one threshold")
    val ends = edges.select(col("dp0").as("dp"), col("rec0").as("rec"),
        col("sim"))
      .unionByName(edges.select(col("dp1").as("dp"), col("rec1").as("rec"),
        col("sim")))
    val best = ends.groupBy("dp", "rec").agg(max("sim").as("best"))
    records.select(col("dp"), col("rec"))
      .join(best, Seq("dp", "rec"), "left")
      .select(coalesce(col("best"), lit(0.0)).as("best"))
      .select(explode(array(thresholds.map(lit): _*)).as("threshold"),
        col("best"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("n_records"),
        sum(when(col("best") < col("threshold"), 1L).otherwise(0L))
          .as("n_unlinkable"))
      .withColumn("frac",
        round(col("n_unlinkable").cast("double") / col("n_records"), 6))
  }
}
