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
}
