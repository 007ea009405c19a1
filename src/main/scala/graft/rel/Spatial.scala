package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial radius join via grid blocking — the two-dimensional analogue
  * of the banded interval join: points land in radius-sized grid cells,
  * each left point probes its 3×3 cell neighbourhood, and only
  * candidates pay the exact distance test. Any pair within `radius`
  * differs by at most one cell index per axis (cells are radius-wide),
  * so the neighbourhood probe is lossless; each right point lives in
  * exactly ONE cell, so each qualifying pair joins exactly once — no
  * dedup pass.
  *
  * Coordinates are integer micro-degrees and the distance test is the
  * exact integer planar square `dlat² + dlon² ≤ radius²` — deterministic
  * at any parallelism and replayable in SQL (haversine would drag libm
  * trig in; at city-scale radii the planar square is the standard
  * blocking-stage test, with great-circle refinement a caller concern).
  *
  * Scale shape: one map-side 9× explode of the (small) probe side, one
  * equi-join on the 2-int cell key, codegen'd confirm — the same
  * blocked-pair discipline as every other pair path here. Skewed cells
  * (urban density) ride the usual salting if needed.
  */
object Spatial {

  /** @param left  (leftId, lat, lon) — probe side
    * @param right (rightId, lat, lon) — build side, one cell per point
    * @param radius micro-degrees; pairs with planar squared distance
    *               ≤ radius² are emitted as (left id, right id, dist2). */
  def gridJoin(left: DataFrame, leftId: String, right: DataFrame,
      rightId: String, latCol: String, lonCol: String,
      radius: Long): DataFrame = {
    require(radius > 0, s"radius: $radius")
    // shift to non-negative so integer division is uniform floor
    def cellify(df: DataFrame, id: String, probe: Boolean): DataFrame = {
      val base = df.select(col(id),
        col(latCol).cast("long").as("_lat"), col(lonCol).cast("long").as("_lon"))
        .withColumn("_ci", expr(s"(_lat + 90000000L) DIV ${radius}L"))
        .withColumn("_cj", expr(s"(_lon + 180000000L) DIV ${radius}L"))
      if (!probe) base
      else base.select(col(id), col("_lat"), col("_lon"),
        explode(expr(
          "flatten(transform(sequence(-1L, 1L), di -> " +
            "transform(sequence(-1L, 1L), dj -> " +
            "struct(_ci + di AS ci, _cj + dj AS cj))))")).as("c"))
        .select(col(id), col("_lat"), col("_lon"),
          col("c.ci").as("_ci"), col("c.cj").as("_cj"))
    }
    val l = cellify(left, leftId, probe = true)
      .withColumnRenamed("_lat", "_lat0").withColumnRenamed("_lon", "_lon0")
    val r = cellify(right, rightId, probe = false)
    val d2 = (col("_lat0") - col("_lat")) * (col("_lat0") - col("_lat")) +
      (col("_lon0") - col("_lon")) * (col("_lon0") - col("_lon"))
    l.join(r, Seq("_ci", "_cj"))
      .withColumn("dist2", d2)
      .where(col("dist2") <= radius * radius)
      .select(col(leftId), col(rightId), col("dist2"))
  }
}
