package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the pre-flight data-quality report a
  * pipeline runs before linking/training (row counts, null rates, exact
  * cardinalities, numeric ranges, string length ranges).
  *
  * One aggregate per column over the same cached scan, unioned — this
  * deliberately avoids a single multi-count_distinct aggregate, whose
  * Expand rewrite multiplies every input row by the number of profiled
  * columns before the shuffle. Numeric min/max via try_cast to double
  * (strings profile as null there, lengths instead), so the output
  * schema is fixed and engine-portable — no double→string formatting
  * anywhere, which is what keeps the DuckDB oracle value-exact.
  *
  * At 100-TB scale swap `count_distinct` for `approx_count_distinct`
  * (single-pass HLL, mergeable) — the plan shape is otherwise unchanged;
  * the exact form is what the driver oracle can replay.
  */
object Profile {

  /** Schema/distribution drift between two snapshots of one table: per
    * column, both profiles side by side plus drift flags — the check an
    * ingest pipeline runs before promoting a new crawl (a column whose
    * null rate doubles or whose cardinality collapses usually means an
    * upstream extractor broke, not data).
    *
    * Flags are exact integer cross-multiplications (nullFracJump:
    * n_null·n' > factor·n_null'·n and vice versa; cardinalityShift
    * likewise on n_distinct), so the report replays value-exact in SQL.
    * Cost: the two profiles (metadata-sized) + one tiny join. */
  def drift(oldSnap: DataFrame, newSnap: DataFrame, columns: Seq[String],
      factorTenths: Long = 20L): DataFrame = {
    val o = profile(oldSnap, columns)
      .select(col("column"), col("n").as("n_old"),
        col("n_null").as("null_old"), col("n_distinct").as("dist_old"))
    val n = profile(newSnap, columns)
      .select(col("column"), col("n").as("n_new"),
        col("n_null").as("null_new"), col("n_distinct").as("dist_new"))
    def jump(a0: org.apache.spark.sql.Column, n0: org.apache.spark.sql.Column,
        a1: org.apache.spark.sql.Column, n1: org.apache.spark.sql.Column) = {
      def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      (d(a1) * n0 * 10 > d(a0) * n1 * factorTenths) ||
        (d(a0) * n1 * 10 > d(a1) * n0 * factorTenths)
    }
    o.join(n, "column")
      .withColumn("null_drift",
        jump(col("null_old"), col("n_old"), col("null_new"), col("n_new")))
      .withColumn("cardinality_drift",
        jump(col("dist_old"), col("n_old"), col("dist_new"), col("n_new")))
  }

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty)
    val cached = df.select(columns.map(col): _*)
    columns.map { c =>
      cached.agg(
        count(lit(1)).as("n"),
        sum(col(c).isNull.cast("long")).as("n_null"),
        count_distinct(col(c)).as("n_distinct"),
        min(expr(s"try_cast(cast($c as string) as double)")).as("min_num"),
        max(expr(s"try_cast(cast($c as string) as double)")).as("max_num"),
        min(length(col(c).cast("string"))).as("min_len"),
        max(length(col(c).cast("string"))).as("max_len"))
        .withColumn("column", lit(c))
    }.reduce(_ unionByName _)
      .select("column", "n", "n_null", "n_distinct",
        "min_num", "max_num", "min_len", "max_len")
  }
}
