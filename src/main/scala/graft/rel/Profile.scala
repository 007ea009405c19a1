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
