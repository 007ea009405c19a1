package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Multi-format columnar interchange: write a DataFrame hive-partitioned
  * by a low-cardinality column in any Spark-native format (orc, parquet,
  * json, csv) and read the layout back.
  *
  * Partitioned layout is the 100-TB table-organization primitive the
  * reference delegates to Postgres tables + object-store blobs
  * (`backend/entityservice/object_store.py` keeps run artifacts as
  * MinIO objects keyed by run id): a reader filtering on the partition
  * column opens only the matching directories — partition PRUNING, which
  * is stronger than row-group predicate pushdown because non-matching
  * files are never listed into tasks. PlanSpec gates that the pruned ORC
  * scan shows the filter under `PartitionFilters` with the partition
  * column absent from `ReadSchema`.
  *
  * ORC specifically is the second columnar format next to parquet that
  * ships with Spark (vectorized reader, predicate pushdown, zstd) — a
  * corpus handoff to Hive/Trino estates without re-encoding. */
object Formats {

  private val Supported = Set("orc", "parquet", "json", "csv")

  /** Write `df` under `path` partitioned by `partCol` (hive layout:
    * one directory per value). CSV keeps a header so the read side
    * recovers column names; schemas are otherwise self-describing. */
  def writePartitioned(df: DataFrame, path: String, format: String,
      partCol: String): Unit = {
    require(Supported(format), s"format=$format not in $Supported")
    df.write.mode("overwrite").format(format)
      .option("header", "true")
      .partitionBy(partCol).save(path)
  }

  /** Read a partitioned layout back. CSV/JSON carry no type metadata, so
    * callers needing exact types pass `schemaFrom` (typically the frame
    * that was written) — schema-on-read inference would widen or narrow
    * types nondeterministically at corpus scale. */
  def read(spark: SparkSession, path: String, format: String,
      schemaFrom: Option[DataFrame] = None): DataFrame = {
    require(Supported(format), s"format=$format not in $Supported")
    val r = spark.read.format(format).option("header", "true")
    schemaFrom match {
      case Some(src) =>
        // partition columns come back from directory names; keep the
        // source's data-column types and let the partition column re-cast
        val cast = r.load(path)
        src.schema.fields.foldLeft(cast) { (acc, f) =>
          if (acc.columns.contains(f.name))
            acc.withColumn(f.name, col(f.name).cast(f.dataType))
          else acc
        }.select(src.columns.map(col): _*)
      case None => r.load(path)
    }
  }

  /** Write + read back: the fidelity contract is that the returned frame
    * equals `df` row-for-row (ExportSpec asserts it for orc + json). */
  def roundTrip(df: DataFrame, path: String, format: String,
      partCol: String): DataFrame = {
    writePartitioned(df, path, format, partCol)
    read(df.sparkSession, path, format, Some(df))
  }
}
