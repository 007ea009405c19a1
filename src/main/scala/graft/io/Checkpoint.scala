package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Stage checkpointing with manifest-commit semantics + per-partition
  * lineage rows and counters (north rule: "Every stage checkpoints ... with
  * per-partition lineage rows and counters ... making the pipeline
  * resumable mid-run").
  *
  * Table format: Parquet data + a `_MANIFEST.json` written LAST — manifest
  * presence is the commit record (same commit protocol shape as Iceberg's
  * metadata pointer; the sandbox ships no Iceberg runtime jar, see
  * SURVEY.md §7.1). A stage directory without a manifest is an aborted
  * write and is recomputed+overwritten on the next run; a stage with a
  * manifest is skipped and served from Parquet (resume).
  *
  * Lineage: one row per output partition (stage, partition_id, rows_out)
  * plus stage-level counters (e.g. pairs_generated / pairs_scored /
  * edges_kept), appended to `<root>/_lineage` — the Spark analogue of the
  * reference's per-task Redis progress counters (`cache/progress.py:34-58`).
  */
object Checkpoint {

  case class StageResult(df: DataFrame, rows: Long, resumed: Boolean)

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def isCommitted(spark: SparkSession, root: String, name: String): Boolean = {
    val mf = new Path(s"$root/$name/_MANIFEST.json")
    fs(spark, mf).exists(mf)
  }

  /** Run (or resume) a checkpointed stage. `compute` is only invoked when
    * the stage is not yet committed. `counters` are stage-level metrics
    * evaluated after the write (may read the checkpointed table). */
  def stage(spark: SparkSession, root: String, name: String,
      counters: DataFrame => Map[String, Long] = _ => Map.empty)
      (compute: => DataFrame): StageResult = {
    val dir = s"$root/$name"
    val dataPath = new Path(dir)
    val mfPath = new Path(s"$dir/_MANIFEST.json")
    val filesystem = fs(spark, mfPath)

    if (filesystem.exists(mfPath)) {
      val df = spark.read.parquet(dir)
      return StageResult(df, -1L, resumed = true)
    }

    val t0 = System.nanoTime()
    // aborted prior attempt -> clobber
    if (filesystem.exists(dataPath)) filesystem.delete(dataPath, true)
    compute.write.mode("overwrite").parquet(dir)
    val written = spark.read.parquet(dir)

    // per-partition lineage of the committed table (one row per read
    // partition ~= parquet file split)
    val lineage = written
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows_out"))
      .withColumn("stage", lit(name))
      .select("stage", "partition_id", "rows_out")
    lineage.write.mode("append").parquet(s"$root/_lineage")

    val rows = written.count()
    val wallMs = (System.nanoTime() - t0) / 1000000L
    val metrics = counters(written)
    val metricsJson = metrics.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val manifest =
      s"""{"stage":"$name","rows":$rows,"wall_ms":$wallMs,"metrics":{$metricsJson}}"""
    val out = filesystem.create(mfPath, true)
    out.write(manifest.getBytes(StandardCharsets.UTF_8))
    out.close()
    StageResult(spark.read.parquet(dir), rows, resumed = false)
  }

  def readManifest(spark: SparkSession, root: String, name: String): Option[String] = {
    val mf = new Path(s"$root/$name/_MANIFEST.json")
    val filesystem = fs(spark, mf)
    if (!filesystem.exists(mf)) None
    else {
      val in = filesystem.open(mf)
      val bytes = new Array[Byte](filesystem.getFileStatus(mf).getLen.toInt)
      in.readFully(bytes); in.close()
      Some(new String(bytes, StandardCharsets.UTF_8))
    }
  }

  /** Invalidate a stage (forces recompute on the next run). */
  def invalidate(spark: SparkSession, root: String, name: String): Unit = {
    val dir = new Path(s"$root/$name")
    val filesystem = fs(spark, dir)
    if (filesystem.exists(dir)) filesystem.delete(dir, true)
  }

  def lineage(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/_lineage")
}
