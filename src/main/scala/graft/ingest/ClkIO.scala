package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Record
import graft.expr.popcount

/** Sources for the reference's upload wire formats (FIXTURES.md §A4).
  *
  * S2 binary scan: `Hash-Count x Hash-Size` raw bytes, entity ids assigned
  * by position (reference: `encoding_storage.py:206-218`,
  * `serialization.py:37-54`).
  *
  * S1 JSON scan: `{"clks":[b64,...]}` or `{"clknblocks":[[b64, block...],...]}`
  * or `{"encodings":[...],"blocks":{id:[...]}}`, all normalized to
  * clknblocks (reference: `views/util.py:18-43`, `encoding_storage.py:24-43`).
  */
object ClkIO {

  /** Read fixed-width binary CLK file(s) as a provider's records.
    * Entity ids are the record's position in its file. Delegates to the
    * [[ClkDataSource]] DataSourceV2 (`format("clk")`): splits are
    * record-aligned byte ranges, so even ONE multi-TB dump file
    * parallelizes across the cluster (the earlier `binaryFile` path read
    * each file as a single whole-blob task). */
  def readBinary(spark: SparkSession, path: String, dp: Int, encodingSize: Int): Dataset[Record] = {
    import spark.implicits._
    spark.read.format("clk")
      .option("dp", dp)
      .option("encodingSize", encodingSize)
      .load(path)
      .withColumnRenamed("entity_id", "entityId")
      .as[Record]
  }

  /** Normalize any of the three JSON upload formats to
    * `(entityId, clk binary, blocks array<string>)` for one provider.
    * Uses `spark.read.json` + `posexplode` so base64 decode and popcount
    * stay codegen'd columns. */
  def readJson(spark: SparkSession, path: String, dp: Int): DataFrame = {
    val raw = spark.read.option("multiLine", true).json(path)
    val cols = raw.columns.toSet
    val norm =
      if (cols.contains("clknblocks")) {
        // clknblocks: [[b64, block1, block2...], ...]
        raw.select(posexplode(col("clknblocks")).as(Seq("entity_id", "cb")))
          .select(col("entity_id").cast("long"),
            unbase64(element_at(col("cb"), 1)).as("clk"),
            slice(col("cb"), 2, Int.MaxValue).as("blocks"))
      } else if (cols.contains("clks")) {
        // clks: [b64, ...] -> default single block "1" (encoding_storage.py:21)
        raw.select(posexplode(col("clks")).as(Seq("entity_id", "b64")))
          .select(col("entity_id").cast("long"), unbase64(col("b64")).as("clk"),
            array(lit("1")).as("blocks"))
      } else if (cols.contains("encodings")) {
        // encodings + blocks map keyed by stringified entity id; the block
        // map has dynamic keys, so re-read with an explicit schema (schema
        // inference would type it as a struct of per-id fields)
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(
          StructField("encodings", ArrayType(StringType)),
          StructField("blocks", MapType(StringType, ArrayType(StringType)))))
        val typed = spark.read.option("multiLine", true).schema(schema).json(path)
        val enc = typed.select(posexplode(col("encodings")).as(Seq("entity_id", "b64")))
          .select(col("entity_id").cast("long"), unbase64(col("b64")).as("clk"))
        if (cols.contains("blocks")) {
          // the reference iterates the BLOCKS map's keys, so an encoding
          // absent from the map is dropped, not defaulted
          // (views/util.py:29-33) — hence inner join
          val blocks = typed.select(explode(col("blocks")).as(Seq("k", "v")))
            .select(col("k").cast("long").as("entity_id"), col("v").as("blocks"))
          enc.join(blocks, Seq("entity_id"))
        } else {
          // encodings only: every record lands in the default block "1"
          // (views/util.py:34-38)
          enc.withColumn("blocks", array(lit("1")))
        }
      } else {
        throw new IllegalArgumentException(
          s"unrecognized CLK upload format; columns: ${cols.mkString(",")}")
      }
    norm
      .withColumn("dp", lit(dp))
      .withColumn("popcount", popcount(col("clk")))
      .select("dp", "entity_id", "clk", "popcount", "blocks")
  }

  /** Encoding-size validation (P4): all CLKs of all providers must share
    * one size, in [1,1024], multiple of 8 (`tasks/pre_run_check.py:48-78`).
    * Returns the common size or throws. */
  /** P4 driver-visible form: per-record validation report instead of the
    * fail-fast require — the reference's pre-run check rejects an upload
    * listing WHICH encodings are malformed (`tasks/pre_run_check.py:48-78`
    * surfaces the mismatch in the run error); this returns one verdict
    * row per encoding so callers (and the driver oracle) see the exact
    * decision surface. Pure column algebra — codegen'd, no UDFs. */
  def validationReport(encodings: DataFrame, declaredSize: Int): DataFrame =
    encodings.select(col("entity_id"),
        length(col("clk")).cast("long").as("n_bytes"))
      .withColumn("matches_declared", col("n_bytes") === declaredSize)
      .withColumn("valid_standalone",
        col("n_bytes").between(1, 1024) && col("n_bytes") % 8 === 0)

  def validateEncodingSize(records: Dataset[Record]): Int = {
    import records.sparkSession.implicits._
    val sizes = records.select(length(col("clk")).as[Int]).distinct().collect()
    require(sizes.nonEmpty, "empty upload: no encodings present")
    require(sizes.length == 1,
      s"encodings must all have the same size; saw ${sizes.sorted.mkString(",")}")
    val s = sizes.head
    require(s >= 1 && s <= 1024 && s % 8 == 0,
      s"encoding size must be 8..1024 and a multiple of 8: $s")
    s
  }
}
