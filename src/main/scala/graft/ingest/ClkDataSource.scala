package graft.ingest

import java.util
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 for the reference's fixed-width binary CLK upload format
  * (S2; `encoding_storage.py:206-218` — `Hash-Count x Hash-Size` raw
  * bytes, entity ids positional). `spark.read.format("clk")
  * .option("encodingSize", 128).option("dp", 0).load(path)`.
  *
  * The scale reason this exists (vs the `binaryFile` whole-blob read):
  * splits are RECORD-ALIGNED BYTE RANGES, so one multi-TB dump file
  * parallelizes across the cluster like parquet row-groups would —
  * `splitBytes` (default 128 MiB) per partition, each reader seeking
  * straight to its offset. Entity ids are positional within their file
  * (offset / encodingSize), identical to the reference's convention and
  * invariant to the split layout.
  */
class ClkDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "clk"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ClkDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ClkTable(new CaseInsensitiveStringMap(properties))
}

object ClkDataSource {
  /** Same shape as [[graft.core.Record]]. */
  val Schema: StructType = StructType(Seq(
    StructField("dp", IntegerType, nullable = false),
    StructField("entity_id", LongType, nullable = false),
    StructField("clk", BinaryType, nullable = false),
    StructField("popcount", IntegerType, nullable = false)))
}

private[ingest] class ClkTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"clk:${options.get("path")}"
  override def schema(): StructType = ClkDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ClkScanBuilder(opts)
}

private[ingest] class ClkScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  private var required: StructType = ClkDataSource.Schema
  // Catalyst hands down the projected subset (table-schema order); the
  // scan then materializes ONLY those columns — `select(entity_id)` on a
  // multi-TB dump never allocates a clk buffer or runs popcount, and if
  // neither clk nor popcount is projected the reader never reads file
  // BYTES at all (ids are positional: offset / encodingSize).
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new ClkScan(options, required)
}

/** One record-aligned byte range of one file. */
private[ingest] case class ClkInputPartition(file: String, start: Long,
    length: Long, firstEntityId: Long, dp: Int, encodingSize: Int)
  extends InputPartition

private[ingest] class ClkScan(options: CaseInsensitiveStringMap,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ClkScan(path=${options.get("path")}, encodingSize=${options.get("encodingSize")}, " +
      s"ReadSchema=${required.fieldNames.mkString("[", ",", "]")})"

  private def spark = org.apache.spark.sql.SparkSession.active

  override def planInputPartitions(): Array[InputPartition] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("clk source requires a load path"))
    val size = Option(options.get("encodingSize")).map(_.toInt).getOrElse(
      throw new IllegalArgumentException(
        "clk source requires option encodingSize (bytes per CLK)"))
    require(size >= 1 && size <= 1024,
      s"encodingSize must be in [1,1024]: $size")
    val dp = Option(options.get("dp")).map(_.toInt).getOrElse(0)
    val splitBytes0 = Option(options.get("splitBytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    // align the split down to a whole number of records (>= 1)
    val splitBytes = math.max((splitBytes0 / size) * size, size.toLong)

    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    def files(st: FileStatus): Seq[FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filterNot(s => { val n = s.getPath.getName; n.startsWith(".") || n.startsWith("_") })
          .flatMap(files)
      else Seq(st)
    val all = files(fs.getFileStatus(p))
    all.flatMap { st =>
      val len = st.getLen
      require(len % size == 0,
        s"binary CLK file ${st.getPath} length $len not a multiple of $size")
      (0L until len by splitBytes).map { start =>
        ClkInputPartition(st.getPath.toString, start,
          math.min(splitBytes, len - start), start / size, dp, size)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    new ClkPartitionReaderFactory(conf, required)
  }
}

private[ingest] class ClkPartitionReaderFactory(
    conf: SerializableConfiguration, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[ClkInputPartition]
    val fields = required.fieldNames
    val needClk = fields.contains("clk")
    val needPc = fields.contains("popcount")
    new PartitionReader[InternalRow] {
      private val path = new Path(part.file)
      // neither clk nor popcount projected -> rows are pure arithmetic
      // (dp constant, ids positional); never open the file
      private val needBytes = needClk || needPc
      private val in = if (needBytes) {
        val s = path.getFileSystem(conf.value).open(path)
        s.seek(part.start)
        s
      } else null
      // popcount-only projection: reuse one buffer, no per-row allocation
      private val scratch = if (needBytes && !needClk)
        new Array[Byte](part.encodingSize) else null
      private val nRecords = part.length / part.encodingSize
      private var i = 0L
      private var row: InternalRow = _

      override def next(): Boolean =
        if (i >= nRecords) false
        else {
          val clk = if (needBytes) {
            val buf = if (needClk) new Array[Byte](part.encodingSize) else scratch
            in.readFully(buf)
            buf
          } else null
          val values = new Array[Any](fields.length)
          var f = 0
          while (f < fields.length) {
            values(f) = fields(f) match {
              case "dp" => part.dp
              case "entity_id" => part.firstEntityId + i
              case "clk" => clk
              case "popcount" => graft.core.BitOps.popcount(clk)
            }
            f += 1
          }
          row = new GenericInternalRow(values)
          i += 1
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = if (in != null) in.close()
    }
  }
}
