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
    extends ScanBuilder {
  override def build(): Scan = new ClkScan(options)
}

/** One record-aligned byte range of one file. */
private[ingest] case class ClkInputPartition(file: String, start: Long,
    length: Long, firstEntityId: Long, dp: Int, encodingSize: Int)
  extends InputPartition

private[ingest] class ClkScan(options: CaseInsensitiveStringMap)
    extends Scan with Batch {
  override def readSchema(): StructType = ClkDataSource.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"ClkScan(path=${options.get("path")}, encodingSize=${options.get("encodingSize")})"

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
    new ClkPartitionReaderFactory(conf)
  }
}

private[ingest] class ClkPartitionReaderFactory(
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[ClkInputPartition]
    new PartitionReader[InternalRow] {
      private val path = new Path(part.file)
      private val in = path.getFileSystem(conf.value).open(path)
      in.seek(part.start)
      private val nRecords = part.length / part.encodingSize
      private var i = 0L
      private var row: InternalRow = _

      override def next(): Boolean =
        if (i >= nRecords) false
        else {
          val clk = new Array[Byte](part.encodingSize)
          in.readFully(clk)
          row = new GenericInternalRow(Array[Any](
            part.dp, part.firstEntityId + i, clk,
            graft.core.BitOps.popcount(clk)))
          i += 1
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
