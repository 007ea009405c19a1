package graft

import org.apache.spark.sql.functions._
import graft.core.{BinaryCodec, ClusterMember, Edge}
import graft.io.Export
import java.nio.file.Files

class BinaryCodecSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("pack/unpack round-trip, byte layout parity (!I{n}s)") {
    val clk = Array.tabulate[Byte](16)(i => (i * 7).toByte)
    val packed = BinaryCodec.pack(0xdeadbeefL, clk)
    assert(packed.length == 20)
    // big-endian uint32 prefix
    assert((packed(0) & 0xff) == 0xde && (packed(1) & 0xff) == 0xad &&
      (packed(2) & 0xff) == 0xbe && (packed(3) & 0xff) == 0xef)
    val (id, clk2) = BinaryCodec.unpack(packed)
    assert(id == 0xdeadbeefL && clk2.sameElements(clk))
    val all = BinaryCodec.packAll(Iterator((0L, clk), (1L, clk), (42L, clk)), 16)
    val back = BinaryCodec.unpackAll(all, 16).toSeq
    assert(back.map(_._1) == Seq(0L, 1L, 42L))
    assert(back.forall(_._2.sameElements(clk)))
    intercept[IllegalArgumentException](BinaryCodec.pack(-1L, clk))
    intercept[IllegalArgumentException](BinaryCodec.unpackAll(new Array[Byte](21), 16).toSeq)
  }
}

class ExportSpec extends SparkSpec {
  test("groups JSON export: wire shape, ordered members, one row per cluster") {
    import spark.implicits._
    val clusters = spark.createDataset(Seq(
      ClusterMember(10L, 1, 5L), ClusterMember(10L, 0, 3L),
      ClusterMember(20L, 0, 7L), ClusterMember(20L, 2, 1L), ClusterMember(20L, 1, 9L)))
    val dir = Files.createTempDirectory("groups").toString + "/out"
    Export.writeGroupsJson(clusters, dir)
    val lines = spark.read.text(dir).as[String].collect().sorted
    assert(lines.length == 2)
    assert(lines.contains("""{"group":[[0,3],[1,5]]}"""))
    assert(lines.contains("""{"group":[[0,7],[1,9],[2,1]]}"""))
  }

  test("scores export is globally ordered by descending similarity") {
    import spark.implicits._
    val edges = spark.createDataset(Seq(
      Edge(0.81, 0, 1L, 1, 2L), Edge(0.99, 0, 5L, 1, 6L), Edge(0.9, 0, 3L, 1, 4L)))
    val sims = Export.scoresFrame(edges).select($"sim".as[Double]).collect()
    assert(sims.sameElements(Array(0.99, 0.9, 0.81)))
  }

  test("scores CSV wire format round-trips (rec0,rec1,sim — utils.py:162-178)") {
    import spark.implicits._
    val edges = Seq(Edge(0.875, 0, 1L, 1, 2L), Edge(0.9921875, 0, 5L, 1, 6L))
    val ds = spark.createDataset(edges)
    val dir = Files.createTempDirectory("scorescsv").toString + "/out"
    Export.writeScoresCsv(ds, dir)
    val lines = spark.read.text(dir).as[String].collect()
    // reference parser does row.split(',') -> (rec0, rec1, sim)
    assert(lines.forall(_.split(",").length == 3))
    assert(lines.contains("5,6,0.9921875"))
    val back = Export.readScoresCsv(spark, dir).collect().toSet
    assert(back == edges.toSet)
  }

  test("top-k per-record candidate cap (anonlink k parity)") {
    import spark.implicits._
    val edges = spark.createDataset(Seq(
      Edge(0.99, 0, 1L, 1, 10L), Edge(0.95, 0, 1L, 1, 11L), Edge(0.90, 0, 1L, 1, 12L),
      Edge(0.85, 0, 2L, 1, 10L)))
    val capped = graft.link.Linker.capTopKPerRecord(edges, 2).collect().toSet
    assert(capped == Set(
      Edge(0.99, 0, 1L, 1, 10L), Edge(0.95, 0, 1L, 1, 11L), Edge(0.85, 0, 2L, 1, 10L)))
    // pipeline plumbing: cfg.topKPerRecord caps the scored stream
    val a = graft.ingest.ClkIO.readBinary(spark, s"$fixturesDir/febrl4_a.bin", 0, 128)
      .filter(_.entityId < 200)
    val b = graft.ingest.ClkIO.readBinary(spark, s"$fixturesDir/febrl4_b.bin", 1, 128)
      .filter(_.entityId < 200)
    val blocked = graft.link.Pipeline.defaultBlock(a.union(b))
    val cfgK = graft.core.LinkConfig(threshold = 0.5, topKPerRecord = Some(1))
    val cappedRun = graft.link.Linker.scoreCandidates(blocked, cfgK).toDF()
    val perLeft = cappedRun.groupBy("dp0", "rec0").count()
    assert(perLeft.where($"count" > 1).count() == 0)
    assert(cappedRun.count() > 0)
  }

  test("Formats round-trip: orc and json partitioned layouts are lossless") {
    import spark.implicits._
    val src = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select($"doc_id", $"lang", $"n_chars")
    val want = src.as[(Long, String, Long)].collect().toSet
    for (fmt <- Seq("orc", "json")) {
      val back = graft.io.Formats.roundTrip(src,
        s"/tmp/graft_fmt_rt_$fmt", fmt, "lang")
      assert(back.columns.toSeq == src.columns.toSeq, fmt)
      assert(back.schema == src.schema, s"$fmt schema drifted: ${back.schema}")
      val got = back.as[(Long, String, Long)].collect().toSet
      assert(got == want, s"$fmt round-trip lost rows")
    }
  }
}
