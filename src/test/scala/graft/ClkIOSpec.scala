package graft

import org.apache.spark.sql.functions._
import graft.ingest.ClkIO
import java.nio.file.Files

/** S1/S2 source coverage: the reference's three JSON upload formats
  * (`views/util.py:18-43`) + fixed-width binary. */
class ClkIOSpec extends SparkSpec {

  test("clknblocks format (reference fixture test_encoding.json)") {
    import spark.implicits._
    val df = ClkIO.readJson(spark, s"$fixturesDir/test_encoding.json", dp = 0).cache()
    assert(df.count() == 4)
    assert(df.columns.toSeq == Seq("dp", "entity_id", "clk", "popcount", "blocks"))
    // entity ids positional 0..3; fixture blocks: [1],[1],[1,2],[2]
    assert(df.select($"entity_id".as[Long]).collect().sorted.sameElements(Array(0L, 1L, 2L, 3L)))
    assert(df.where(array_contains($"blocks", "1")).count() == 3)
    assert(df.where(array_contains($"blocks", "2")).count() == 2)
    assert(df.where(length($"clk") === 128).count() == 4)
    assert(df.where($"popcount" <= 0).count() == 0)
  }

  test("clks format normalizes to default block '1'") {
    import spark.implicits._
    val dir = Files.createTempDirectory("clkio").toString
    val b64 = java.util.Base64.getEncoder.encodeToString(Array.fill[Byte](16)(0x0f))
    Files.writeString(java.nio.file.Paths.get(s"$dir/u.json"),
      s"""{"clks": ["$b64", "$b64", "$b64"]}""")
    val df = ClkIO.readJson(spark, s"$dir/u.json", dp = 2)
    assert(df.count() == 3)
    val r = df.orderBy("entity_id").collect()(1)
    assert(r.getAs[Int]("dp") == 2)
    assert(r.getSeq[String](r.fieldIndex("blocks")).toSeq == Seq("1"))
    assert(r.getAs[Int]("popcount") == 64)
  }

  test("encodings+blocks format joins the external block map") {
    import spark.implicits._
    val dir = Files.createTempDirectory("clkio2").toString
    val b64 = java.util.Base64.getEncoder.encodeToString(Array.fill[Byte](8)(1))
    Files.writeString(java.nio.file.Paths.get(s"$dir/u.json"),
      s"""{"encodings": ["$b64", "$b64"], "blocks": {"0": ["x", "y"], "1": ["z"]}}""")
    val df = ClkIO.readJson(spark, s"$dir/u.json", dp = 0).orderBy("entity_id").collect()
    assert(df(0).getSeq[String](df(0).fieldIndex("blocks")).toSeq == Seq("x", "y"))
    assert(df(1).getSeq[String](df(1).fieldIndex("blocks")).toSeq == Seq("z"))
  }

  test("encodings+blocks: an encoding absent from the map is dropped (views/util.py:29-33)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("clkio3").toString
    val b64 = java.util.Base64.getEncoder.encodeToString(Array.fill[Byte](8)(1))
    // three encodings, map covers only ids 0 and 2 — the reference builds
    // clknblocks by iterating the MAP's keys, so id 1 never appears
    Files.writeString(java.nio.file.Paths.get(s"$dir/u.json"),
      s"""{"encodings": ["$b64", "$b64", "$b64"], "blocks": {"0": ["x"], "2": ["y"]}}""")
    val df = ClkIO.readJson(spark, s"$dir/u.json", dp = 0).orderBy("entity_id").collect()
    assert(df.map(_.getAs[Long]("entity_id")).toSeq == Seq(0L, 2L))
    assert(df(1).getSeq[String](df(1).fieldIndex("blocks")).toSeq == Seq("y"))
  }

  test("encodings without blocks key defaults every record to block '1'") {
    import spark.implicits._
    val dir = Files.createTempDirectory("clkio4").toString
    val b64 = java.util.Base64.getEncoder.encodeToString(Array.fill[Byte](8)(1))
    Files.writeString(java.nio.file.Paths.get(s"$dir/u.json"),
      s"""{"encodings": ["$b64", "$b64"]}""")
    val df = ClkIO.readJson(spark, s"$dir/u.json", dp = 0).orderBy("entity_id").collect()
    assert(df.length == 2)
    assert(df.forall(r => r.getSeq[String](r.fieldIndex("blocks")).toSeq == Seq("1")))
  }

  test("binary scan: single record file + 1k file") {
    val one = ClkIO.readBinary(spark, s"$fixturesDir/single_clk.bin", 0, 128)
    assert(one.count() == 1)
    val k = ClkIO.readBinary(spark, s"$fixturesDir/clks_128B_1k.bin", 1, 128)
    assert(k.count() == 1000)
    assert(k.filter(_.clk.length != 128).count() == 0)
  }

  test("clk DataSourceV2: record-aligned splits, layout-invariant result") {
    import spark.implicits._
    // force many small splits (1000 x 128 B file, 4 KiB splits -> 32
    // record-aligned ranges) and check bytes + positional ids match the
    // single-split read exactly
    def read(splitBytes: Long) = spark.read.format("clk")
      .option("dp", 1).option("encodingSize", 128)
      .option("splitBytes", splitBytes)
      .load(s"$fixturesDir/clks_128B_1k.bin")
      .select($"entity_id", base64($"clk").as("b64"), $"popcount")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    val whole = read(1L << 30)
    val split = read(4096)
    assert(whole.length == 1000 && split.sameElements(whole))
    val parts = spark.read.format("clk")
      .option("dp", 1).option("encodingSize", 128).option("splitBytes", 4096)
      .load(s"$fixturesDir/clks_128B_1k.bin").rdd.getNumPartitions
    assert(parts == 32, s"expected 32 record-aligned splits, got $parts")
    // missing encodingSize is a clear planning error
    val e = intercept[Exception] {
      spark.read.format("clk").load(s"$fixturesDir/single_clk.bin").count()
    }
    assert(e.getMessage.contains("encodingSize") ||
      Option(e.getCause).exists(_.getMessage.contains("encodingSize")))
  }

  // --- negative-path battery (the reference's upload edge cases,
  // --- e2etests/tests/test_project_uploads.py) ---

  test("binary upload whose length is not a multiple of the encoding size fails") {
    val dir = Files.createTempDirectory("clkio-neg").toString
    Files.write(java.nio.file.Paths.get(s"$dir/bad.bin"), new Array[Byte](300))
    // V2 source: the length check fires at split planning (driver side)
    val e = intercept[Exception] {
      ClkIO.readBinary(spark, s"$dir/bad.bin", 0, 128).count()
    }
    assert(e.getMessage.contains("not a multiple") ||
      Option(e.getCause).exists(_.getMessage.contains("not a multiple")))
  }

  test("mixed encoding sizes across providers are rejected") {
    import spark.implicits._
    val a = ClkIO.readBinary(spark, s"$fixturesDir/single_clk.bin", 0, 128)
    val b = spark.createDataset(Seq(graft.core.Record(1, 0L, Array.fill[Byte](64)(1), 64)))
    val e = intercept[IllegalArgumentException] {
      ClkIO.validateEncodingSize(a.union(b))
    }
    assert(e.getMessage.contains("same size"))
  }

  test("encoding sizes outside [8,1024] or non-multiples of 8 are rejected") {
    import spark.implicits._
    def rec(n: Int) =
      spark.createDataset(Seq(graft.core.Record(0, 0L, Array.fill[Byte](n)(1), n)))
    for (bad <- Seq(4, 1032, 129)) {
      val e = intercept[IllegalArgumentException] { ClkIO.validateEncodingSize(rec(bad)) }
      assert(e.getMessage.contains("multiple of 8"), s"size $bad: ${e.getMessage}")
    }
    assert(ClkIO.validateEncodingSize(rec(8)) == 8)
  }

  test("empty upload is rejected with a clear message") {
    import spark.implicits._
    val empty = spark.emptyDataset[graft.core.Record]
    val e = intercept[IllegalArgumentException] { ClkIO.validateEncodingSize(empty) }
    assert(e.getMessage.contains("empty upload"))
  }

  test("empty clks array yields zero rows (rejected downstream)") {
    val dir = Files.createTempDirectory("clkio-neg2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/u.json"), """{"clks": []}""")
    assert(ClkIO.readJson(spark, s"$dir/u.json", dp = 0).count() == 0)
  }

  test("unrecognized upload format is rejected") {
    val dir = Files.createTempDirectory("clkio-neg3").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/u.json"), """{"bogus": [1,2]}""")
    val e = intercept[IllegalArgumentException] {
      ClkIO.readJson(spark, s"$dir/u.json", dp = 0)
    }
    assert(e.getMessage.contains("unrecognized"))
  }

  test("validationReport flags per-record size verdicts on the mixed fixture") {
    val rep = ClkIO.validationReport(
        ClkIO.readJson(spark, s"$fixturesDir/test_encodings_mixed.json", 0), 128)
      .orderBy("entity_id").collect()
    assert(rep.length == 16)
    val byId = rep.map(r => r.getAs[Long]("entity_id") ->
      (r.getAs[Long]("n_bytes"), r.getAs[Boolean]("matches_declared"),
        r.getAs[Boolean]("valid_standalone"))).toMap
    (0L to 9L).foreach(i => assert(byId(i) == ((128L, true, true))))
    assert(byId(10L) == ((64L, false, true)))   // valid size, wrong declared
    assert(byId(12L) == ((96L, false, true)))
    assert(byId(13L) == ((20L, false, false)))  // not a multiple of 8
    assert(byId(14L) == ((1024L, false, true))) // upper edge inclusive
    assert(byId(15L) == ((1032L, false, false))) // out of range
  }
}
