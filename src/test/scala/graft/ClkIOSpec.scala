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

  test("binary scan: single record file + 1k file") {
    val one = ClkIO.readBinary(spark, s"$fixturesDir/single_clk.bin", 0, 128)
    assert(one.count() == 1)
    val k = ClkIO.readBinary(spark, s"$fixturesDir/clks_128B_1k.bin", 1, 128)
    assert(k.count() == 1000)
    assert(k.filter(_.clk.length != 128).count() == 0)
  }
}
