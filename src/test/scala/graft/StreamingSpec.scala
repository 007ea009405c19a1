package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming windowed rates == batch windowed rates over events") {
    import spark.implicits._
    val path = s"$sfTiny/events.parquet"
    val q = EventStream.streamFromParquet(spark, path, "ev_rates")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ev_rates")
      .select($"window_start".as[Long], $"event_type".as[String],
        $"n".as[Long], $"sum_value".as[Double]).collect().toSet
    val batch = EventStream.windowedRates(spark.read.parquet(path))
      .select($"window_start".as[Long], $"event_type".as[String],
        $"n".as[Long], $"sum_value".as[Double]).collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stateful first-seen dedup emits each key once across incremental batches") {
    import spark.implicits._
    // two parquet files with overlapping keys -> two micro-batches; keys
    // crossing the batch boundary must still emit exactly once (state)
    val dir = java.nio.file.Files.createTempDirectory("fsd").toString
    Seq("a", "b", "c").toDF("k").coalesce(1).write.parquet(s"$dir/in1")
    Seq("b", "c", "d").toDF("k").coalesce(1).write.parquet(s"$dir/in2")
    val in = s"$dir/stream"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def move(src: String, name: String): Unit = {
      val f = new java.io.File(src).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath, java.nio.file.Paths.get(s"$in/$name"))
    }
    move(s"$dir/in1", "f1.parquet")
    move(s"$dir/in2", "f2.parquet")
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = EventStream.firstSeenKeys(stream, "k")
      .writeStream.outputMode("append").format("memory").queryName("fsd_keys")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("fsd_keys").as[String].collect().toList
    assert(got.sorted == List("a", "b", "c", "d"), got.toString)
    assert(got.distinct.size == got.size, "a key was emitted twice")
    // batch semantics agree (one row per distinct key)
    val batchGot = EventStream.firstSeenKeys(
      spark.read.parquet(in), "k").collect().toList
    assert(batchGot.sorted == List("a", "b", "c", "d"))
  }
}
