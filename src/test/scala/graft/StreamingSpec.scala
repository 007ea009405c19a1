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

  test("append mode emits exactly the watermark-finalized windows") {
    import spark.implicits._
    // batch 1: events on day 1 and day 2; batch 2: one event on day 5.
    // watermark = maxTs - 2 days = day 3 after batch 2, so the day-1 and
    // day-2 windows finalize; the day-5 window must NOT be emitted.
    val dir = java.nio.file.Files.createTempDirectory("wm").toString
    def ev(day: Int, typ: String, v: Double) =
      (java.sql.Timestamp.valueOf(f"2024-01-0$day 12:00:00"), typ, v)
    val in = s"$dir/stream"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def write(name: String, rows: Seq[(java.sql.Timestamp, String, Double)]): Unit = {
      val tmp = s"$dir/$name-tmp"
      rows.toDF("ts", "event_type", "value").coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath, java.nio.file.Paths.get(s"$in/$name.parquet"))
    }
    write("f1", Seq(ev(1, "a", 1.0), ev(1, "a", 2.0), ev(2, "b", 3.0)))
    write("f2", Seq(ev(5, "a", 9.0)))
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = EventStream.windowedRates(stream)
      .writeStream.outputMode("append").format("memory").queryName("wm_windows")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wm_windows")
      .select($"window_start".as[Long], $"event_type".as[String],
        $"n".as[Long], $"sum_value".as[Double]).collect().toSet
    def epoch(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-0$day 00:00:00").getTime / 1000
    assert(got == Set((epoch(1), "a", 2L, 3.0), (epoch(2), "b", 1L, 3.0)), got.toString)
  }

  test("streaming session windows: append emits exactly the finalized sessions") {
    import spark.implicits._
    val q = EventStream.sessionWindows(
        EventStream.parquetStream(spark, s"$sfTiny/events.parquet"),
        gap = "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("ssw")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    val got = spark.table("ssw")
      .select($"user_id".as[Long], $"start_us".as[Long], $"end_us".as[Long],
        $"n_events".as[Long]).collect().toSet
    // local rule: split per user on gaps >= 30 min; a session finalizes
    // only when its end (last event + gap) <= the global max event time
    val rows = spark.read.parquet(s"$sfTiny/events.parquet")
      .select($"user_id".as[Long],
        unix_micros($"ts".cast("timestamp")).as[Long]).collect()
    val gapUs = 1800L * 1000000
    val maxT = rows.map(_._2).max
    val want = rows.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val ts = rs.map(_._2).sorted
      val sessions = ts.foldLeft(List.empty[List[Long]]) {
        case (acc, t) if acc.nonEmpty && t - acc.head.head < gapUs =>
          (t :: acc.head) :: acc.tail
        case (acc, t) => List(t) :: acc
      }
      sessions.map(s => (u, s.min, s.max + gapUs, s.size.toLong))
    }.filter(_._3 <= maxT).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("approx_count_distinct (HLL sketch path) tracks exact daily distincts") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfTiny/events.parquet")
    val both = ev.groupBy(date_trunc("day", $"ts").as("d"))
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id").as("approx"))
      .select($"exact".as[Long], $"approx".as[Long]).collect()
    assert(both.nonEmpty)
    both.foreach { case (e, a) =>
      assert(math.abs(a - e).toDouble <= math.max(1.0, e * 0.05),
        s"sketch error too high: approx=$a exact=$e")
    }
  }

  test("sigmaOutliers: integer test == local BigInt z-score brute force") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfTiny/events.parquet")
    val got = EventStream.sigmaOutliers(ev, "user_id", "event_id", "value", k = 2)
      .select($"key".as[Long], $"id".as[Long], $"v".as[Long]).collect().toSet
    val rows = ev.select($"user_id".as[Long], $"event_id".as[Long],
      $"value".as[Double]).collect()
      .map { case (u, e, x) => (u, e, math.floor(x * 100).toLong) }
    val want = rows.groupBy(_._1).values.flatMap { rs =>
      val n = BigInt(rs.length)
      val s = rs.map(r => BigInt(r._3)).sum
      val ss = rs.map(r => BigInt(r._3) * r._3).sum
      rs.filter { case (_, _, v) =>
        val d = n * v - s
        d * d > 4 * (n * ss - s * s)
      }
    }.toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture yields no 2-sigma outliers")
    assert(want.size < rows.length / 10, "outliers should be rare")
  }

  test("stream-stream interval join over incremental batches == batch join") {
    import spark.implicits._
    // stage events as 4 files: both sides see 4 micro-batches, so joined
    // pairs must survive cross-batch state (a view buffered in batch 1
    // matching a click that only arrives in batch 4)
    val dir = java.nio.file.Files.createTempDirectory("ssj").toString
    spark.read.parquet(s"$sfTiny/events.parquet")
      .repartition(4).write.mode("overwrite").parquet(dir)
    def side(t: String) =
      EventStream.parquetStream(spark, dir).where($"event_type" === t)
    val q = EventStream.intervalJoinStream(side("view"), side("click"),
        "user_id", "ts", "event_id", windowSeconds = 14400,
        watermark = "60 days")
      .writeStream.outputMode("append").format("memory").queryName("ssj")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    val streamed = spark.table("ssj")
      .select($"key".as[Long], $"left_id".as[Long], $"right_id".as[Long],
        $"lag_us".as[Long]).collect().toSet
    // batch oracle: same operator over the batch DataFrames
    val ev = spark.read.parquet(s"$sfTiny/events.parquet")
    val batch = EventStream.intervalJoinStream(
        ev.where($"event_type" === "view"),
        ev.where($"event_type" === "click"),
        "user_id", "ts", "event_id", 14400)
      .select($"key".as[Long], $"left_id".as[Long], $"right_id".as[Long],
        $"lag_us".as[Long]).collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture yields no view→click pairs")
    // every lag honors the [0, window] contract
    assert(batch.forall(t => t._4 >= 0 && t._4 <= 14400L * 1000000))
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

  test("streaming linkage over incremental batches == batch kernel edges") {
    import spark.implicits._
    val a = graft.ingest.ClkIO.readBinary(spark, s"$fixturesDir/febrl4_a.bin", 0, 128)
    val b = graft.ingest.ClkIO.readBinary(spark, s"$fixturesDir/febrl4_b.bin", 1, 128)
    val statics = graft.link.Pipeline.defaultBlock(a)
    // stage dp=1 as a 3-file dir -> 3 micro-batches
    val dir = java.nio.file.Files.createTempDirectory("slink").toString
    graft.link.Pipeline.defaultBlock(b).repartition(3)
      .write.mode("overwrite").parquet(dir)
    val q = EventStream.streamingLinkage(
        EventStream.parquetStream(spark, dir), statics, threshold = 0.8)
      .writeStream.outputMode("append").format("memory").queryName("slink_edges")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("slink_edges")
      .select($"sim".as[Double], $"dp0".as[Int], $"rec0".as[Long],
        $"dp1".as[Int], $"rec1".as[Long]).collect().toSet
    val batch = graft.link.Pipeline.edges(
        graft.link.Pipeline.defaultBlock(a.union(b)),
        graft.core.LinkConfig(threshold = 0.8))
      .collect().map(e => (e.sim, e.dp0, e.rec0, e.dp1, e.rec1)).toSet
    assert(got == batch, s"stream ${got.size} vs batch ${batch.size}")
    assert(got.size == 946)
  }

  test("dropDuplicatesWithinWatermark wrapper: in-batch + cross-batch dedup, evicted key re-emits") {
    import spark.implicits._
    // delay 1 day; state deadline = first-seen event time + delay (FIXED,
    // not refreshed); watermark for batch N = max event time through
    // batch N-1 minus delay:
    //   f1: a@day1 x2     -> emit a once; deadline day2 noon
    //   f2: b@day5, a@day5 -> wm=day0: a alive -> a dropped; emit b
    //   f3: c@day9        -> wm=day4 > day2: a evicted; emit c
    //   f4: a@day9 18:00  -> wm=day8: a re-emits
    val dir = java.nio.file.Files.createTempDirectory("ddwm").toString
    val in = s"$dir/stream"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def write(name: String, rows: Seq[(String, String)]): Unit = {
      val tmp = s"$dir/$name-tmp"
      rows.map { case (k, d) => (k, java.sql.Timestamp.valueOf(d)) }
        .toDF("k", "ts").coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$in/$name.parquet"))
    }
    write("f1", Seq(("a", "2024-01-01 12:00:00"), ("a", "2024-01-01 13:00:00")))
    write("f2", Seq(("b", "2024-01-05 12:00:00"), ("a", "2024-01-05 12:00:00")))
    write("f3", Seq(("c", "2024-01-09 12:00:00")))
    write("f4", Seq(("a", "2024-01-09 18:00:00")))
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = EventStream.dedupKeysWithinWatermark(stream, "k", "ts", "1 day")
      .writeStream.outputMode("append").format("memory").queryName("ddw_keys")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ddw_keys").as[String].collect().toList
    assert(got.sorted == List("a", "a", "b", "c"),
      s"expected evicted 'a' to re-emit and live 'a' to dedup, got $got")
  }

  test("TTL first-seen dedup: watermark-expired keys re-emit; batch parity") {
    import spark.implicits._
    // Event-time TTL = 1 day, watermark delay 0. Timeline (one query run,
    // one file per micro-batch; the watermark for batch N is the max
    // event time through batch N-1):
    //   f1: a@day1        -> emit a, deadline day2
    //   f2: b@day5        -> wm=day1: a alive; emit b
    //   f3: c@day9        -> wm=day5 > day2: a EXPIRES; emit c
    //   f4: a@day9 18:00  -> wm=day9: a re-emits (state was released)
    val dir = java.nio.file.Files.createTempDirectory("fsdttl").toString
    val in = s"$dir/stream"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def write(name: String, rows: Seq[(String, String)]): Unit = {
      val tmp = s"$dir/$name-tmp"
      rows.map { case (k, d) => (k, java.sql.Timestamp.valueOf(d)) }
        .toDF("k", "ts").coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath, java.nio.file.Paths.get(s"$in/$name.parquet"))
    }
    write("f1", Seq(("a", "2024-01-01 12:00:00"), ("a", "2024-01-01 13:00:00")))
    write("f2", Seq(("b", "2024-01-05 12:00:00")))
    write("f3", Seq(("c", "2024-01-09 12:00:00")))
    write("f4", Seq(("a", "2024-01-09 18:00:00")))
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = EventStream.firstSeenKeysTtl(stream, "k", "ts", 24L * 3600 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("ttl_keys")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ttl_keys").as[String].collect().toList
    assert(got.sorted == List("a", "a", "b", "c"),
      s"expected expired key 'a' to re-emit after event-time TTL, got $got")
    // batch parity: over a bounded Dataset timeouts never fire -> exactly
    // firstSeenKeys semantics (one row per distinct key)
    val batchTtl = EventStream.firstSeenKeysTtl(
      spark.read.parquet(in), "k", "ts", 24L * 3600 * 1000).collect().toList
    assert(batchTtl.sorted == List("a", "b", "c"))
  }
}
