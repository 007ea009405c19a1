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
}
