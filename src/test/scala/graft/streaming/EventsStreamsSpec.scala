package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.Tables

/** Streaming twins must agree with the batch queries: run with
  * Trigger.AvailableNow against the same parquet, compare results. */
class EventsStreamsSpec extends SparkSpec {
  import spark.implicits._

  // file-stream sources want a directory; stage the single parquet file
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events-stream")
    Files.copy(Paths.get(s"$sf001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("tumblingCounts (streaming) == batch groupBy at end of stream") {
    val q = EventsStreams.tumblingCounts(EventsStreams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("tumbling")
      .select("window_start", "event_type", "n", "total")
      .as[(java.sql.Timestamp, String, Long, java.math.BigDecimal)]
      .collect().map(r => (r._1, r._2, r._3, r._4.stripTrailingZeros)).toSet
    val batch = Tables.events(spark, sf001)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(14,2)")).as("total"))
      .as[(java.sql.Timestamp, String, Long, java.math.BigDecimal)]
      .collect().map(r => (r._1, r._2, r._3, r._4.stripTrailingZeros)).toSet
    assert(streamed == batch)
  }

  test("slidingCounts (streaming) == batch sliding window at end of stream") {
    val q = EventsStreams.slidingCounts(EventsStreams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("sliding")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sliding")
      .select("window_start", "event_type", "n", "total")
      .as[(java.sql.Timestamp, String, Long, java.math.BigDecimal)]
      .collect().map(r => (r._1, r._2, r._3, r._4.stripTrailingZeros)).toSet
    val batch = Tables.events(spark, sf001)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(14,2)")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
      .as[(java.sql.Timestamp, String, Long, java.math.BigDecimal)]
      .collect().map(r => (r._1, r._2, r._3, r._4.stripTrailingZeros)).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("sessionize (flatMapGroupsWithState) emits exactly the closed sessions") {
    val q = EventsStreams.sessionize(EventsStreams.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sessions")
      .as[(Long, Long, Int)].collect().toSet

    // batch sessions via the q36 lag+running-sum form
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val batchSessions = Tables.events(spark, sf001)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > 1800.0, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts").cast("long")).as("session_start"),
        count(lit(1)).cast("int").as("n_events"),
        max("session_id").as("sid"))
    val wLast = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val closed = batchSessions
      .withColumn("max_sid", max("session_id").over(wLast))
      .filter(col("session_id") < col("max_sid")) // last session per user stays open
      .select("user_id", "session_start", "n_events")
      .as[(Long, Long, Int)].collect().toSet
    assert(streamed == closed)
    assert(streamed.nonEmpty)
  }
}
