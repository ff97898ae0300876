package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.TemporalStreams

/** Soak probe for the streaming temporal twins (dev-only, like
  * AqeSkewProbe/SimhashProbe):
  * `sbt 'Test/runMain graft.TemporalStreamSoak <sfDir>'`.
  *
  * Shapes both streams from the events table — as-of: every 10th event
  * is a "signal" (right side), the rest join to their latest preceding
  * signal per user; range: every 100th event opens a 60 s interval, all
  * events land in the intervals covering them — runs each twin with
  * AvailableNow into a parquet sink, and prints wall time + output rows.
  * Run at sf0.1 and the sf1 soak dir to compare ratios.
  */
object TemporalStreamSoak {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id").cast("string").as("k"),
        col("event_type"))
    val n = events.count()

    // ---- as-of twin ----
    val stage = Files.createTempDirectory("tss").toString
    events.filter(col("event_id") % 10 === 0)
      .select(col("k"), col("ts"), col("event_type").as("payload"))
      .write.mode("overwrite").parquet(s"$stage/right")
    events.filter(col("event_id") % 10 =!= 0)
      .select(col("k"), col("ts"), col("event_type").as("payload"))
      .write.mode("overwrite").parquet(s"$stage/left")

    var t0 = System.nanoTime()
    val q1 = TemporalStreams.asofJoinStream(
        spark.readStream.schema("k STRING, ts TIMESTAMP, payload STRING")
          .parquet(s"$stage/left"),
        spark.readStream.schema("k STRING, ts TIMESTAMP, payload STRING")
          .parquet(s"$stage/right"),
        horizon = "1 hour")
      .writeStream.format("parquet")
      .option("path", s"$stage/asof_out")
      .option("checkpointLocation", s"$stage/asof_ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(600000)
    val asofRows = spark.read.parquet(s"$stage/asof_out").count()
    println(f"[soak] asofJoinStream $dir: events=$n out=$asofRows " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")

    // ---- range twin ----
    events.select(col("event_id").as("pid"), col("ts").as("pt"))
      .write.mode("overwrite").parquet(s"$stage/points")
    events.filter(col("event_id") % 100 === 0)
      .select(col("event_id").as("iid"), col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 60 SECONDS")).as("hi"))
      .write.mode("overwrite").parquet(s"$stage/intervals")

    t0 = System.nanoTime()
    val q2 = TemporalStreams.rangeJoinStream(
        spark.readStream.schema("pid BIGINT, pt TIMESTAMP").parquet(s"$stage/points"), "pt",
        spark.readStream.schema("iid BIGINT, lo TIMESTAMP, hi TIMESTAMP")
          .parquet(s"$stage/intervals"),
        "lo", "hi", bucketWidth = 64L, maxWidth = 60L, horizon = "10 minutes")
      .select("pid", "iid")
      .writeStream.format("parquet")
      .option("path", s"$stage/range_out")
      .option("checkpointLocation", s"$stage/range_ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(600000)
    val rangeRows = spark.read.parquet(s"$stage/range_out").count()
    println(f"[soak] rangeJoinStream $dir: events=$n out=$rangeRows " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")

    spark.stop()
  }
}
