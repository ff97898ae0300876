package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.TemporalJoins

/** The temporal joins' streaming twins must agree with their batch forms:
  * same matched pairs for the interval join, same as-of matches row for
  * row — including across micro-batches when rights precede lefts. */
class TemporalStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // ---- rangeJoinStream ----------------------------------------------------

  test("streaming range join == batch rangeJoin on a one-batch corpus") {
    def tsm(sec: Long, ms: Long) = new java.sql.Timestamp(sec * 1000L + ms)
    val base = 1_700_000_000L
    // sub-second offsets on BOTH sides: the match semantics are
    // second-granular like the batch twin's cast("long") exprs, and the
    // bucket ids must use the same truncation as the predicates
    val points = (0 until 200).map(i =>
      (i.toLong, tsm(base + (i * 37) % 1000, (i * 131) % 1000))).toDF("pid", "pt")
    val intervals = (0 until 40).map { i =>
      val lo = base + (i * 53) % 950
      (1000L + i, tsm(lo, (i * 173) % 1000),
        tsm(lo + 5 + (i * 7) % 80, (i * 89) % 1000)) // widths 5..84 < 90s
    }.toDF("iid", "lo", "hi")

    val pDir = Files.createTempDirectory("rjs-points").toString
    val iDir = Files.createTempDirectory("rjs-intervals").toString
    points.coalesce(1).write.mode("overwrite").parquet(pDir)
    intervals.coalesce(1).write.mode("overwrite").parquet(iDir)

    val q = TemporalStreams.rangeJoinStream(
        spark.readStream.schema("pid BIGINT, pt TIMESTAMP").parquet(pDir), "pt",
        spark.readStream.schema("iid BIGINT, lo TIMESTAMP, hi TIMESTAMP").parquet(iDir),
        "lo", "hi", bucketWidth = 64L, maxWidth = 90L, horizon = "10 minutes")
      .select("pid", "iid")
      .writeStream.format("memory").queryName("range_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.table("range_stream").as[(Long, Long)].collect().toSet
    val want = TemporalJoins.rangeJoin(
        points, col("pt").cast("long"),
        intervals, col("lo").cast("long"), col("hi").cast("long"), bucketWidth = 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === want, "streaming interval join matched different pairs than batch")
    assert(got.nonEmpty)
  }

  test("rangeJoinStream rejects shared column names") {
    val d1 = Files.createTempDirectory("rjs-shared1").toString
    val d2 = Files.createTempDirectory("rjs-shared2").toString
    Seq((ts(0L), 1L)).toDF("t", "x").write.mode("overwrite").parquet(d1)
    Seq((ts(0L), ts(1L), 2L)).toDF("lo", "hi", "x").write.mode("overwrite").parquet(d2)
    val p = spark.readStream.schema("t TIMESTAMP, x BIGINT").parquet(d1)
    val i = spark.readStream.schema("lo TIMESTAMP, hi TIMESTAMP, x BIGINT").parquet(d2)
    assertThrows[IllegalArgumentException] {
      TemporalStreams.rangeJoinStream(p, "t", i, "lo", "hi", 60L, 60L, "1 minute")
    }
  }

  // ---- asofJoinStream -----------------------------------------------------

  private def asofData: (DataFrame, DataFrame) = {
    val base = 1_700_000_000L
    val left = (0 until 300).map { i =>
      (s"k${i % 7}", ts(base + (i * 31) % 500), s"L$i")
    }.toDF("k", "ts", "payload")
    val right = (0 until 150).map { i =>
      (s"k${i % 7}", ts(base + (i * 17) % 500), s"R$i")
    }.toDF("k", "ts", "payload")
      // batch asofJoin contract: unique per (key, time)
      .groupBy("k", "ts").agg(max("payload").as("payload"))
    (left, right)
  }

  private def batchAsof(left: DataFrame, right: DataFrame): Set[(String, Long, String, Option[Long], Option[String])] =
    TemporalJoins.asofJoin(
        left, right.withColumnRenamed("ts", "rts").withColumnRenamed("payload", "rpayload"),
        Seq("k"), "ts", "rts")
      .select(col("k"), col("ts").cast("long"), col("payload"),
        col("rts").cast("long"), col("rpayload"))
      .as[(String, Long, String, Option[Long], Option[String])].collect().toSet

  private def streamedAsof(name: String): Set[(String, Long, String, Option[Long], Option[String])] =
    spark.table(name)
      .select(col("k"), col("ts").cast("long"), col("payload"),
        col("rt").cast("long"), col("rpayload"))
      .as[(String, Long, String, Option[Long], Option[String])].collect().toSet

  test("streaming as-of join == batch asofJoin on a one-batch corpus") {
    val (left, right) = asofData
    val lDir = Files.createTempDirectory("asof-left").toString
    val rDir = Files.createTempDirectory("asof-right").toString
    left.coalesce(1).write.mode("overwrite").parquet(lDir)
    right.coalesce(1).write.mode("overwrite").parquet(rDir)

    val q = TemporalStreams.asofJoinStream(
        spark.readStream.schema("k STRING, ts TIMESTAMP, payload STRING").parquet(lDir),
        spark.readStream.schema("k STRING, ts TIMESTAMP, payload STRING").parquet(rDir),
        horizon = "10 minutes")
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = streamedAsof("asof_stream")
    val want = batchAsof(left, right)
    assert(got === want, "streaming as-of matched differently than batch")
    assert(got.exists(_._4.isDefined) && got.exists(_._4.isEmpty),
      "fixture must cover both matched and unmatched lefts")
  }

  test("streaming as-of join == batch across micro-batches (rights arrive first)") {
    val (left, right) = asofData
    val lDir = Files.createTempDirectory("asof2-left").toString
    val rDir = Files.createTempDirectory("asof2-right").toString
    val ckpt = Files.createTempDirectory("asof2-ckpt").toString
    // batch 1: rights only (empty left dir with schema from an empty write)
    left.limit(0).coalesce(1).write.mode("overwrite").parquet(lDir)
    right.coalesce(1).write.mode("overwrite").parquet(rDir)

    def run(): Unit = {
      val q = TemporalStreams.asofJoinStream(
          spark.readStream.schema("k STRING, ts TIMESTAMP, payload STRING").parquet(lDir),
          spark.readStream.schema("k STRING, ts TIMESTAMP, payload STRING").parquet(rDir),
          horizon = "10 minutes")
        .writeStream.format("parquet")
        .option("path", s"$ckpt/out").option("checkpointLocation", s"$ckpt/meta")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run() // ingests all rights, no lefts → state carries the right buffers
    left.coalesce(1).write.mode("append").parquet(lDir)
    run() // second run resumes from the checkpoint and joins the lefts

    val got = spark.read.parquet(s"$ckpt/out")
      .select(col("k"), col("ts").cast("long"), col("payload"),
        col("rt").cast("long"), col("rpayload"))
      .as[(String, Long, String, Option[Long], Option[String])].collect().toSet
    assert(got === batchAsof(left, right),
      "cross-batch as-of (rights first) diverged from batch")
  }
}
