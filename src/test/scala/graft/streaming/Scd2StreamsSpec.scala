package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TemporalJoins

/** Streaming SCD2 ≡ batch SCD2: closed versions emitted by the stream
  * match the batch operator's closed rows exactly, and the open version
  * held in state matches the batch operator's `is_current` rows —
  * observed by closing every key with a sentinel update at the end. */
class Scd2StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("stream closed ∪ state open == batch history across micro-batches") {
    // 8 keys × updates with no-ops, null values, and a same-ts tie
    val rows: Seq[(Long, Long, Long, Option[String])] = (0L until 8L).flatMap { k =>
      Seq(
        (k, 1000L, 1L, Some("a")),
        (k, 2000L, 2L, Some("a")),                          // no-op
        (k, 3000L, 3L, if (k % 3 == 0) None else Some("b")),// null-valued version
        (k, 3000L, 4L, Some("c")),                          // same-ts tie
        (k, 4000L, 5L, if (k % 2 == 0) Some("c") else Some("d")))
    }
    val cdc = rows.toDF("k", "tsl", "tie", "v")
      .select(col("k"), timestamp_millis(col("tsl")).as("ts"), col("tie"), col("v"))

    val batch = TemporalJoins.scd2History(cdc, Seq("k"), "ts", "tie", "v")
      .select(col("k"), col("version"), col("v"),
        unix_millis(col("valid_from")).as("from_ms"),
        unix_millis(col("valid_to")).as("to_ms"), col("is_current"))
      .as[(Long, Int, Option[String], Long, Option[Long], Boolean)]
      .collect()
    val batchClosed = batch.filter(!_._6).map(r => (r._1, r._2, r._3, r._4, r._5.get)).toSet
    val batchOpen = batch.filter(_._6).map(r => (r._1, r._2, r._3, r._4)).toSet

    // three per-key-ordered micro-batches: ts<3000, the rest, then a
    // sentinel update per key that forces the open version to close —
    // making the state-held row observable in append output
    val sentinelTs = 9000L
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Option[String])]
    val stream = Scd2Streams.scd2Stream(
      mem.toDF().toDF("k", "tsl", "tie", "v")
        .select(col("k"), timestamp_millis(col("tsl")).as("ts"), col("tie"), col("v")))
    val query = stream.writeStream
      .format("memory").queryName("scd2out").outputMode("append").start()
    try {
      mem.addData(rows.filter(_._2 < 3000L): _*)
      query.processAllAvailable()
      mem.addData(rows.filter(_._2 >= 3000L): _*)
      query.processAllAvailable()
      mem.addData((0L until 8L).map(k => (k, sentinelTs, 99L, Some("##close##"))): _*)
      query.processAllAvailable()

      val streamed = spark.table("scd2out")
        .select(col("k"), col("version"), col("v"),
          unix_millis(col("valid_from")).as("from_ms"),
          unix_millis(col("valid_to")).as("to_ms"))
        .as[(Long, Int, Option[String], Long, Long)].collect()
      val (closedBySentinel, closed) = streamed.partition(_._5 == sentinelTs)
      assert(closed.toSet == batchClosed,
        "streamed closed versions diverged from the batch history")
      assert(closedBySentinel.map(r => (r._1, r._2, r._3, r._4)).toSet == batchOpen,
        "state-held open versions diverged from the batch is_current rows")
    } finally query.stop()
  }

  test("out-of-order CDC row fails the stream loudly instead of inverting an interval") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Option[String])]
    val stream = Scd2Streams.scd2Stream(
      mem.toDF().toDF("k", "tsl", "tie", "v")
        .select(col("k"), timestamp_millis(col("tsl")).as("ts"), col("tie"), col("v")))
    val query = stream.writeStream
      .format("memory").queryName("scd2ooo").outputMode("append").start()
    try {
      mem.addData((7L, 5000L, 1L, Some("a")))
      query.processAllAvailable()
      // ts 3000 precedes the open version's valid_from 5000 — a
      // violation of the per-key ordering contract that, folded
      // silently, would emit valid_to < valid_from
      mem.addData((7L, 3000L, 2L, Some("b")))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      val msgs = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString("\n")
      assert(msgs.contains("out-of-order CDC row"),
        s"expected the contract-violation message in the failure chain:\n$msgs")
    } finally query.stop()
  }

  // the two SILENT-divergence shapes the open-version-only check missed:
  // an equal-ts row with a smaller tie (batch's (ts, tie) sort would have
  // slotted it FIRST), and a row older than an already-folded NO-OP
  // (no-ops advance no interval, but the batch operator would have
  // ordered the late row before it and produced different versions)
  private def expectOoo(batches: Seq[Seq[(Long, Long, Long, Option[String])]],
                        name: String): Unit = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Option[String])]
    val stream = Scd2Streams.scd2Stream(
      mem.toDF().toDF("k", "tsl", "tie", "v")
        .select(col("k"), timestamp_millis(col("tsl")).as("ts"), col("tie"), col("v")))
    val query = stream.writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.init.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
      mem.addData(batches.last: _*)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      val msgs = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString("\n")
      assert(msgs.contains("out-of-order CDC row"),
        s"expected the contract-violation message in the failure chain:\n$msgs")
    } finally query.stop()
  }

  test("cross-batch equal-ts smaller-tie arrival fails loudly (tie ordering)") {
    expectOoo(Seq(
      Seq((7L, 5000L, 2L, Some("a"))),
      Seq((7L, 5000L, 1L, Some("b")))), "scd2ooo_tie")
  }

  test("arrival behind an already-folded no-op fails loudly") {
    expectOoo(Seq(
      Seq((7L, 1000L, 1L, Some("a")), (7L, 9000L, 2L, Some("a"))), // no-op folded
      Seq((7L, 5000L, 3L, Some("b")))), "scd2ooo_noop")            // slots before it
  }

  test("microsecond precision: sub-ms reorder fails; sub-ms valid_from survives") {
    // Timestamp.getTime truncates to millis — both rows below share ms 0,
    // so a ms-based guard would silently fold the genuinely-late arrival
    // and a ms-based state would emit valid_from rounded to .000
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Option[String])]
    val stream = Scd2Streams.scd2Stream(
      mem.toDF().toDF("k", "tsus", "tie", "v")
        .select(col("k"), timestamp_micros(col("tsus")).as("ts"), col("tie"), col("v")))
    val query = stream.writeStream
      .format("memory").queryName("scd2us").outputMode("append").start()
    try {
      mem.addData((7L, 900L, 1L, Some("a")))   // 900 µs
      query.processAllAvailable()
      mem.addData((7L, 950L, 2L, Some("b")))   // closes version 1 at 950 µs
      query.processAllAvailable()
      val closed = spark.table("scd2us")
        .select(col("k"), col("version"),
          unix_micros(col("valid_from")).as("f"), unix_micros(col("valid_to")).as("t"))
        .as[(Long, Int, Long, Long)].collect().toSeq
      assert(closed == Seq((7L, 1, 900L, 950L)),
        s"sub-ms interval bounds truncated: $closed")
      mem.addData((7L, 400L, 3L, Some("c")))   // 400 µs: behind, same ms
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      val msgs = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString("\n")
      assert(msgs.contains("out-of-order CDC row"), msgs)
    } finally query.stop()
  }
}
