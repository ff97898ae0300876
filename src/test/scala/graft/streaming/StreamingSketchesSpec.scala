package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketches

/** The quantile-sketch aggregation must produce the SAME deterministic
  * sample as the batch operator, in batch `agg` and across streaming
  * micro-batches alike (the merge is order-independent by design). */
class StreamingSketchesSpec extends SparkSpec {
  import spark.implicits._

  private val K = 32

  test("batch agg form == Sketches.quantileSketch sample") {
    val df = spark.range(3000).select(
      (col("id") % 3).cast("string").as("g"), col("id").as("k"),
      ((col("id") * 2654435761L) % 10000).cast("double").as("v"))
    val qs = StreamingSketches.quantileSample(K)
    val viaAgg = df
      .select(col("g"), Sketches.kmvHash(col("k"), "sq").as("h"), col("v"))
      .groupBy("g").agg(qs(col("h"), col("v")).as("sample"))
      .select(col("g"),
        StreamingSketches.estimate(col("sample"), 0.5).as("p50"),
        StreamingSketches.estimate(col("sample"), 0.9).as("p90"),
        size(col("sample")).as("n"))
      .as[(String, Double, Double, Int)].collect().map(r => r._1 -> r).toMap
    val viaOp = Sketches.quantileSketch(df, "g", col("k"), col("v"), K, "sq",
      Seq(0.5, 0.9))
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(viaAgg.keySet == viaOp.keySet)
    viaAgg.keySet.foreach { g =>
      assert(viaAgg(g)._4 == viaOp(g)._2.toInt, s"group $g: sample sizes differ")
      assert(viaAgg(g)._2 == viaOp(g)._3, s"group $g: p50 differs")
      assert(viaAgg(g)._3 == viaOp(g)._4, s"group $g: p90 differs")
    }
  }

  test("null values: pre-filtered agg form == batch operator on nullable data") {
    // the batch operator drops null values BEFORE sampling (so n_kept
    // == len(sample)); the agg form's contract is the caller applies
    // the same filter — with it, the two sketches are identical even
    // when ~a third of the values are null
    val df = spark.range(3000).select(
      (col("id") % 3).cast("string").as("g"), col("id").as("k"),
      when(col("id") % 3 === 0, lit(null))
        .otherwise((col("id") * 2654435761L) % 10000).cast("double").as("v"))
    val qs = StreamingSketches.quantileSample(K)
    val viaAgg = df.filter(col("v").isNotNull)
      .select(col("g"), Sketches.kmvHash(col("k"), "sq").as("h"), col("v"))
      .groupBy("g").agg(qs(col("h"), col("v")).as("sample"))
      .select(col("g"),
        StreamingSketches.estimate(col("sample"), 0.5).as("p50"),
        size(col("sample")).as("n"))
      .as[(String, Double, Int)].collect().map(r => r._1 -> r).toMap
    val viaOp = Sketches.quantileSketch(df, "g", col("k"), col("v"), K, "sq",
      Seq(0.5))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(viaAgg.keySet == viaOp.keySet)
    viaAgg.keySet.foreach { g =>
      assert(viaAgg(g)._3 == viaOp(g)._2.toInt, s"group $g: sample sizes differ")
      assert(viaAgg(g)._2 == viaOp(g)._3, s"group $g: p50 differs")
    }
  }

  test("streaming micro-batches converge to the batch sketch") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val qs = StreamingSketches.quantileSample(K)
    val stream = mem.toDF().toDF("g", "k", "v")
      .select(col("g"), Sketches.kmvHash(col("k"), "sq").as("h"), col("v"))
      .groupBy("g").agg(qs(col("h"), col("v")).as("sample"))
    val query = stream.writeStream
      .format("memory").queryName("qsketch").outputMode("complete").start()
    try {
      val rows = (0L until 2000L).map(i =>
        (s"g${i % 2}", i, ((i * 48271) % 7919).toDouble))
      // two micro-batches in a deliberately scrambled order: the merge
      // is order-independent, so the final state must equal the batch
      // sketch of the union regardless
      val (b1, b2) = rows.sortBy(r => r._3).splitAt(900)
      mem.addData(b1: _*)
      query.processAllAvailable()
      mem.addData(b2: _*)
      query.processAllAvailable()
      val streamed = spark.table("qsketch")
        .select(col("g"), col("sample"))
        .as[(String, Seq[Double])].collect().toMap
      val batch = Sketches.quantileSketch(
        rows.toDF("g", "k", "v"), "g", col("k"), col("v"), K, "sq", Seq(0.5))
        .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.keySet.foreach { g =>
        assert(streamed(g).length == batch(g)._2.toInt, s"group $g: sizes differ")
        val p50 = streamed(g)(math.max(1,
          math.ceil(0.5 * streamed(g).length).toInt) - 1)
        assert(p50 == batch(g)._3, s"group $g: stream p50 $p50 != batch ${batch(g)._3}")
      }
    } finally query.stop()
  }
}
