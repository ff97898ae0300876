package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Train-once / score-forever for the pruned bigram LM: the streaming
  * scorer must reproduce q129b's batch arithmetic exactly (same docs,
  * same pruned model, same backoff), stay identical across micro-batch
  * splits, and do it with a STATELESS zero-shuffle plan — the property
  * that makes it deployable at the 100 TB pipeline mouth. */
class LmStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def docs() = spark.read.parquet(s"$sf001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def asTuples(df: org.apache.spark.sql.DataFrame) = df
    .select("doc_id", "n_bigrams", "avg_logp", "ppl")
    .as[(Long, Long, Double, Double)].collect().toSet

  test("batch scoreStream ≡ q129b's pruned-LM output on the same corpus") {
    val d = docs()
    val lm = LmStreams.trainPruned(d, topK = 3)
    assert(lm.v > 0 && lm.probs.nonEmpty && lm.contexts.nonEmpty)
    // every kept context holds at most K grams
    val perCtx = lm.probs.keysIterator
      .map(_.split(" ", 2)(0)).toSeq.groupBy(identity).map(_._2.size)
    assert(perCtx.max <= 3, "prune must keep at most topK grams per context")

    val got = asTuples(LmStreams.scoreStream(d, lm))
    val want = asTuples(
      graft.queries.TextAnalytics.q129bLmPerplexityPruned.fn(spark, sf001))
    assert(got == want, "scorer diverged from the gated q129b arithmetic")
  }

  test("training on a bigram-free corpus fails loudly (no Infinity floors)") {
    val empty = Seq((1L, "single"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      LmStreams.trainPruned(empty, topK = 3)
    }
    assert(ex.getMessage.contains("no bigrams"))
  }

  test("scorer plan is stateless and shuffle-free (map-only)") {
    val d = docs()
    val lm = LmStreams.trainPruned(d, topK = 3)
    val scored = LmStreams.scoreStream(d, lm)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"),
      s"scorer must not shuffle — the LM is broadcast metadata:\n$plan")
  }

  test("stream scoring ≡ batch scoring across micro-batch splits; unseen grams back off") {
    val d = docs()
    val lm = LmStreams.trainPruned(d, topK = 3)
    val rows = d.as[(Long, String)].collect().toSeq
    // an unseen-vocabulary document exercises both backoff levels in
    // the stream: a known context with a pruned/unseen w2, and a fully
    // unknown context (1/V floor)
    val known = lm.contexts.keysIterator.next()
    val synthetic = (999999L, s"$known zzzunseenzzz qqqunknownqqq wwwneverwww")
    val all = rows :+ synthetic

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = LmStreams.scoreStream(
      mem.toDF().toDF("doc_id", "text"), lm)
    val query = stream.writeStream
      .format("memory").queryName("lmscores").outputMode("append").start()
    try {
      val (b1, b2) = all.splitAt(all.size / 2)
      mem.addData(b1: _*)
      query.processAllAvailable()
      mem.addData(b2: _*)
      query.processAllAvailable()
      // stateless stream: no state-store operators engaged
      assert(query.lastProgress.stateOperators.isEmpty,
        "scorer must run with zero streaming state")
      val streamed = asTuples(spark.table("lmscores"))
      val batch = asTuples(LmStreams.scoreStream(
        all.toDF("doc_id", "text"), lm))
      assert(streamed == batch,
        "micro-batched scores diverged from the batch scorer")
      assert(streamed.exists(_._1 == 999999L),
        "the unseen-vocabulary document must still score (total backoff)")
    } finally query.stop()
  }
}
