package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketches

/** The streaming PSI monitor must reproduce the batch q126 gate: same
  * frozen reference boundaries, same bucketing, same Laplace smoothing —
  * the PSI derived from the final streaming state snapshot equals the
  * q126 query's own psi_total on the same current-version rows. */
class DriftStreamsSpec extends SparkSpec {
  import spark.implicits._

  /** q126's inputs at sf0.001 (sf001): reference = doc lengths; current = the
    * drifted version (dropped, edited, duplicated docs). */
  private def inputs() = {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val ref = docs.select(col("doc_id"), length(col("text")).cast("double").as("x"))
    val cur = docs.filter(col("doc_id") % 5 =!= 1)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, length(col("text")) + 3)
          .otherwise(length(col("text"))).cast("double").as("x"))
      .unionByName(docs.filter(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 900000).as("doc_id"),
          length(col("text")).cast("double").as("x")))
    (ref, cur)
  }

  test("stream-derived PSI == the batch q126 psi_total") {
    val (ref, cur) = inputs()
    // the frozen reference profile: sketch deciles + reference counts
    // (the GLOBAL sketch form, as q126 uses)
    val qs = (1 to 9).map(_ / 10.0)
    val boundsRow = Sketches.quantileSketchAll(
      ref, col("doc_id"), col("x"), 200, "psi", qs)
      .head()
    val bounds = (1 to 9).map(i => boundsRow.getDouble(i))
    val refCounts = DriftStreams.psiDriftStream(ref, col("x"), bounds)
      .as[(Int, Long)].collect().toMap

    // stream the current version through the monitor in two micro-batches
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Double]
    val counts = DriftStreams.psiDriftStream(mem.toDF().toDF("x"), col("x"), bounds)
    val query = counts.writeStream
      .format("memory").queryName("psidrift").outputMode("complete").start()
    try {
      val xs = cur.select("x").as[Double].collect()
      val (b1, b2) = xs.splitAt(xs.length / 3)
      mem.addData(b1.toIndexedSeq: _*)
      query.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*)
      query.processAllAvailable()
      val snapshot = spark.table("psidrift").as[(Int, Long)].collect().toMap
      val streamPsi = DriftStreams.psiFromCounts(snapshot, refCounts)

      // the batch gate's own answer (the registered q126 query)
      val batchPsi = graft.SparkEntry.queries("q126_psi_drift")(spark, sf001)
        .select("psi_total").as[Double].head()
      assert(math.abs(streamPsi - batchPsi) < 5e-5, // q126 rounds to 4 dp
        s"stream PSI $streamPsi != batch $batchPsi")
      // drift is real on this fixture, not a zero-zero coincidence
      assert(batchPsi > 0.0)
      // bounded state: at most 10 bucket rows regardless of volume
      assert(snapshot.size <= 10)
    } finally query.stop()
  }

  test("psiFromCounts replicates the q126 smoothing conventions") {
    // identical populations → PSI exactly 0 (every term cancels)
    val same = Map(0 -> 10L, 1 -> 20L, 2 -> 30L)
    assert(DriftStreams.psiFromCounts(same, same) == 0.0)
    // buckets missing on one side still contribute (Laplace floor), but
    // both-empty buckets are OMITTED (q126's full-outer-join semantics):
    // adding an explicit zero-count key changes nothing — crucially the
    // fixture totals DIFFER (150 vs 180), so a zero-zero key's Laplace
    // term would be nonzero if it were wrongly included
    val a = Map(0 -> 100L, 1 -> 50L)
    val b = Map(0 -> 50L, 2 -> 130L)
    val psi = DriftStreams.psiFromCounts(a, b)
    assert(psi > 0.0)
    assert(DriftStreams.psiFromCounts(a + (9 -> 0L), b) == psi)
    assert(DriftStreams.psiFromCounts(a, b + (8 -> 0L)) == psi)
  }
}
