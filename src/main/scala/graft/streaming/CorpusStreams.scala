package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

import graft.functions.TextFunctions

/** Streaming twins of the corpus operators — the dedup family's
  * continuous form, completing the streaming suite (tumbling / sliding /
  * session / dedup).
  *
  * Scale notes: dedup state is keyed by the 128-bit content fingerprint
  * and bounded by the watermark horizon (evicted past it), so the state
  * store is O(fingerprints within horizon) — the only dedup shape that
  * survives an unbounded stream. The batch twin (q22 /
  * [[graft.operators.Dedup.exactGroups]]) sees the same fingerprints:
  * within one watermark window the streaming form keeps exactly one
  * representative per batch duplicate group.
  */
object CorpusStreams {

  /** File-stream source over a documents-shaped parquet directory
    * (doc_id, text, ingest_ts) — stands in for Kafka etc. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("doc_id BIGINT, text STRING, ingest_ts TIMESTAMP")
      .parquet(dir)

  /** Watermarked streaming dedup on the normalized-content fingerprint
    * (same [[TextFunctions.fingerprint]] as the batch path):
    * `dropDuplicatesWithinWatermark` emits the first arrival per
    * fingerprint and evicts state older than the horizon. */
  def dedupByFingerprint(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .withWatermark("ingest_ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  final case class QuotaDoc(doc_id: Long, source: String, ord: Long)

  /** Streaming per-source quota — the continuous form of
    * [[graft.operators.Sampling.quotaPerGroup]] ("≤ n docs per host"
    * enforced over an unbounded stream). Custom counter state per source
    * via flatMapGroupsWithState: each batch emits rows in (ord, doc_id)
    * order until the source's cumulative cap is hit, then drops the rest
    * forever. State is ONE int per source (O(#sources), no timeout needed
    * — a quota is a lifetime cap, not a window).
    *
    * Parity contract with the batch twin: when the corpus arrives in one
    * micro-batch the emitted set equals `quotaPerGroup(df, "source", n,
    * ord, doc_id)` exactly; across batches the quota is first-arrival
    * (earlier batches win), the only causal option on a stream. */
  def quotaPerSource(docs: DataFrame, n: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"), col("ord"))
      .as[QuotaDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState[Int, QuotaDoc](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[Int]) =>
          val emitted = state.getOption.getOrElse(0)
          val take = rows.toSeq.sortBy(d => (d.ord, d.doc_id))
            .take(math.max(0, n - emitted))
          state.update(emitted + take.size)
          take.iterator
      }.toDF()
  }
}
