package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
