package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling}
import graft.streaming.CorpusStreams

/** Dev-only probe: throughput of the stream-static near-dup guard's
  * PLAN applied to a batch frame (the operator is stateless, so the
  * identical plan serves both; this is the LmStreams/hygiene parity
  * convention for timing streaming twins). Protected side = the "eval"
  * split of the dup-dense corpus; arrivals = the near-dup variants of
  * the train side — so a realistic fraction of arrivals collide.
  * `sbt 'Test/runMain graft.NearDupGuardProbe [dir] [runs]'` */
object NearDupGuardProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val fracs = Seq("train" -> 0.8, "eval" -> 0.2)
    val split = Sampling.splitLabel(col("doc_id"), "sp2", fracs)
    // protected table: OFFLINE once (not timed) — the deployment shape
    val protFps = Dedup.simhashFps(
        docs.filter(split === "eval"), col("text"), col("doc_id"))
      .localCheckpoint()
    val nProt = protFps.count()
    // arrivals: near-dup variants of the train docs (first word dropped)
    val arrivals = docs.filter(split === "train")
      .select(col("doc_id"), regexp_replace(col("text"), "^[^ ]+ ", "").as("text"))
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val flagged = CorpusStreams.nearDupGuard(arrivals, col("text"), protFps)
        .count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] nearDupGuard run $i: $s%.2f s ($flagged flagged, " +
        f"$nProt protected)")
    }
    spark.stop()
  }
}
