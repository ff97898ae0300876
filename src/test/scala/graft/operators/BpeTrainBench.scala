package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev timing harness for the BPE trainer: `Test/runMain
  * graft.operators.BpeTrainBench <sfDir> [k]` — trains k merges (default
  * 2000) on the documents table and prints vocabulary size + wall time.
  * The incremental-index trainer target: k=2000 on sf0.1 in seconds. */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // "synth" replaces the corpus with one of ~120k DISTINCT words (md5
    // hex of a counter) — the sf tables' synthetic text has only ~60
    // distinct pre-tokens, far too small to exercise the trainer loop
    val docs =
      if (dir == "synth")
        spark.range(200000).select(
          concat(lit("w"), md5(col("id").cast("string"))).as("text"))
      else spark.read.parquet(s"$dir/documents.parquet")
    val nVocab = Bpe.vocab(docs, col("text")).count()
    val t0 = System.nanoTime()
    val merges = Bpe.train(docs, col("text"), k)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[bpe-bench] vocab=$nVocab%d k=$k%d merges=${merges.length}%d " +
      f"train=$sec%.2f s (incl. one corpus vocab pass)")
    spark.stop()
  }
}
