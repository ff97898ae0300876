package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: simhash band-bucket skew + candidate volume. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val doc = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = doc.unionByName(doc.select((col("doc_id") + 100000).as("doc_id"),
      regexp_replace(col("text"), "^[^ ]+ ", "").as("text")))
    val fp = corpus.select(col("doc_id"),
      column(graft.expressions.SimhashBitsExpr(expression(col("text")), 64)).as("fp"))
      .localCheckpoint()
    val t0 = System.nanoTime()
    fp.count()
    println(f"[probe] fingerprint pass: ${(System.nanoTime()-t0)/1e9}%.2f s over ${fp.count()} docs")
    val banded = fp.select(col("doc_id"), explode(array((0 until 4).map(i =>
      struct(lit(i).as("band"), substring(col("fp"), i*16+1, 16).as("bv"))): _*)).as("hb"))
      .select(col("hb.band").as("band"), col("hb.bv").as("bv"))
    val sizes = banded.groupBy("band", "bv").count()
    val stats = sizes.agg(count(lit(1)).as("buckets"), max("count").as("maxBucket"),
      sum(col("count") * (col("count") - 1) / 2).as("candPairs")).head()
    println(s"[probe] buckets=${stats.getLong(0)} maxBucket=${stats.getLong(1)} candidatePairs=${stats.get(2)}")
    spark.stop()
  }
}
