package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.streaming.LmStreams

/** Dev-only decomposition of the LM scorer's 7 s anomaly at sf0.1. */
object LmDecompProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[decomp] partitions=${docs.rdd.getNumPartitions}")
    def t(name: String)(mk: => DataFrame): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"[decomp] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("tokens-only")(docs.select(col("doc_id"), tokens(col("text")).as("ws")))
    t("shingles-bound")(docs.select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), shingles(col("ws"), 2).as("gs")))
    t("shingles-bound-plus-filter")(docs.select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), shingles(col("ws"), 2).as("gs"))
      .filter(size(col("gs")) > 0))

    val lm = LmStreams.trainPruned(docs, topK = 3)
    t("full-scorer")(LmStreams.scoreStream(docs, lm))
    val gs = docs.select(col("doc_id"), shingles(tokens(col("text")), 2).as("gs"))
      .filter(size(col("gs")) > 0)
    t("scorer-after-materialized-shingles") {
      val sc = spark.sparkContext
      val bP = sc.broadcast(lm.probs); val bC = sc.broadcast(lm.contexts); val v = lm.v
      val slpOf = udf { xs: Seq[String] =>
        var s = 0.0
        xs.foreach { g =>
          val p = bP.value.getOrElse(g,
            bC.value.get(g.substring(0, g.indexOf(' ')))
              .map(c1 => 0.5 / (c1 + v * 0.5)).getOrElse(1.0 / v))
          s += math.log(p)
        }
        s
      }
      gs.withColumn("slp", slpOf(col("gs")))
        .select(col("doc_id"), size(col("gs")).cast("long").as("n"),
          round(col("slp") / size(col("gs")), 6).as("a"),
          round(exp(-col("slp") / size(col("gs"))), 4).as("p"))
    }
    spark.stop()
  }
}
