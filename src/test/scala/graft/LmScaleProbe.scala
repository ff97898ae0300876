package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.LmStreams

/** Dev-only matched A/B for the pruned-LM scorer's model-shipping shape:
  * broadcast-variable UDF fold (shipped) vs typedLit plan-literal maps
  * (the r9 hygiene lesson says this stops scaling with vocab size).
  * Same JVM, same trained model, variants interleaved, min-of-N.
  * `sbt 'Test/runMain graft.LmScaleProbe <sfDir> [runs]'` */
object LmScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val lm = LmStreams.trainPruned(docs, topK = 3)
    println(s"[lmab] model: ${lm.probs.size} grams, ${lm.contexts.size} contexts, V=${lm.v}")

    // the typedLit alternative, arithmetic-identical to scoreStream
    import graft.functions.TextFunctions._
    def literalForm(d: DataFrame): DataFrame = {
      val pm = typedLit(lm.probs)
      val cm = typedLit(lm.contexts)
      def pEff(g: org.apache.spark.sql.Column) = coalesce(
        try_element_at(pm, g),
        lit(0.5) / (try_element_at(cm, split(g, " ").getItem(0)) + lm.v * 0.5),
        lit(1.0) / lm.v)
      d.select(col("doc_id"), tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"), shingles(col("ws"), 2).as("gs"))
        .withColumn("slp", aggregate(col("gs"), lit(0.0), (acc, g) => acc + log(pEff(g))))
        .select(col("doc_id"), size(col("gs")).cast("long").as("n_bigrams"),
          round(col("slp") / size(col("gs")), 6).as("avg_logp"),
          round(exp(-col("slp") / size(col("gs"))), 4).as("ppl"))
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "broadcast-udf" -> (() => LmStreams.scoreStream(docs, lm)),
      "typedlit-maps" -> (() => literalForm(docs)))
    // parity first: the two forms must agree on the rounded outputs
    val a = variants(0)._2().collect().map(_.toSeq).toSet
    val b = variants(1)._2().collect().map(_.toSeq).toSet
    println(s"[lmab] parity: ${a == b} (${a.size} docs)")
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (i <- 1 to runs; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(name) = t :: times(name)
      println(f"[lmab] $name run $i: $t%.2f s")
    }
    variants.foreach { case (name, _) =>
      val xs = times(name).sorted
      println(f"[lmab] $name min=${xs.head}%.2f median=${xs(xs.size / 2)}%.2f")
    }
    spark.stop()
  }
}
