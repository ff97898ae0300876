package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe: q19 references the tokens(text) expression six times
  * in one projection (three size(), one aggregate HOF arg, one
  * markerHits, one when) — does binding ws to a column first save real
  * time, or does codegen CSE already collapse the copies?
  * `sbt 'Test/runMain graft.TokenBindProbe [dir] [runs]'` */
object TokenBindProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    import graft.queries.TextAnalytics
    def current(): DataFrame = TextAnalytics.q19QualityScore.fn(spark, dir)
    def bound(): DataFrame = {
      val ws = col("__ws")
      val nTok = size(ws).cast("double")
      val meanLen = aggregate(ws, lit(0), (acc, t) => acc + length(t)).cast("double") / nTok
      val stop = Seq("the", "and", "of", "is", "with")
      val stopHits = size(filter(ws, t => t.isin(stop.map(lit): _*)))
      val stopRatio = stopHits.cast("double") / nTok
      val punct = size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9\\s]"), lit(0)))
      val punctRatio = punct.cast("double") / length(col("text")).cast("double")
      Tables.documents(spark, dir)
        .withColumn("__ws", tokens(col("text")))
        .select(
          col("doc_id"),
          size(ws).as("n_tokens"),
          round(meanLen, 6).as("mean_token_len"),
          round(stopRatio, 6).as("stopword_ratio"),
          round(punctRatio, 6).as("punct_ratio"),
          when(size(ws) >= 50 && stopRatio >= 0.05, "high")
            .when(size(ws) >= 20, "medium")
            .otherwise("low").as("quality"))
        .orderBy("doc_id")
    }
    val a = current().collect().map(_.toSeq).toList
    val b = bound().collect().map(_.toSeq).toList
    println(s"[tbp] parity: ${a == b} (${a.size} rows)")
    val variants = Seq("current" -> current _, "bound-ws" -> bound _)
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (i <- 1 to runs; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(name) = t :: times(name)
      println(f"[tbp] $name run $i: $t%.2f s")
    }
    variants.foreach { case (name, _) =>
      val xs = times(name).sorted
      println(f"[tbp] $name min=${xs.head}%.2f median=${xs(xs.size / 2)}%.2f")
    }
    spark.stop()
  }
}
