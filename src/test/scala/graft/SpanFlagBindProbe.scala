package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import graft.functions.TextFunctions.shingleHash
import graft.operators.Dedup

/** Dev-only probe: flagDuplicateSpans references its interpreted-HOF
  * `flagged` expression three times in one projection (size + two
  * aggregate getFields). Does interpreted-path CSE collapse them, or
  * does binding the array to a column first win? (The codegen-able
  * duplicates were CSE'd per TokenBindProbe; this is the interpreted
  * variant of the question.)
  * `sbt 'Test/runMain graft.SpanFlagBindProbe [dir] [runs]'` */
object SpanFlagBindProbe {
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
    // frozen gram set from the even docs (the serving shape)
    val grams = docs.filter(col("doc_id") % 2 === 0)
      .select(explode(shingleHash(column(
        graft.expressions.OrderedShinglesExpr(expression(col("text")), 13)))).as("g"))
    val bloom = Dedup.hashBloom(grams, col("g"), 200000L)

    def current(): DataFrame =
      Dedup.flagDuplicateSpans(docs, col("text"), bloom, 13)
    def bound(): DataFrame = {
      val L = 13L
      val gs = shingleHash(column(
        graft.expressions.OrderedShinglesExpr(expression(col("text")), 13)))
      val flaggedExpr = filter(
        transform(gs, (g, i) =>
          when(Dedup.bloomMightContain(bloom)(g), i.cast("long")).otherwise(lit(-1L))),
        p => p >= 0)
      val init = struct(lit(0L).as("spans"), lit(0L).as("toks"),
        lit(Long.MinValue / 2).as("prev"))
      docs.withColumn("__flagged", flaggedExpr)
        .withColumn("__stats", aggregate(col("__flagged"), init, (acc, p) => struct(
          (acc.getField("spans") +
            when(p > acc.getField("prev") + L, 1L).otherwise(0L)).as("spans"),
          (acc.getField("toks") +
            least(lit(L), p - acc.getField("prev"))).as("toks"),
          p.as("prev"))))
        .withColumn("n_flagged", coalesce(size(col("__flagged")).cast("long"), lit(0L)))
        .withColumn("n_dup_spans", coalesce(col("__stats").getField("spans"), lit(0L)))
        .withColumn("n_dup_tokens", coalesce(col("__stats").getField("toks"), lit(0L)))
        .drop("__flagged", "__stats")
    }
    val a = current().collect().map(_.toSeq).toList
    val b = bound().collect().map(_.toSeq).toList
    println(s"[sfb] parity: ${a == b} (${a.size} rows)")
    val variants = Seq("current" -> current _, "bound" -> bound _)
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (i <- 1 to runs; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(name) = t :: times(name)
      println(f"[sfb] $name run $i: $t%.2f s")
    }
    variants.foreach { case (name, _) =>
      val xs = times(name).sorted
      println(f"[sfb] $name min=${xs.head}%.2f median=${xs(xs.size / 2)}%.2f")
    }
    spark.stop()
  }
}
