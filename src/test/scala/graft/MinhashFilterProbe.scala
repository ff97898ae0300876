package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import graft.expressions.MinhashBandsExpr

/** Dev-only probe: does `filter(size(bands) > 0)` after the minhash
  * kernel projection evaluate the kernel TWICE per row (pushed filter +
  * project, no cross-operator CSE)? Compares the shipped shape against
  * a filter-first variant. `sbt 'Test/runMain graft.MinhashFilterProbe [dir] [runs]'` */
object MinhashFilterProbe {
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
    def current(): DataFrame =
      graft.operators.Dedup.minhashBands(docs, col("text"), col("doc_id"))
    def filterFirst(): DataFrame = {
      // cheap pre-filter on token count, kernel evaluated once per row
      val kernel = column(MinhashBandsExpr(expression(col("text")), 3, 4))
      docs.filter(size(graft.functions.TextFunctions.tokens(col("text"))) >= 3)
        .select(col("doc_id").as("id"), kernel.as("bands"))
        .select(col("id"), posexplode(col("bands")).as(Seq("band", "band_hash")))
    }
    val a = current().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = filterFirst().collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    println(s"[mhab] parity: ${a == b} (${a.size} rows)")
    val variants = Seq("current" -> current _, "filter-first" -> filterFirst _)
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (i <- 1 to runs; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(name) = t :: times(name)
      println(f"[mhab] $name run $i: $t%.2f s")
    }
    variants.foreach { case (name, _) =>
      val xs = times(name).sorted
      println(f"[mhab] $name min=${xs.head}%.2f median=${xs(xs.size / 2)}%.2f")
    }
    spark.stop()
  }
}
