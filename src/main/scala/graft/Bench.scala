package graft
import org.apache.spark.sql.SparkSession

import graft.queries.QueryDef
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // ≥3 runs per query, report the MEDIAN (and min): single-shot numbers
    // at this scale carry ±15% JVM/GC noise, which masks real plan
    // regressions round-over-round.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen + parquet-reader warmup so the first timed query doesn't
    // absorb classloading or scan-path initialization.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()
    // noop sink: evaluates every output column (a bare count() would let
    // Catalyst prune the projections being benchmarked) without write I/O.
    def timeOnce(q: QueryDef): Double = {
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    val benched = SparkEntry.registry.filterNot(_.benchSkip)
    // Interleave rounds (all queries once, then again) rather than running
    // each query back-to-back: back-to-back repeats share a hot page cache
    // and JIT state the first run lacks, skewing medians optimistic.
    val samples: Seq[Seq[(String, Double)]] =
      (1 to runs).map(_ => benched.map(q => q.name -> timeOnce(q)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val byQuery = benched.map { q =>
      val xs = samples.map(_.toMap.apply(q.name))
      (q.name, median(xs), xs.min)
    }
    def fmt(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val qs = byQuery.map { case (k, med, _) => s"\"" + k + "\":" + fmt(med) }
      .mkString("{", ",", "}")
    val qmins = byQuery.map { case (k, _, mn) => s"\"" + k + "\":" + fmt(mn) }
      .mkString("{", ",", "}")
    val total = fmt(byQuery.map(_._2).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"queries_min":$qmins,"sf":"$sfDir"}""")
    spark.stop()
  }
}
