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
    // AQE's post-shuffle coalescing floor: with the 1m default, any
    // shuffle under cores×1 MB coalesces to a handful of partitions —
    // correct when stages are byte-bound, but it re-serializes CPU-bound
    // kernels over small-byte rows (candidate-pair edit distance, ANN
    // scoring). 64k only changes shuffles smaller than cores×1 MB — at
    // production bytes-per-core the two values behave identically, so
    // this is not a local-only tune (optimization guide §2.2/§2.5);
    // parameterized for cluster experiments.
    val minCoalesce = sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "64k")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", minCoalesce)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen + parquet-reader warmup so the first timed query doesn't
    // absorb classloading or scan-path initialization.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()
    // noop sink: evaluates every output column (a bare count() would let
    // Catalyst prune the projections being benchmarked) without write I/O.
    // A failed run must NEVER read as a (fast) score: record it as a
    // failure, not its fail-fast wall time — round 6's 7 broken queries
    // showed as 0.05 s "wins" before this. NonFatal only: an
    // OutOfMemoryError/StackOverflowError leaves a corrupted JVM whose
    // remaining samples are garbage — better no artifact than a
    // poisoned one; query-level bugs (the round-6 class) are all
    // NonFatal and still record as failures.
    def timeOnce(q: QueryDef): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] ${q.name} failed: $e"); false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val benched = SparkEntry.registry.filterNot(_.benchSkip)
    // Build-once-serve-many: persisted-index serve queries build their
    // index HERE, outside the timed body, so every timed sample measures
    // the probe path production re-runs (their fns are build-if-absent,
    // so round 1 would otherwise silently absorb an index build).
    // a failing setup must not kill the whole run (the timeOnce
    // convention): the query's build-if-absent fn will retry it in the
    // timed body and, failing again, land in "failed" like any crash.
    // NonFatal only — a fatal JVM error here must propagate, not leak
    // into the timed rounds as silently skewed samples
    benched.foreach(q => q.benchSetup.foreach { f =>
      try f(spark, sfDir)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] setup for ${q.name} failed " +
          s"(its fn will retry inside the timed body): $e") }
    })
    // Interleave rounds (all queries once, then again) rather than running
    // each query back-to-back: back-to-back repeats share a hot page cache
    // and JIT state the first run lacks, skewing medians optimistic.
    val samples: Seq[Seq[(String, (Double, Boolean))]] =
      (1 to runs).map(_ => benched.map(q => q.name -> timeOnce(q)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val byQuery = benched.map { q =>
      val xs = samples.map(_.toMap.apply(q.name))
      val ok = xs.forall(_._2)
      (q.name, median(xs.map(_._1)), xs.map(_._1).min, ok)
    }
    def fmt(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    // Failed queries emit null (not a number) so no consumer can mistake a
    // crash for a speedup; their names also land in "failed".
    def cell(v: Double, ok: Boolean) = if (ok) fmt(v).toString else "null"
    val qs = byQuery.map { case (k, med, _, ok) => s"\"" + k + "\":" + cell(med, ok) }
      .mkString("{", ",", "}")
    val qmins = byQuery.map { case (k, _, mn, ok) => s"\"" + k + "\":" + cell(mn, ok) }
      .mkString("{", ",", "}")
    val failedArr = byQuery.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // "value" sums ONLY passing queries, so a crash would otherwise read
    // as a total-level speedup in round-over-round comparison: n_failed
    // travels at the top level so any consumer of "value" sees the scope
    // shrank without parsing the per-query nulls.
    val nFailed = byQuery.count(!_._4)
    val total = fmt(byQuery.collect { case (_, med, _, true) => med }.sum)
    // FULL per-query medians/mins go to a file; the stdout line stays
    // compact (totals + 10 slowest) so it reads at a glance. The real
    // parsed-null culprit was never line length (rounds 1-6 had tiny
    // lines and still nulled) but sbt's logger decorating forked-run
    // stdout — fixed in build.sbt (outputStrategy := StdoutOutput,
    // showSuccess := false) so the JSON below is the bare last line.
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"n_failed":$nFailed,"n_queries":${byQuery.size},"queries":$qs,"queries_min":$qmins,"failed":$failedArr,"sf":"$sfDir"}"""
    // cwd assumption: launched via `sbt "runMain graft.Bench"` from the
    // repo root, so the relative default lands in the repo's target/;
    // any other launcher overrides with SPARK_GRAFT_BENCH_OUT.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_queries.json"))
    // a bare-filename override has a null parent — nothing to create
    Option(outPath.getParent)
      .foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(outPath, fullJson.getBytes("UTF-8"))
    System.err.println(s"[bench] full per-query timings: $outPath")
    val top = byQuery.filter(_._4).sortBy(-_._2).take(10)
      .map { case (k, med, _, _) => "\"" + k + "\":" + fmt(med) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"n_failed":$nFailed,"n_queries":${byQuery.size},"queries":$top,"failed":$failedArr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
