package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Soak probe for the guarded banded hamming family on an
  * identical-heavy ADVERSARIAL corpus (dev-only, like
  * TemporalStreamSoak): `sbt 'Test/runMain graft.BandedGuardSoak [n]'`.
  *
  * Shapes the worst case the guard exists for, at soak scale:
  * one mega-group of byte-identical fingerprints (20% of the corpus —
  * far past memberCap, so membership recovery takes the broadcast
  * overflow path), one hundred 100-member groups (the bounded-collect
  * array path), and a dup-free tail. Times the rep-level pair join and
  * the linear cluster re-expansion; the un-guarded formulation would
  * put the mega-group in every band bucket (Σ bucket² ≈ 4·10¹⁰
  * candidates before distinct) and the quadratic member-level pair
  * contract would emit 2·10¹⁰ rows — both are exactly what the guard
  * must avoid, so pairs stay O(groups²) and clusters O(members).
  */
object BandedGuardSoak {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mega = n / 5              // one identical group, 20% of the corpus
    val midGroups = 100L
    val midSize = 100L
    val mid = midGroups * midSize
    val fp = lpad(bin(
      when(col("id") < mega, lit(1L))
        .when(col("id") < mega + mid, lit(10L) + pmod(col("id"), lit(midGroups)))
        .otherwise(lit(1000000L) + col("id"))), 64, "0")
    val fps = spark.range(n).select(col("id").as("sid"), fp.as("fp"))

    var t0 = System.nanoTime()
    val g = graft.operators.Dedup.bandedHammingPairsGuarded(
      fps, Nil, bits = 64, bands = 4, maxBucket = 1 << 12)
    val nPairs = g.pairs.count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    println(f"[guard-soak] n=$n rep-level pairs=$nPairs in $tPairs%.1f s")

    t0 = System.nanoTime()
    val clusters = graft.operators.Dedup.nearDupClusters(
      fps, bits = 64, bands = 4, maxHamming = 3)
    val byCluster = clusters.groupBy("cluster").count()
      .agg(count(lit(1)).as("n_clusters"), max("count").as("largest"),
        sum("count").as("covered")).head()
    val tClusters = (System.nanoTime() - t0) / 1e9
    println(f"[guard-soak] clusters=${byCluster.getLong(0)} " +
      f"largest=${byCluster.getLong(1)} covered=${byCluster.getLong(2)} " +
      f"in $tClusters%.1f s")
    require(byCluster.getLong(2) == n, "cluster re-expansion lost members")
    require(byCluster.getLong(1) >= mega, "mega-group not clustered together")
    spark.stop()
  }
}
