package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only AQE skew experiment (r2 verdict #8): does AQE's runtime
  * skew-join split absorb the q38-style hot key WITHOUT the manual salt?
  * `sbt 'Test/runMain graft.AqeSkewProbe /root/repo/target/soak/sf1'`.
  *
  * Forces the shuffle-join path (broadcast off — the 100-row dim would
  * otherwise hide the skew entirely) and lowers the AQE skew thresholds
  * to engage at single-node data sizes, then compares wall time and
  * checks the final plan for the `isSkew=true` split marker. */
object AqeSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/target/soak/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fact = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        when(col("l_orderkey") % 10 < 5, 0L)
          .otherwise(col("l_suppkey") % 100).as("k"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    def dim = spark.range(100)
      .select(col("id").as("k"), concat(lit("grp_"), col("id")).as("grp"))

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("grp")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val df = mk
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[aqe-probe] $tag run $i: $sec%.2f s")
        if (i == 3) {
          // the writer runs its own QueryExecution; to see the FINAL
          // adaptive plan, execute this df's plan directly
          df.queryExecution.toRdd.count()
          val plan = df.queryExecution.executedPlan.toString
          println(s"[aqe-probe] $tag skew-split in final plan: ${plan.contains("skew=true")}")
          plan.linesIterator.filter(l =>
              l.contains("Join") || l.contains("AQEShuffleRead") || l.contains("isFinalPlan"))
            .foreach(l => println(s"[aqe-plan] $l"))
        }
      }
    }

    time("plain+AQE")(agg(fact.join(dim, "k")))
    time("manual-salt")(agg(graft.operators.SkewJoin
      .saltedInnerJoin(fact, dim, "k", numSalts = 8,
        saltBy = Seq(col("l_orderkey"), col("l_linenumber")))))
    spark.stop()
  }
}
