package graft.operators

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Scale path for selective fact⋈fact joins: Catalyst's
  * InjectRuntimeFilter plants a Bloom filter built from the selective
  * (creation) side onto the large (application) side's scan, so the big
  * side is pruned BEFORE the join shuffle — at 100 TB this cuts the
  * shuffled volume to ~selectivity·|fact|. This spec pins the plan shape
  * so the capability can't silently regress: broadcast is disabled to
  * force the shuffle join (broadcast joins don't need the filter), and
  * the thresholds are lowered to test-data scale. Complements
  * operators.Bucketing (shuffle-free when co-location is pre-arranged)
  * and operators.SkewJoin (hot keys).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective fact join injects a bloom runtime filter into the big scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf001)
      val o = Tables.orders(spark, sf001)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("might_contain"),
        s"no bloom runtime filter injected:\n$plan")
      // and it must not have changed the answer
      assert(joined.collect().map(_.getAs[String]("o_orderpriority")).toSeq
        == Seq("1-URGENT"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
