package graft

import org.apache.spark.sql.execution.ExplainMode

/** Dev helper: print the formatted plan of registry queries (exchange
  * triage). Args: comma-separated query names, then sfDir. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: Test/runMain graft.PlanDump <name1,name2,...> <sfDir>")
      sys.exit(2)
    }
    val unknown = args(0).split(",").filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args(0).split(",").foreach { name =>
      val p = SparkEntry.queries(name)(spark, args(1))
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      println(s"===== $name =====")
      p.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join"))
        .foreach(println)
    }
    spark.stop()
  }
}
