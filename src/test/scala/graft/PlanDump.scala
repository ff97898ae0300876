package graft

import org.apache.spark.sql.execution.ExplainMode

/** Dev helper: print the formatted plan of registry queries (exchange
  * triage). Args: comma-separated query names, then sfDir. */
object PlanDump {
  def main(args: Array[String]): Unit = {
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
