package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: execute one query and print the FINAL adaptive plan (shows
  * ReusedExchange / stage reuse, which the initial explain cannot). */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
