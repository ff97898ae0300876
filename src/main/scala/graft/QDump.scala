package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump ONE registry query's result to parquet without running
  * the whole Verify sweep — the fast loop for oracle development.
  * Usage: runMain graft.QDump <queryName> [sfDir] [outDir] */
object QDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val out = if (args.length > 2) args(2) else s"/tmp/qdump_$name"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    println(s"[qdump] $name rows=${spark.read.parquet(out).count()} -> $out")
    spark.stop()
  }
}
