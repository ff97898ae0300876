package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Soak probe for the broadcast-shaped frozen vocab in
  * [[graft.streaming.CorpusStreams.hygieneStateless]] (dev-only, like
  * BandedGuardSoak): `sbt 'Test/runMain graft.VocabScaleSoak [dir]'`.
  *
  * Runs the five-stage stateless hygiene composition over the sf0.1
  * documents with a 10³- and a 10⁵-term weight map and times both. With
  * the broadcast UDF shape the vocab ships once per executor and the
  * plan carries only a function reference, so the two timings must be
  * ~flat; the previous `typedLit` shape embedded every term in the plan
  * and re-analyzed/serialized it per micro-batch, scaling with vocab
  * size. Prints per-size plan length + timings for the SOAK.md row.
  */
object VocabScaleSoak {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"),
        concat(lit("https://site"),
          pmod(col("doc_id"), lit(200)).cast("string"),
          lit(".example.com/d/"),
          pmod(col("doc_id"), lit(20)).cast("string")).as("url"))
    val thresholds = docs.select(col("source").cast("string")).distinct()
      .collect().map(_.getString(0))
      .map(s => s -> 700000L).toMap

    def vocab(n: Int): Map[String, Long] =
      (0 until n).map(i => s"tok_$i" -> ((i % 17) - 8).toLong)
        .filter(_._2 != 0L).toMap

    Seq(1000, 100000).foreach { n =>
      val w = vocab(n)
      def query() = graft.streaming.CorpusStreams.hygieneStateless(
        docs, col("url"), w, thresholds, seed = "vs")
      val planLen = query().queryExecution.analyzed.toString.length
      // warm once, then time three runs of construction + execution
      query().count()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val c = query().count()
        (System.nanoTime() - t0) / 1e9 -> c
      }
      println(f"[vocab-soak] terms=$n%7d planLen=$planLen%6d rows=${times.head._2}%d " +
        times.map(t => f"${t._1}%.2f s").mkString("runs: ", ", ", ""))
    }
    spark.stop()
  }
}
