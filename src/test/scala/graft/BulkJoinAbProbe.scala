package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Similarity

/** Dev-only matched-conditions A/B for the bulk-kNN candidate join
  * ([[Similarity.ivfTopKBulk]]): sort-merge (current default) vs
  * shuffle-hash with either build side, q28g's correctly-sized 40-cell
  * shape. One JVM, index built once, variants interleaved, min-of-N.
  * `sbt 'Test/runMain graft.BulkJoinAbProbe <sfDir> [runs]'` */
object BulkJoinAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))
    val seedIds = e.groupBy(col("label"), pmod(col("vec_id"), lit(4)))
      .agg(min("vec_id").as("c_id"))
    val centroids = seedIds.join(e, col("c_id") === col("vec_id"))
      .select(col("c_id"), col("e").as("c"))
    val corpus = e.select(col("vec_id").as("id"), col("e"))
    Similarity.writeIvfIndex(corpus, centroids, "ab_bulk_index", numBuckets = 16)

    // probe side: whole-corpus self-kNN assignment to nprobe=2 cells
    // (the ivfTopKBulk internals, inlined so each variant differs ONLY
    // in the join hint)
    val ucent = centroids.withColumn("uc", unit(col("c"))).drop("c")
    val probes = corpus.select(col("id").as("probe_id"), unit(col("e")).as("up"))
    val wAssign = Window.partitionBy("probe_id").orderBy(col("cos_c").desc, col("c_id"))
    val pAssigned = probes.join(broadcast(ucent))
      .withColumn("cos_c", dot(col("up"), col("uc")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") <= 2)
      .select("probe_id", "up", "c_id")
    val wRank = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("id"))
    def finish(joined: DataFrame): DataFrame = joined
      .filter(col("id") =!= col("probe_id"))
      .withColumn("cos", dot(col("up"), col("ue")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 3)
      .select(col("probe_id"), col("rank"), col("id"), col("cos"))
    val index = () => spark.table("ab_bulk_index")
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "smj(merge)" -> (() => finish(index().join(pAssigned.hint("merge"), "c_id"))),
      "shj(build=probe)" -> (() => finish(index().join(pAssigned.hint("shuffle_hash"), "c_id"))),
      "shj(build=index)" -> (() => finish(index().hint("shuffle_hash").join(pAssigned, "c_id"))))

    variants.foreach { case (name, mk) =>
      val df = mk(); df.write.format("noop").mode("overwrite").save() // warm + settle AQE
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      val join = plan.linesIterator.find(l => l.contains("MergeJoin") || l.contains("HashJoin"))
      println(s"[ab] $name join node: ${join.getOrElse("?").trim.take(120)}")
      val nExch = "Exchange hashpartitioning\\(c_id".r.findAllIn(plan).size
      println(s"[ab] $name c_id exchanges: $nExch bucketedScan=${plan.contains("Bucketed: true")}")
    }
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (i <- 1 to runs; (name, mk) <- variants) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(name) = t :: times(name)
      println(f"[ab] $name run $i: $t%.2f s")
    }
    variants.foreach { case (name, _) =>
      val xs = times(name).sorted
      println(f"[ab] $name min=${xs.head}%.2f median=${xs(xs.size / 2)}%.2f")
    }
    spark.sql("DROP TABLE IF EXISTS ab_bulk_index")
    spark.stop()
  }
}
