package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B experiments for the round-16 optimization pass.
  * `sbt 'Test/runMain graft.ExpScratch <exp> <sfDir> [runs]'` */
object ExpScratch {
  def time(label: String, runs: Int)(f: => DataFrame): Unit =
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[exp] $label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

  def main(args: Array[String]): Unit = {
    val exp = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val minPart = sys.env.getOrElse("EXP_MIN_PARTITION", "1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", minPart)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    exp match {
      case "q103ab" =>
        // A: as shipped. B: orders fanned out to 32 partitions after read.
        time("q103 as-shipped", runs)(SparkEntry.queries("q103_table_profile")(spark, dir))
        val t = Tables.orders(spark, dir).repartition(32, col("o_orderkey"))
        def metrics(c: String, p: String) = Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${p}_nl"),
          countDistinct(col(c)).as(s"${p}_nd"),
          min(col(c)).cast("string").as(s"${p}_mn"),
          max(col(c)).cast("string").as(s"${p}_mx"))
        val a = t.agg(count(lit(1)).as("n"),
          (metrics("o_orderkey", "ok") ++ metrics("o_custkey", "ck") ++
            metrics("o_orderstatus", "os") ++ metrics("o_totalprice", "tp") ++
            metrics("o_orderpriority", "op") ++
            Seq(sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("od_nl"),
              countDistinct(col("o_orderdate")).as("od_nd"),
              min(col("o_orderdate")).cast("date").cast("string").as("od_mn"),
              max(col("o_orderdate")).cast("date").cast("string").as("od_mx"))): _*)
        time("q103 fanned-out", runs)(a)
      case "q121ab" =>
        time("q121b as-shipped", runs)(SparkEntry.queries("q121b_quantile_sketch")(spark, dir))
      case "bench1" =>
        sys.env("EXP_QUERIES").split(',').foreach { q =>
          time(q, runs)(SparkEntry.queries(q)(spark, dir)) }
      case "prbatch" =>
        // q112 shape (sink-free PageRank) with the lineage cut every
        // `batch` iterations instead of every iteration: fewer jobs,
        // deeper (but bounded) per-job plans.
        val edges0 = {
          val docs = spark.read.parquet(s"$dir/documents.parquet")
          docs.select((col("doc_id") % 500).as("src"),
              ((col("doc_id") * 31 + 7) % 500).as("dst"))
            .filter(col("src") % 17 =!= 0)
        }
        Seq(1, 2, 3, 5).foreach { batch =>
          (1 to runs).foreach { i =>
            val t0 = System.nanoTime()
            val edges = edges0.select(col("src"), col("dst")).localCheckpoint(true)
            val nodes = edges.select(col("src").as("node"))
              .union(edges.select(col("dst").as("node"))).distinct()
              .localCheckpoint(true)
            val deg = edges.groupBy("src")
              .agg(count(lit(1)).cast("double").as("outdeg"))
            val ew = edges.join(deg, "src").localCheckpoint(true)
            val nDf = nodes.agg(count(lit(1)).cast("double").as("n"))
              .localCheckpoint(true)
            var ranks = nodes.crossJoin(broadcast(nDf))
              .select(col("node"), (lit(1.0) / col("n")).as("rank"))
            (1 to 10).foreach { it =>
              if ((it - 1) % batch == 0) ranks = ranks.localCheckpoint(true)
              val contrib = ranks.join(ew, col("node") === col("src"))
                .groupBy(col("dst"))
                .agg(sum(col("rank") / col("outdeg")).as("c"))
              ranks = nodes.crossJoin(broadcast(nDf))
                .join(contrib, col("node") === col("dst"), "left")
                .select(col("node"),
                  (lit(0.15) / col("n") + lit(0.85) *
                    coalesce(col("c"), lit(0.0))).as("rank"))
            }
            ranks.write.format("noop").mode("overwrite").save()
            println(f"[exp] prbatch=$batch run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
        }
      case "pqphases2" =>
        import graft.operators.Similarity
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("e"))
        val corpus = e.select(col("vec_id").as("id"), col("e"))
          .repartition(32, col("vec_id"))
        val probes = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("probe_id"), col("e").as("p"))
        (1 to runs).foreach { i =>
          var t0 = System.nanoTime()
          val bk = Similarity.pqTrain(corpus, 16, 64, 0L until 16L, 2)
          println(f"[exp] pqTrain-fan run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
          t0 = System.nanoTime()
          Similarity.pqTopK(Similarity.pqEncode(corpus, bk), probes, bk, 3)
            .write.format("noop").mode("overwrite").save()
          println(f"[exp] encode+topk-fan run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
        }
      case "pqphases" =>
        import graft.operators.Similarity
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("e"))
        val corpus = e.select(col("vec_id").as("id"), col("e"))
        val probes = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("probe_id"), col("e").as("p"))
        val sids = e.groupBy("label").agg(min("vec_id").as("sid"))
          .select(col("label").as("slabel"), col("sid"))
        val seeds = sids.join(e, col("sid") === col("vec_id"))
          .select(col("slabel").cast("int").as("c_id"), col("e").as("c"))
        (1 to runs).foreach { i =>
          var t0 = System.nanoTime()
          val coarse = Similarity.kmeansTrainL2(corpus, seeds, iters = 2)
          println(f"[exp] coarseTrain run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
          t0 = System.nanoTime()
          val bk = Similarity.pqTrain(corpus, 16, 64, 0L until 16L, 2)
          println(f"[exp] pqTrain run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
          t0 = System.nanoTime()
          Similarity.pqEncode(corpus, bk).write.format("noop").mode("overwrite").save()
          println(f"[exp] pqEncode run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
          t0 = System.nanoTime()
          Similarity.pqTopK(Similarity.pqEncode(corpus, bk), probes, bk, 3)
            .write.format("noop").mode("overwrite").save()
          println(f"[exp] encode+topk run $i: ${(System.nanoTime()-t0)/1e9}%.2f s")
        }
      case other => sys.error(s"unknown exp $other")
    }
    spark.stop()
  }
}
