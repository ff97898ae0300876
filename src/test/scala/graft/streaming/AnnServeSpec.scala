package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Similarity

/** Real-time retrieval serving over the materialized IVF index: probe
  * vectors arrive as a STREAM and join the static bucket-pruned index —
  * the per-micro-batch body is the existing batch operator verbatim
  * (`foreachBatch`, the idiomatic Spark shape for per-batch top-k over a
  * stream-static join), so the streaming path inherits the operator's
  * plan guarantees and must reproduce the batch answers exactly. */
class AnnServeSpec extends SparkSpec {
  import spark.implicits._

  /** (emb, per-label-first seed centroids, corpus, vec_id<20 probes) —
    * the one fixture every serve test shares (the FilteredAnnSpec
    * convention; a fixture change applies once, not per test). */
  private def inputs() = {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy("vec_id")
    val seeds = emb
      .withColumn("rn", row_number().over(ws)).filter(col("rn") === 1)
      .select(col("label").as("c_id"), col("e").as("c"))
    val corpus = emb.select(col("vec_id").as("id"), col("e"))
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("e").as("p"))
    (emb, seeds, corpus, probes)
  }

  test("streamed probes against the static IVF index == batch answers") {
    val (_, centroids, corpus, probes) = inputs()

    try {
      Similarity.writeIvfIndex(corpus, centroids, "ann_serve_index", numBuckets = 8)
      val want = Similarity.ivfTopKIndexed("ann_serve_index", centroids, probes,
          k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

      val dir = Files.createTempDirectory("ann-serve").toString
      probes.coalesce(1).write.mode("overwrite").parquet(dir)
      val q = spark.readStream
        .schema("probe_id BIGINT, p ARRAY<DOUBLE>").parquet(dir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Similarity.ivfTopKIndexed("ann_serve_index", centroids, batch,
              k = 3, nprobe = 2)
            .write.mode("append").parquet(s"$dir/out")
        }
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not finish in 120 s (loaded host?)")

      val got = spark.read.parquet(s"$dir/out")
        .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("id"))).toSet
      assert(got === want, "streamed serving diverged from the batch probe path")
      assert(got.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_serve_index")
    }
  }

  test("streamed probes against the persisted IVF-PQ index == batch, buckets pruned") {
    // the q127c production index: encoded corpus bucketed by coarse id,
    // codebooks persisted alongside — here served to a probe STREAM,
    // with the per-micro-batch plan proving the bucket pruning survives
    // (SelectedBucketsCount < total inside every foreachBatch plan)
    val (_, seeds, corpus, probes) = inputs()

    try {
      val coarse = Similarity.kmeansTrainL2(corpus, seeds, iters = 2)
      Similarity.writeIvfPqIndex(corpus, coarse, "ann_serve_pq_index",
        m = 16, dim = 64, seedIds = 0L until 16L, iters = 2, numBuckets = 8)
      // the serve process loads books ONCE at startup from the
      // persisted table — the self-contained-index entry point
      val bk = Similarity.readPqBooks(spark, "ann_serve_pq_index", dim = 64)
      val want = Similarity.ivfPqTopKIndexed("ann_serve_pq_index", coarse, probes,
          bk, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

      val dir = Files.createTempDirectory("ann-serve-pq").toString
      probes.coalesce(1).write.mode("overwrite").parquet(dir)
      val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val q = spark.readStream
        .schema("probe_id BIGINT, p ARRAY<DOUBLE>").parquet(dir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val res = Similarity.ivfPqTopKIndexed("ann_serve_pq_index", coarse,
            batch, bk, k = 3, nprobe = 2)
          plans.add(res.queryExecution.executedPlan.toString)
          res.write.mode("append").parquet(s"$dir/out")
        }
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not finish in 120 s (loaded host?)")

      val got = spark.read.parquet(s"$dir/out")
        .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("id"))).toSet
      assert(got === want, "streamed IVF-PQ serving diverged from the batch probe path")
      assert(got.nonEmpty)
      import scala.jdk.CollectionConverters._
      assert(plans.asScala.nonEmpty)
      plans.asScala.foreach { plan =>
        val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
        assert(sel.isDefined && sel.get.group(1).toInt < sel.get.group(2).toInt,
          s"micro-batch probe read every bucket:\n$plan")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_serve_pq_index")
      spark.sql("DROP TABLE IF EXISTS ann_serve_pq_index_books")
    }
  }

  test("streamed HYBRID serve: PQ re-rank + per-probe RRF per micro-batch == batch, across batch splits") {
    // the full production serve stack on a probe stream: each
    // micro-batch runs ivfPqTopKRerankIndexed (quantized shortlist,
    // exact-cosine re-rank) as the vector leg and fuses it per probe
    // with a static prior leg via rrfFuseByProbe — the q135b shape,
    // batch operator verbatim inside foreachBatch. Probes are disjoint
    // across micro-batches and fusion is per-probe, so the streamed
    // union must equal the one-shot batch answer EXACTLY — proven here
    // across a 2-file (2-micro-batch) split.
    val (_, seeds, corpus, probes) = inputs()
    // a deterministic static prior leg (recency/popularity stand-in):
    // top-20 ids by an arbitrary fixed ordering
    val priorLeg = corpus.select(col("id"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(pmod(col("id"), lit(37)).desc, col("id"))))
      .filter(col("rank") <= 20)

    try {
      val coarse = Similarity.kmeansTrainL2(corpus, seeds, iters = 2)
      Similarity.writeIvfPqIndex(corpus, coarse, "ann_serve_hyb_index",
        m = 16, dim = 64, seedIds = 0L until 16L, iters = 2, numBuckets = 8)
      val bk = Similarity.readPqBooks(spark, "ann_serve_hyb_index", dim = 64)
      def serve(batch: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val vecLeg = Similarity.ivfPqTopKRerankIndexed("ann_serve_hyb_index",
            coarse, batch, corpus, bk, k = 10, nprobe = 2, rerank = 32)
          .select(col("probe_id"), col("id"), col("rank"))
        val lexLeg = batch.select(col("probe_id")).crossJoin(priorLeg)
        Similarity.rrfFuseByProbe(Seq(lexLeg, vecLeg), k = 5)
      }
      val want = serve(probes).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

      val dir = Files.createTempDirectory("ann-serve-hyb").toString
      // two files -> two micro-batches under AvailableNow
      probes.filter(col("probe_id") < 10).coalesce(1)
        .write.mode("overwrite").parquet(dir)
      probes.filter(col("probe_id") >= 10).coalesce(1)
        .write.mode("append").parquet(dir)
      val q = spark.readStream
        .schema("probe_id BIGINT, p ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          serve(batch).write.mode("append").parquet(s"$dir/out")
        }
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not finish in 120 s (loaded host?)")

      val got = spark.read.parquet(s"$dir/out")
        .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("id"), r.getAs[Double]("rrf"))).toSet
      assert(got === want,
        "streamed hybrid serving diverged from the one-shot batch answer")
      // every probe fused to a full top-5 (the prior leg alone carries
      // 20 candidates, so no probe can come back short)
      assert(got.size == 20 * 5, s"expected 100 fused rows, got ${got.size}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_serve_hyb_index")
      spark.sql("DROP TABLE IF EXISTS ann_serve_hyb_index_books")
    }
  }
}
