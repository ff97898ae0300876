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
    val (emb, seeds, corpus, probes) = annFixture(probeCutoff = 20)
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

  test("streamed ingest: foreachBatch appendIvfIndex — arrivals serve at the next batch boundary, stats keep alive") {
    // the WRITE side of a continuously-ingesting corpus (the serve side
    // is the three tests around this one): new vectors arrive as a
    // stream, each micro-batch appends into the persisted index via the
    // batch operator verbatim, and the ordering contract is the
    // micro-batch boundary — a probe batch issued after ingest batch N
    // must see exactly evens ∪ arrivals-so-far, never a mid-batch
    // prefix, never a future arrival
    val (_, centroids, corpus, probes) = inputs()
    // deliberately NO CBO here: stats keep-alive detection is
    // catalog-first (hasCatalogRowCount), so it must survive a default
    // CBO-off session — and the streaming foreachBatch clone runs with
    // CBO forced off regardless, which is exactly the writer this test
    // exists for (plan-stats detection silently died here)
    try {
      val evens = corpus.filter(col("id") % 2 === 0)
      Similarity.writeIvfIndex(evens, centroids, "ann_ingest_index", numBuckets = 8)
      spark.sql("ANALYZE TABLE ann_ingest_index COMPUTE STATISTICS")

      val dir = Files.createTempDirectory("ann-ingest").toString
      // two files -> two ingest micro-batches under AvailableNow
      corpus.filter(col("id") % 4 === 1).coalesce(1)
        .write.mode("overwrite").parquet(dir)
      corpus.filter(col("id") % 4 === 3).coalesce(1)
        .write.mode("append").parquet(dir)
      val steps = new java.util.concurrent.ConcurrentLinkedQueue[
        (Set[Long], Set[(Long, Int, Long)])]()
      val appended = scala.collection.mutable.Set[Long]()
      val q = spark.readStream
        .schema("id BIGINT, e ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Similarity.appendIvfIndex(batch, centroids, "ann_ingest_index")
          appended ++= batch.select("id").collect().map(_.getLong(0))
          // the probe batch AFTER the ingest batch — the serve side of
          // the ordering contract. The prober here is a DIFFERENT
          // session from the writer (foreachBatch bodies run under a
          // cloned session), the production shape — so it refreshes
          // its relation cache at the boundary, the standard Spark
          // cross-session visibility rule the operator scaladoc states
          spark.catalog.refreshTable("ann_ingest_index")
          val served = Similarity.ivfTopKIndexed("ann_ingest_index",
            centroids, probes, k = 3, nprobe = 2)
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
          steps.add((appended.toSet, served))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(180000), "stream did not finish in 180 s (loaded host?)")

      import scala.jdk.CollectionConverters._
      val recorded = steps.asScala.toSeq
      assert(recorded.size == 2, s"expected 2 ingest micro-batches, got ${recorded.size}")
      // serve-after-append parity at EVERY boundary: evens ∪ so-far,
      // exactly (ivfTopKIndexed ≡ ivfTopK parity is pinned in
      // IvfIndexSpec, so the in-plan form is the cheap ground truth)
      recorded.foreach { case (ids, served) =>
        val visible = corpus.filter(
          col("id") % 2 === 0 || col("id").isin(ids.toSeq: _*))
        val want = Similarity.ivfTopK(visible, centroids, probes, k = 3, nprobe = 2)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
        assert(served == want,
          s"serve after ingesting ${ids.size} arrivals diverged from the batch answer")
      }
      // the last boundary saw the whole corpus — streamed ingest
      // converged to the one-shot build-whole answer
      assert(recorded.map(_._1.size).max == corpus.count() - evens.count())
      // stats keep-alive survived the STREAMING writer: the ANALYZE'd
      // index still carries fresh catalog stats after two appends
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("ann_ingest_index"))
      assert(meta.stats.flatMap(_.rowCount).contains(BigInt(corpus.count())),
        s"streamed appends lost the analyzed stats (got ${meta.stats})")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_ingest_index")
    }
  }

  test("streamed ingest: foreachBatch appendIvfPqIndex — per-boundary serve == one-shot reference, on the quantized ladder") {
    // the PQ twin (q127e's frozen-centroids/frozen-codebooks shape fed
    // by a stream): training is deterministic, so an identically-built
    // REFERENCE index with ONE one-shot append is the ground truth —
    // final streamed serve must equal it exactly, and each intermediate
    // boundary must equal the reference with the not-yet-arrived ids
    // tombstoned (liveIndexRows excludes them before ADC ranking — the
    // delete path doubling as the candidate restriction)
    val (emb, _, _, probes) = inputs()
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy("vec_id")
    val seedsE = evens
      .withColumn("rn", row_number().over(ws)).filter(col("rn") === 1)
      .select(col("label").as("c_id"), col("e").as("c"))
    val corpusE = evens.select(col("vec_id").as("id"), col("e"))
    val odds = emb.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("id"), col("e"))
    try {
      val coarse = Similarity.kmeansTrainL2(corpusE, seedsE, iters = 2)
      def build(table: String) =
        Similarity.writeIvfPqIndex(corpusE, coarse, table,
          m = 16, dim = 64, seedIds = 0L until 32L by 2, iters = 2,
          numBuckets = 8)
      build("ann_ingest_pq_index")
      val bk = Similarity.readPqBooks(spark, "ann_ingest_pq_index", dim = 64)

      val dir = Files.createTempDirectory("ann-ingest-pq").toString
      odds.filter(col("id") % 4 === 1).coalesce(1)
        .write.mode("overwrite").parquet(dir)
      odds.filter(col("id") % 4 === 3).coalesce(1)
        .write.mode("append").parquet(dir)
      val steps = new java.util.concurrent.ConcurrentLinkedQueue[
        (Set[Long], Set[(Long, Int, Long)])]()
      val appended = scala.collection.mutable.Set[Long]()
      val q = spark.readStream
        .schema("id BIGINT, e ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Similarity.appendIvfPqIndex(batch, coarse, "ann_ingest_pq_index", bk)
          appended ++= batch.select("id").collect().map(_.getLong(0))
          // cross-session prober refreshes at the boundary (see the
          // vector twin above)
          spark.catalog.refreshTable("ann_ingest_pq_index")
          val served = Similarity.ivfPqTopKIndexed("ann_ingest_pq_index",
            coarse, probes, bk, k = 3, nprobe = 2)
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
          steps.add((appended.toSet, served))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(180000), "stream did not finish in 180 s (loaded host?)")

      import scala.jdk.CollectionConverters._
      val recorded = steps.asScala.toSeq
      assert(recorded.size == 2, s"expected 2 ingest micro-batches, got ${recorded.size}")
      // reference: same deterministic training, ONE one-shot append
      build("ann_ingest_pq_ref")
      Similarity.appendIvfPqIndex(odds, coarse, "ann_ingest_pq_ref", bk)
      def serveRef() = Similarity.ivfPqTopKIndexed("ann_ingest_pq_ref",
        coarse, probes, bk, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val allOdds = odds.select("id").collect().map(_.getLong(0)).toSet
      import spark.implicits._
      // walk the boundaries newest-first so the reference's tombstone
      // set only ever GROWS (deleteFromIvfIndex appends)
      val tombstoned = scala.collection.mutable.Set[Long]()
      recorded.sortBy(-_._1.size).foreach { case (ids, served) =>
        val notYet = allOdds -- ids -- tombstoned
        if (notYet.nonEmpty) {
          Similarity.deleteFromIvfIndex(spark, "ann_ingest_pq_ref",
            notYet.toSeq.toDF("id"))
          tombstoned ++= notYet
        }
        assert(served == serveRef(),
          s"streamed PQ serve after ${ids.size} arrivals diverged from the " +
            "one-shot reference")
      }
    } finally {
      Seq("ann_ingest_pq_index", "ann_ingest_pq_index_books",
        "ann_ingest_pq_ref", "ann_ingest_pq_ref_books",
        "ann_ingest_pq_ref__tombstones")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }

  test("streamed ingest: foreachBatch deleteFromIvfIndex — tombstones take effect at batch boundaries, debt stats stay fresh") {
    // the DELETE leg of streamed maintenance (append is the two tests
    // above; compaction is an offline job by design): right-to-be-
    // forgotten requests arrive as a stream, each micro-batch appends
    // tombstones via the batch operator verbatim, and a probe batch
    // issued after delete batch N must exclude exactly the ids
    // tombstoned so far — merge-on-read at the boundary, no rewrite
    val (_, centroids, corpus, probes) = inputs()
    try {
      Similarity.writeIvfIndex(corpus, centroids, "ann_del_stream_index",
        numBuckets = 8)
      val dels = corpus.filter(col("id") % 8 === 1).select("id")
        .unionByName(corpus.filter(col("id") % 8 === 5).select("id"))

      val dir = Files.createTempDirectory("ann-del-stream").toString
      corpus.filter(col("id") % 8 === 1).select("id").coalesce(1)
        .write.mode("overwrite").parquet(dir)
      corpus.filter(col("id") % 8 === 5).select("id").coalesce(1)
        .write.mode("append").parquet(dir)
      val steps = new java.util.concurrent.ConcurrentLinkedQueue[
        (Set[Long], Set[(Long, Int, Long)])]()
      val deleted = scala.collection.mutable.Set[Long]()
      val q = spark.readStream
        .schema("id BIGINT")
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Similarity.deleteFromIvfIndex(spark, "ann_del_stream_index", batch)
          deleted ++= batch.select("id").collect().map(_.getLong(0))
          // cross-session prober refreshes the SIDE table too — the
          // anti-join's build side is what must not go stale
          spark.catalog.refreshTable("ann_del_stream_index__tombstones")
          val served = Similarity.ivfTopKIndexed("ann_del_stream_index",
            centroids, probes, k = 3, nprobe = 2)
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
          steps.add((deleted.toSet, served))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(180000), "stream did not finish in 180 s (loaded host?)")

      import scala.jdk.CollectionConverters._
      val recorded = steps.asScala.toSeq
      assert(recorded.size == 2, s"expected 2 delete micro-batches, got ${recorded.size}")
      // serve-after-delete parity at every boundary: exactly the
      // corpus minus tombstones-so-far (merge-on-read backfills each
      // deleted id's slot with the next-best live candidate)
      recorded.foreach { case (ids, served) =>
        val live = corpus.filter(!col("id").isin(ids.toSeq: _*))
        val want = Similarity.ivfTopK(live, centroids, probes, k = 3, nprobe = 2)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
        assert(served == want,
          s"serve after ${ids.size} streamed deletes diverged from the batch answer")
      }
      // the debt guard's job-free path survived the streaming writer:
      // every delete batch re-ANALYZEd the side table, so its CATALOG
      // stats carry the full tombstone count
      val tsMeta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(
          "ann_del_stream_index__tombstones"))
      assert(tsMeta.stats.flatMap(_.rowCount).contains(BigInt(dels.count())),
        s"streamed deletes left stale side-table stats (got ${tsMeta.stats})")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_del_stream_index")
      spark.sql("DROP TABLE IF EXISTS ann_del_stream_index__tombstones")
    }
  }

  test("append visibility is snapshot-at-listing: a scan that listed before the append never sees the batch") {
    // the "never mid-batch" half of the ordering contract (the four
    // tests around this one prove the boundary half): a reader's scan
    // captures the table's file LISTING when its first job runs (the
    // scan's partition list is lazy — NOT frozen at resolution or
    // planning), and from then on ranks only over those files. So a
    // reader in flight when an append commits sees NONE of the batch —
    // committed files can only enter through a listing, and its
    // listing already happened — proven here by re-driving the same
    // executed plan after the commit: still the pre-append answer
    val (_, centroids, corpus, probes) = inputs()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2))
    try {
      val evens = corpus.filter(col("id") % 2 === 0)
      Similarity.writeIvfIndex(evens, centroids, "ann_snap_index", numBuckets = 8)
      val preWant = Similarity.ivfTopK(evens, centroids, probes, k = 3, nprobe = 2)
        .collect().map(key).toSet
      // the in-flight reader: its scan has LISTED (first execution) —
      // everything a mid-scan reader has done by the time a concurrent
      // append commits
      val inFlight = Similarity.ivfTopKIndexed("ann_snap_index", centroids,
        probes, k = 3, nprobe = 2)
      assert(inFlight.collect().map(key).toSet == preWant)
      Similarity.appendIvfIndex(corpus.filter(col("id") % 2 === 1),
        centroids, "ann_snap_index")
      assert(inFlight.collect().map(key).toSet == preWant,
        "a scan whose listing predates the append saw rows from it — " +
          "snapshot-at-listing broken, an in-flight reader could observe " +
          "a partial batch")
      // and a NEWLY resolved scan sees the whole appended batch at once
      val post = Similarity.ivfTopKIndexed("ann_snap_index", centroids,
        probes, k = 3, nprobe = 2).collect().map(key).toSet
      val postWant = Similarity.ivfTopK(corpus, centroids, probes,
        k = 3, nprobe = 2).collect().map(key).toSet
      assert(post == postWant,
        "a scan resolved after the append missed part of the batch")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ann_snap_index")
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
