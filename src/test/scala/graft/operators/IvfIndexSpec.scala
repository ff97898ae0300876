package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The materialized IVF layout: result parity with the in-plan IVF path,
  * plus the physical guarantees the layout exists for — the probe scan
  * prunes to the probed buckets (SelectedBucketsCount < total) and the
  * index side joins without an Exchange. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def inputs() = {
    val (_, centroids, corpus, probes) = annFixture(probeCutoff = 10)
    (corpus, centroids, probes)
  }

  test("indexed IVF probe: identical results, pruned buckets, no index-side shuffle") {
    val (corpus, centroids, probes) = inputs()
    try {
      Similarity.writeIvfIndex(corpus, centroids, "ivf_spec_index", numBuckets = 8)

      val direct = Similarity.ivfTopK(corpus, centroids, probes, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val indexed = Similarity.ivfTopKIndexed("ivf_spec_index", centroids, probes,
        k = 3, nprobe = 2)
      val got = indexed.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == direct, "indexed IVF must reproduce the in-plan IVF results")

      val plan = indexed.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(sel.isDefined, s"no bucket pruning in probe plan:\n$plan")
      assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"probe scan reads every bucket (${sel.get.group(1)}/${sel.get.group(2)}):\n$plan")
      // the index side must not shuffle: the only Exchange allowed in the
      // probe plan is the broadcast of the (tiny) probe-cluster side
      assert(!plan.contains("Exchange hashpartitioning(c_id"),
        s"index side re-shuffled on c_id:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_spec_index")
    }
  }

  test("IVF-PQ index: identical to in-plan IVF-PQ, pruned buckets, no re-encode") {
    val (corpus, seeds, probes) = inputs()
    val coarse = Similarity.kmeansTrainL2(corpus, seeds, iters = 2)
    try {
      val built = Similarity.writeIvfPqIndex(corpus, coarse, "ivfpq_spec_index",
        m = 16, dim = 64, seedIds = 0L until 16L, iters = 2, numBuckets = 8)
      // the persisted codebooks round-trip exactly
      val loaded = Similarity.readPqBooks(spark, "ivfpq_spec_index", dim = 64)
      assert(loaded == built, "persisted codebooks differ from the trained ones")

      val direct = Similarity.ivfPqTopK(corpus, coarse, probes, m = 16, dim = 64,
        seedIds = 0L until 16L, iters = 2, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val indexed = Similarity.ivfPqTopKIndexed("ivfpq_spec_index", coarse, probes,
        loaded, k = 3, nprobe = 2)
      val got = indexed.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == direct, "indexed IVF-PQ must reproduce the in-plan results exactly")

      val plan = indexed.queryExecution.executedPlan.toString
      // probe scan prunes to the probed buckets
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(sel.isDefined, s"no bucket pruning in IVF-PQ probe plan:\n$plan")
      assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"IVF-PQ probe reads every bucket:\n$plan")
      // no index-side shuffle
      assert(!plan.contains("Exchange hashpartitioning(c_id"),
        s"index side re-shuffled on c_id:\n$plan")
      // NO RE-ENCODE at probe time: the probe plan must not touch the
      // corpus embeddings at all — its only relations are the code table
      // and the probe vectors. Count in the FINAL plan only (the AQE
      // toString repeats every scan in its "Initial Plan" section).
      val finalPlan = plan.split("== Initial Plan ==")(0)
      val parquetScans = "FileScan parquet".r.findAllIn(finalPlan).size
      assert(parquetScans <= 2, // the bucketed code table + the probe side
        s"probe plan scans $parquetScans parquet relations (re-encode?):\n$plan")
      assert(!finalPlan.toLowerCase.contains("posexplode"),
        s"probe plan re-runs PQ training/encoding machinery:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfpq_spec_index")
      spark.sql("DROP TABLE IF EXISTS ivfpq_spec_index_books")
    }
  }

  test("IVF-PQ re-rank: shortlist-contained, exact cosine, recall >= plain ADC") {
    val (corpus, seeds, probes) = inputs()
    val coarse = Similarity.kmeansTrainL2(corpus, seeds, iters = 2)
    try {
      val bk = Similarity.writeIvfPqIndex(corpus, coarse, "ivfpq_rr_spec_index",
        m = 16, dim = 64, seedIds = 0L until 16L, iters = 2, numBuckets = 8)
      val rr = Similarity.ivfPqTopKRerankIndexed("ivfpq_rr_spec_index", coarse,
        probes, corpus, bk, k = 3, nprobe = 2, rerank = 32)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      // 1. the re-rank may only REORDER the ADC shortlist, never invent a
      // candidate outside it (that would mean it scanned the corpus)
      val shortlist = Similarity.ivfPqTopKIndexed("ivfpq_rr_spec_index", coarse,
        probes, bk, k = 32, nprobe = 2)
        .select("probe_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rr.forall(r => shortlist((r._1, r._3))),
        "re-rank emitted an id outside the ADC shortlist")
      // 2. the emitted cos is the TRUE cosine — byte-identical to the
      // exact kernel's arithmetic (unit-normalize then left-assoc dot),
      // replayed here independently on the collected vectors
      val vecs = corpus.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      def unitDot(a: Array[Double], b: Array[Double]): Double = {
        def unit(v: Array[Double]): Array[Double] = {
          var n = 0.0; var i = 0
          while (i < v.length) { n += v(i) * v(i); i += 1 }
          val s = math.sqrt(n); v.map(_ / s)
        }
        val (ua, ub) = (unit(a), unit(b)); var acc = 0.0; var i = 0
        while (i < ua.length) { acc += ua(i) * ub(i); i += 1 }
        acc
      }
      rr.foreach { case (p, _, id, cos) =>
        assert(cos == unitDot(vecs(p), vecs(id)),
          s"probe $p id $id: emitted cos $cos is not the exact cosine")
      }
      // 3. the operator's reason to exist: recall at least the plain
      // ADC top-k's (strictly above it on this corpus — the gated
      // q130b/q130c numbers; >= is the contract)
      val exact = Similarity.bruteForceTopK(corpus, probes, 3)
      def meanRecall(df: org.apache.spark.sql.DataFrame): Double =
        Similarity.recallAtK(df, exact, 3).agg(avg("recall")).head().getDouble(0)
      val plain = Similarity.ivfPqTopKIndexed("ivfpq_rr_spec_index", coarse,
        probes, bk, k = 3, nprobe = 2)
      val rrDf = Similarity.ivfPqTopKRerankIndexed("ivfpq_rr_spec_index", coarse,
        probes, corpus, bk, k = 3, nprobe = 2, rerank = 32)
      assert(meanRecall(rrDf) >= meanRecall(plain),
        "re-rank must not lose recall vs the plain ADC ranking")
      // 4. a shortlist smaller than the answer is a caller bug
      val e = intercept[IllegalArgumentException] {
        Similarity.ivfPqTopKRerankIndexed("ivfpq_rr_spec_index", coarse,
          probes, corpus, bk, k = 3, nprobe = 2, rerank = 2)
      }
      assert(e.getMessage.contains("rerank"), e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfpq_rr_spec_index")
      spark.sql("DROP TABLE IF EXISTS ivfpq_rr_spec_index_books")
    }
  }

  test("IVF-PQ append: frozen-codebook encode, both halves served, pruning survives") {
    val (corpus, seeds, probes) = inputs()
    val evens = corpus.filter(col("id") % 2 === 0)
    val odds = corpus.filter(col("id") % 2 === 1)
    val coarse = Similarity.kmeansTrainL2(evens, seeds, iters = 2)
    try {
      val built = Similarity.writeIvfPqIndex(evens, coarse, "ivfpq_app_spec_index",
        m = 16, dim = 64, seedIds = 0L until 32L by 2, iters = 2, numBuckets = 8)
      Similarity.appendIvfPqIndex(odds, coarse, "ivfpq_app_spec_index", built)
      // every id exactly once — the append encoded and inserted all of
      // the second half, duplicating nothing
      val ids = spark.table("ivfpq_app_spec_index").select("id")
        .collect().map(_.getLong(0))
      assert(ids.length == ids.distinct.length, "append duplicated index rows")
      assert(ids.length == corpus.count(), "append missed rows")
      // appended rows carry codes decodable by the PERSISTED books and
      // land in buckets the probe path prunes to — and results draw
      // from BOTH halves
      val bk = Similarity.readPqBooks(spark, "ivfpq_app_spec_index", dim = 64)
      val res = Similarity.ivfPqTopKIndexed("ivfpq_app_spec_index", coarse,
        probes, bk, k = 3, nprobe = 2)
      val gotIds = res.select("id").collect().map(_.getLong(0)).toSet
      assert(gotIds.exists(_ % 2 == 0) && gotIds.exists(_ % 2 == 1),
        s"results draw from one half only: $gotIds")
      val plan = res.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(sel.isDefined && sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"bucket pruning lost across the PQ append:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(c_id"),
        s"index side re-shuffled on c_id after append:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfpq_app_spec_index")
      spark.sql("DROP TABLE IF EXISTS ivfpq_app_spec_index_books")
    }
  }

  test("PQ bulk kNN join: parity with the indexed probe path, index read in place") {
    val (corpus, seeds, probes) = inputs()
    val coarse = Similarity.kmeansTrainL2(corpus, seeds, iters = 2)
    try {
      val bk = Similarity.writeIvfPqIndex(corpus, coarse, "ivfpq_bulk_spec_index",
        m = 16, dim = 64, seedIds = 0L until 16L, iters = 2, numBuckets = 8)
      // parity on the same probe set: the bulk join's map-side probe
      // tables + shuffled-hash join must score identically to the
      // indexed path's collected probe side + broadcast join
      val indexed = Similarity.ivfPqTopKIndexed("ivfpq_bulk_spec_index",
        coarse, probes, bk, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val bulk = Similarity.ivfPqTopKBulk("ivfpq_bulk_spec_index", coarse,
        probes, bk, k = 3, nprobe = 2)
      val got = bulk.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == indexed, "PQ bulk join must reproduce the indexed probe results")
      // plan shape: shuffled-hash join BUILDING ON THE INDEX side, code
      // table read in place (Bucketed: true), the only c_id exchange is
      // the probe side moving to the bucket layout
      val plan = bulk.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("ShuffledHashJoin") && plan.contains("BuildLeft"),
        s"join not a shuffled-hash building on the index side:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"code-table scan lost its bucket layout:\n$plan")
      val nExch = "Exchange hashpartitioning\\(c_id".r.findAllIn(plan).size
      assert(nExch == 1,
        s"expected exactly the probe-side c_id exchange, found $nExch:\n$plan")
      // whole-corpus probe side (the self-kNN shape) also runs, and
      // deletes are honored through the same liveIndexRows read
      val self = corpus.select(col("id").as("probe_id"), col("e").as("p"))
      Similarity.deleteFromIvfIndex(spark, "ivfpq_bulk_spec_index",
        corpus.filter(col("id") % 7 === 3).select("id"))
      val served = Similarity.ivfPqTopKBulk("ivfpq_bulk_spec_index", coarse,
        self, bk, k = 3, nprobe = 2)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(served.nonEmpty && served.forall(_ % 7 != 3),
        "PQ bulk path served a deleted id")
      // the sizing guard carries over from the vector bulk path
      val ex = intercept[IllegalArgumentException] {
        Similarity.ivfPqTopKBulk("ivfpq_bulk_spec_index", coarse, self, bk,
          k = 3, nprobe = 2, maxShareFactor = 0.01)
      }
      assert(ex.getMessage.contains("sizing rule"), ex.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfpq_bulk_spec_index")
      spark.sql("DROP TABLE IF EXISTS ivfpq_bulk_spec_index_books")
      spark.sql("DROP TABLE IF EXISTS ivfpq_bulk_spec_index__tombstones")
    }
  }

  test("PQ index compaction: delete then compact preserves serve results and bucket layout, clears tombstones") {
    // compactIvfIndex's swap machinery is index-kind agnostic (it
    // rewrites whatever columns the bucketed table stores) — this pins
    // that claim on the CODE table: the vector-side compaction tests
    // (FilteredAnnSpec, ConcurrentServeSpec) never touch a PQ index
    val (corpus, seeds, probes) = inputs()
    val coarse = Similarity.kmeansTrainL2(corpus, seeds, iters = 2)
    val idx = "ivfpq_compact_spec_index"
    def serveSet(bk: Similarity.PqBooks) =
      Similarity.ivfPqTopKIndexed(idx, coarse, probes, bk, k = 3, nprobe = 2)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
    try {
      val bk = Similarity.writeIvfPqIndex(corpus, coarse, idx,
        m = 16, dim = 64, seedIds = 0L until 16L, iters = 2, numBuckets = 8)
      Similarity.deleteFromIvfIndex(spark, idx,
        corpus.filter(col("id") % 7 === 3).select("id"))
      val preCompact = serveSet(bk)
      Similarity.compactIvfIndex(spark, idx)
      // the fold is invisible to serves: same ADC answers, debt gone
      assert(serveSet(bk) == preCompact,
        "PQ serve answers changed across compaction")
      assert(!spark.catalog.tableExists(s"${idx}__tombstones"))
      assert(spark.table(idx).filter(col("id") % 7 === 3).count() == 0,
        "compaction left physically-deleted code rows behind")
      // the rewrite preserved the bucket layout the serve scan prunes on
      val plan = Similarity.ivfPqTopKIndexed(idx, coarse, probes, bk,
          k = 3, nprobe = 2)
        .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(plan.contains("Bucketed: true"),
        s"compacted PQ index lost its bucket layout:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(c_id"),
        s"compacted PQ index re-shuffles on c_id at serve time:\n$plan")
    } finally {
      Seq(idx, s"${idx}_books", s"${idx}__tombstones", s"${idx}__compact",
        s"${idx}__old").foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }

  test("indexed range search: identical to in-plan range search, pruned buckets") {
    val (corpus, centroids, probes) = inputs()
    try {
      Similarity.writeIvfIndex(corpus, centroids, "ivf_range_index", numBuckets = 8)
      val direct = Similarity.ivfRangeSearch(corpus, centroids, probes,
        minCos = 0.5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val indexed = Similarity.ivfRangeSearchIndexed("ivf_range_index",
        centroids, probes, minCos = 0.5, nprobe = 2)
      val got = indexed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == direct, "indexed range search must reproduce the in-plan results")
      assert(got.nonEmpty, "fixture produced no in-range pairs — weaken nothing silently")
      val plan = indexed.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(sel.isDefined && sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"range probe reads every bucket:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(c_id"),
        s"index side re-shuffled on c_id:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_range_index")
    }
  }

  test("incremental append: build-half + append-half ≡ build-whole") {
    val (corpus, centroids, probes) = inputs()
    try {
      // build on even ids, append odd ids against the frozen centroids
      Similarity.writeIvfIndex(corpus.filter(col("id") % 2 === 0),
        centroids, "ivf_inc_index", numBuckets = 8)
      Similarity.appendIvfIndex(corpus.filter(col("id") % 2 === 1),
        centroids, "ivf_inc_index")
      // the whole-corpus index, for row-level comparison
      Similarity.writeIvfIndex(corpus, centroids, "ivf_whole_index", numBuckets = 8)
      val whole = spark.table("ivf_whole_index")
        .select("id", "c_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val inc = spark.table("ivf_inc_index")
        .select("id", "c_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(inc == whole, "appended index rows differ from a fresh build")

      // probe results identical to the direct path, and bucket pruning
      // still engages over the appended files
      val direct = Similarity.ivfTopK(corpus, centroids, probes, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val probed = Similarity.ivfTopKIndexed("ivf_inc_index", centroids, probes,
        k = 3, nprobe = 2)
      val got = probed.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == direct, "post-append probe differs from the in-plan IVF")
      val plan = probed.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(sel.isDefined && sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"bucket pruning lost after append:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_inc_index")
      spark.sql("DROP TABLE IF EXISTS ivf_whole_index")
    }
  }

  test("bulk kNN join: whole-corpus probes, index read in place (one c_id Exchange)") {
    val (corpus, centroids, _) = inputs()
    // probe side = the corpus itself: the semantic-dedup self-kNN shape
    // where the probe set is NOT broadcast-sized by convention
    val probes = corpus.select(col("id").as("probe_id"), col("e").as("p"))
    try {
      Similarity.writeIvfIndex(corpus, centroids, "ivf_bulk_index", numBuckets = 8)
      val direct = Similarity.ivfTopK(corpus, centroids, probes, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val bulk = Similarity.ivfTopKBulk("ivf_bulk_index", centroids, probes,
        k = 3, nprobe = 2)
      val got = bulk.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == direct, "bulk kNN join must reproduce the in-plan IVF results")

      // plan shape: the join stays a shuffled-hash join BUILDING ON THE
      // INDEX side (the r11 A/B winner — the hint holds against AQE's
      // broadcast demotion) and the ONLY c_id exchange is the probe
      // side moving to the index's bucket layout — the index itself is
      // read in place
      // AQE's toString appends the pre-adaptive "Initial Plan" — count
      // exchanges in the FINAL plan section only
      val plan = bulk.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("ShuffledHashJoin") && plan.contains("BuildLeft"),
        s"join not a shuffled-hash building on the index side:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"index scan lost its bucket layout:\n$plan")
      val nExch = "Exchange hashpartitioning\\(c_id".r.findAllIn(plan).size
      assert(nExch == 1,
        s"expected exactly the probe-side c_id exchange, found $nExch:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_bulk_index")
    }
  }

  test("drift maintenance: retrain-from-index ≡ one Lloyd step; PSI fires only on real drift") {
    val (corpus, centroids, _) = inputs()
    try {
      Similarity.writeIvfIndex(corpus, centroids, "ivf_drift_index", numBuckets = 8)

      // retraining FROM the index (no corpus re-scan) must equal one
      // Lloyd update over the corpus from the same frozen centroids —
      // the index rows ARE that assignment, so every mean matches
      // bit-for-bit (decimal-summed, order-independent)
      val fromIndex = Similarity.ivfRetrainFromIndex(spark, "ivf_drift_index")
        .as[(Int, Seq[Double])].collect().toMap
      val oneStep = Similarity.kmeansTrain(corpus, centroids, iters = 1)
        .as[(Int, Seq[Double])].collect().toMap
      assert(fromIndex.keySet == oneStep.keySet)
      fromIndex.keySet.foreach { c =>
        assert(fromIndex(c) == oneStep(c), s"centroid $c: index retrain != Lloyd step")
      }

      // detector specificity: identical occupancy → PSI 0; an append
      // that preserves the distribution stays under the 0.05 trigger,
      // while a bucket-concentrated append (the q28e shift) crosses it
      val occ = spark.table("ivf_drift_index").groupBy("c_id")
        .agg(count(lit(1)).as("n_ref"))
      assert(Similarity.occupancyPsi(occ,
        occ.withColumnRenamed("n_ref", "n_cur")).head().getDouble(0) == 0.0)
      // distribution-preserving growth: every bucket exactly doubles
      val doubled = occ.select(col("c_id"), (col("n_ref") * 2).as("n_cur"))
      val psiSame = Similarity.occupancyPsi(occ, doubled).head().getDouble(0)
      assert(psiSame < 0.05, s"uniform growth must not trigger a rebuild: $psiSame")
      // concentrated growth: half the buckets double, the rest starve
      val skewed = occ.select(col("c_id"),
        when(col("c_id") < 5, col("n_ref") * 2).otherwise(col("n_ref")).as("n_cur"))
      val psiSkew = Similarity.occupancyPsi(occ, skewed).head().getDouble(0)
      assert(psiSkew > 0.05, s"bucket-concentrated growth must trigger: $psiSkew")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_drift_index")
    }
  }

  test("occupancyPsi ≡ DriftStreams.psiFromCounts on random occupancy frames") {
    // ONE PSI semantics across the engine: the distributed detector and
    // the streaming monitor's driver fold must agree to the 4dp the
    // detector rounds to — including one-sided buckets (coalesce-0 vs
    // getOrElse-0 paths) and VARYING bucket counts (the smoothing is
    // 0.5 per contributing bucket, not a fixed +5, so the parity must
    // hold at 8 or 40 cells as well as the 10-decile case)
    val rnd = new scala.util.Random(10)
    for (nb <- Seq(8, 10, 40); _ <- 1 to 3) {
      val refM = (0 until nb).filter(_ => rnd.nextInt(10) > 0)
        .map(b => b -> (rnd.nextInt(500) + 1).toLong).toMap
      val curM = (0 until nb).filter(_ => rnd.nextInt(10) > 0)
        .map(b => b -> (rnd.nextInt(500) + 1).toLong).toMap
      val refDf = refM.toSeq.toDF("c_id", "n_ref")
      val curDf = curM.toSeq.toDF("c_id", "n_cur")
      val dist = Similarity.occupancyPsi(refDf, curDf).head().getDouble(0)
      val fold = BigDecimal(graft.streaming.DriftStreams.psiFromCounts(curM, refM))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(dist == fold, s"distributed $dist != driver fold $fold (ref=$refM cur=$curM)")
    }
    // an explicitly-present 0-0 bucket contributes nothing on either path
    val a = Map(0 -> 100L, 1 -> 50L); val b = Map(0 -> 80L, 1 -> 70L)
    val base = Similarity.occupancyPsi(
      a.toSeq.toDF("c_id", "n_ref"), b.toSeq.toDF("c_id", "n_cur"))
      .head().getDouble(0)
    val withZeros = Similarity.occupancyPsi(
      (a + (2 -> 0L)).toSeq.toDF("c_id", "n_ref"),
      (b + (2 -> 0L)).toSeq.toDF("c_id", "n_cur")).head().getDouble(0)
    assert(base == withZeros, "a 0-0 bucket must not shift PSI")
  }

  test("bulk kNN guard: rejects a mis-sized centroid set, passes a sqrt(n)-sized one") {
    val (corpus, centroids, _) = inputs()
    val probes = corpus.select(col("id").as("probe_id"), col("e").as("p"))
    try {
      Similarity.writeIvfIndex(corpus, centroids, "ivf_guard_index", numBuckets = 8)
      // the quadratic trap: force the guard with a tight factor — at
      // sf0.001 (~60 vectors, 10 cells) the default 8.0 would pass, so
      // the spec exercises the REJECT branch with factor small enough
      // that sqrt(n)/factor > |centroids| at any fixture size
      val ex = intercept[IllegalArgumentException] {
        Similarity.ivfTopKBulk("ivf_guard_index", centroids, probes,
          k = 3, nprobe = 2, maxShareFactor = 0.01)
      }
      assert(ex.getMessage.contains("sizing rule"),
        s"guard message must name the cost model: ${ex.getMessage}")
      // degenerate input: an empty centroid frame is its own failure,
      // not a vacuous pass of the sizing inequality
      val exEmpty = intercept[IllegalArgumentException] {
        Similarity.ivfTopKBulk("ivf_guard_index", centroids.limit(0), probes,
          k = 3, nprobe = 2)
      }
      assert(exEmpty.getMessage.contains("empty centroid set"))
      // and the pass side: the default factor admits this fixture, and
      // results are unchanged from the unguarded path's contract
      val ok = Similarity.ivfTopKBulk("ivf_guard_index", centroids, probes,
        k = 3, nprobe = 2)
      assert(ok.collect().nonEmpty, "guarded call must still return results")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_guard_index")
    }
  }

  test("bulk kNN sizing guard reads catalog stats when available (count() only as fallback)") {
    val (corpus, centroids, _) = inputs()
    val probes = corpus.select(col("id").as("probe_id"), col("e").as("p"))
    try {
      Similarity.writeIvfIndex(corpus, centroids, "ivf_stats_index", numBuckets = 8)
      val (nScan, viaStatsBefore) =
        Similarity.indexRowCount(spark, "ivf_stats_index")
      assert(!viaStatsBefore, "un-analyzed table must fall back to count()")
      // ANALYZE publishes a catalog row count; with plan stats on, the
      // optimizer exposes it and the guard becomes job-free
      spark.sql("ANALYZE TABLE ivf_stats_index COMPUTE STATISTICS")
      val prevCbo = spark.conf.getOption("spark.sql.cbo.enabled")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val (nStats, viaStats) =
          Similarity.indexRowCount(spark, "ivf_stats_index")
        assert(viaStats, "analyzed table + CBO must serve the count from stats")
        assert(nStats == nScan, s"stats count $nStats != scanned $nScan")
        // and the guard still FIRES through the stats path
        val ex = intercept[IllegalArgumentException] {
          Similarity.ivfTopKBulk("ivf_stats_index", centroids, probes,
            k = 3, nprobe = 2, maxShareFactor = 0.01)
        }
        assert(ex.getMessage.contains("sizing rule"), ex.getMessage)
        // Spark CLEARS catalog stats on any catalog-routed insert, which
        // would silently downgrade an analyzed index to count()-per-probe
        // on its first append — appendIvfIndex must re-ANALYZE so the
        // stats path survives the append AND serves the NEW count
        Similarity.appendIvfIndex(
          corpus.limit(5).select((col("id") + 1000000L).as("id"), col("e")),
          centroids, "ivf_stats_index")
        val (nFresh, viaStatsFresh) =
          Similarity.indexRowCount(spark, "ivf_stats_index")
        assert(viaStatsFresh && nFresh == nScan + 5,
          s"append must keep an analyzed index analyzed: got $nFresh via " +
            s"stats=$viaStatsFresh, want ${nScan + 5}")
        // the stats-zero edge: a catalog entry claiming numRows=0 over a
        // NON-empty index (only an out-of-band writer can produce it —
        // files dropped into the directory bypass Spark's
        // stats-clearing; injected here via the stats table properties
        // such a writer would leave behind) would DISARM the guard —
        // sqrt(0) passes any centroid set — so a zero must be treated
        // as no-stats and fall back to the scan
        Similarity.writeIvfIndex(corpus, centroids,
          "ivf_stats0_index", numBuckets = 8)
        spark.sql("ALTER TABLE ivf_stats0_index SET TBLPROPERTIES(" +
          "'spark.sql.statistics.numRows'='0'," +
          "'spark.sql.statistics.totalSize'='1')")
        val (nAfter, viaStats0) =
          Similarity.indexRowCount(spark, "ivf_stats0_index")
        assert(!viaStats0 && nAfter == nScan,
          s"stats-zero must fall back to the scan (got $nAfter via stats=$viaStats0)")
      } finally prevCbo match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None    => spark.conf.unset("spark.sql.cbo.enabled")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_stats_index")
      spark.sql("DROP TABLE IF EXISTS ivf_stats0_index")
    }
  }

  test("bulk kNN excludeSelf=false keeps the identity match as top-1") {
    val (corpus, centroids, _) = inputs()
    val probes = corpus.select(col("id").as("probe_id"), col("e").as("p"))
    try {
      Similarity.writeIvfIndex(corpus, centroids, "ivf_self_index", numBuckets = 8)
      val withSelf = Similarity.ivfTopKBulk("ivf_self_index", centroids, probes,
        k = 1, nprobe = 2, excludeSelf = false)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      assert(withSelf.nonEmpty)
      withSelf.foreach { case (pid, id, cos) =>
        assert(id == pid, s"probe $pid: identity match not top-1 (got $id)")
        assert(math.abs(cos - 1.0) < 1e-9, s"self-cosine $cos != 1")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_self_index")
    }
  }

  test("the production flow: train → build index on trained centroids → probe") {
    val (corpus, seeds, probes) = inputs()
    val trained = Similarity.kmeansTrain(corpus, seeds, iters = 2)
    try {
      Similarity.writeIvfIndex(corpus, trained, "ivf_trained_index", numBuckets = 8)
      val direct = Similarity.ivfTopK(corpus, trained, probes, k = 3, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val indexed = Similarity.ivfTopKIndexed("ivf_trained_index", trained, probes,
        k = 3, nprobe = 2)
      val got = indexed.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == direct, "trained-centroid index must reproduce the in-plan results")
      val plan = indexed.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(sel.isDefined && sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"trained index probe reads every bucket:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_trained_index")
    }
  }
}
