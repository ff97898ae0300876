package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** One-off measurement probe (the LmScaleProbe/SimhashProbe convention):
  * recall@k of the IVF and IVF-PQ rungs vs the exact baseline across
  * nprobe — the sensitivity curve behind q130/q130b's single-point gates,
  * i.e. what a user tuning the recall/cost dial actually sweeps. Inputs
  * come from the SAME [[graft.queries.SimilarityQueries.ivfInputs]] the
  * gates use, and training happens ONCE per configuration via the
  * persisted-index flow (q130b's shape) — only the probe dial varies
  * inside the sweep.
  * Args: sfDir [k] [kSub] — kSub is the per-subspace codebook size
  * (default 16, q127's config; raise it to test the quantization-bound
  * diagnosis: if PQ recall is code-capacity-limited, more codes move it
  * where more probes could not). Prints one line per (rung, nprobe),
  * plus a RERANK sweep at the gated nprobe=2 (the q127d/q130c operator:
  * rerank ∈ {8, 32, 128} shortlist sizes, and rerank=10⁹ — every bucket
  * member re-scored exactly — as the PRUNING CEILING the re-rank can
  * never exceed at that nprobe, separating shortlist-bound from
  * pruning-bound residual error). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: Test/runMain graft.RecallProbe <sfDir> [k] [kSub]")
      sys.exit(2)
    }
    val k = if (args.length > 1) args(1).toInt else 3
    val kSub = if (args.length > 2) args(2).toInt else 16
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (corpus, seeds, probes) = graft.queries.SimilarityQueries.ivfInputs(spark, args(0))
    val exact = Similarity.bruteForceTopK(corpus, probes, k).cache()
    exact.count()
    // train ONCE (coarse quantizer + residual codebooks into the
    // persisted index, q130b's flow) — ivfPqTopK would re-run the full
    // PQ training on every nprobe point
    val coarse = Similarity.kmeansTrainL2(corpus, seeds, iters = 2)
    val bk = Similarity.writeIvfPqIndex(corpus, coarse, "graft_recall_probe_idx",
      m = 16, dim = 64, seedIds = 0L until kSub.toLong, iters = 2, numBuckets = 8)
    def mean(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg("recall")).head().getDouble(0)
    for (np <- Seq(1, 2, 4, 8)) {
      val ivf = Similarity.ivfTopK(corpus, seeds, probes, k, np)
      println(f"[recall] ivf     nprobe=$np%d  recall@$k%d = ${mean(Similarity.recallAtK(ivf, exact, k))}%.4f")
      val pq = Similarity.ivfPqTopKIndexed("graft_recall_probe_idx", coarse,
        probes, bk, k, np)
      println(f"[recall] ivf-pq  nprobe=$np%d kSub=$kSub%d  recall@$k%d = ${mean(Similarity.recallAtK(pq, exact, k))}%.4f")
    }
    for (rr <- Seq(8, 32, 128, 1000000000)) {
      val rrk = Similarity.ivfPqTopKRerankIndexed("graft_recall_probe_idx",
        coarse, probes, corpus, bk, k, nprobe = 2, rerank = rr)
      val tag = if (rr >= 1000000000) "ceil" else rr.toString
      println(f"[recall] rerank  nprobe=2 kSub=$kSub%d R=$tag%s  recall@$k%d = ${mean(Similarity.recallAtK(rrk, exact, k))}%.4f")
    }
    exact.unpersist()
    spark.sql("DROP TABLE IF EXISTS graft_recall_probe_idx")
    spark.sql("DROP TABLE IF EXISTS graft_recall_probe_idx_books")
    spark.stop()
  }
}
