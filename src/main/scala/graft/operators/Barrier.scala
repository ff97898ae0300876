package graft.operators

import org.apache.spark.sql.DataFrame

/** The ONE materialization barrier every multi-consumer query site
  * routes through (CorpusOps q86's scrub output, TextAnalytics' tf and
  * BM25 stats frames, DedupQueries' leaked-id audit, the banded-guard
  * aggregates and iterative lineage cuts in [[Dedup]]) — so the
  * local-vs-durable choice is a DEPLOYMENT setting, not an edit to
  * query code. ([[GraphAlgos]]' eager loops route their cuts through
  * here too, so the conf upgrades them like everything else; the
  * explicit previous-block unpersist pairing stays owned there — block
  * management a generic helper must not have.)
  *
  * Default: `localCheckpoint()` — executor-local blocks, the right
  * trade on a stable-executor cluster and in every local/bench run
  * (no extra I/O path, measured wins at the call sites). Its known
  * limit: blocks die with their executors, so under dynamic
  * allocation or spot kills a multi-hour job can lose a barrier
  * mid-flight and fail unrecoverable.
  *
  * Cluster-durable form: set `graft.barrier.checkpointDir` to a
  * fault-tolerant path (HDFS/S3) and every cut() in the session
  * becomes a reliable `checkpoint()` to that directory — the same
  * upgrade [[Dedup.connectedComponents]]' explicit `checkpointDir`
  * parameter performs for its own loop, generalized. The conf is read
  * per cut (session-dynamic), and the SparkContext checkpoint dir is
  * set on first use if the caller has not set one. Storage note (as on
  * connectedComponents): Spark does not delete reliable checkpoint
  * files unless `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * or the caller clears the directory after consuming the result.
  *
  * Deliberately NOT keyed on the SparkContext's checkpoint dir alone:
  * that is context-global mutable state any operator (or user code)
  * may set for its own loop, and silently flipping every unrelated
  * barrier in the session to 2×-compute reliable checkpoints on that
  * side effect is exactly the spooky action a shared helper must not
  * have. The conf is the explicit opt-in — and it WINS: each conf'd
  * cut re-points the context checkpoint dir at the conf'd path, so a
  * loop that set its own dir earlier in the session (e.g.
  * connectedComponents' parameter) cannot silently redirect every
  * later barrier's files. Cost: one mkdir per cut — barriers are a
  * handful per query, not per row. */
object Barrier {

  /** The session conf that upgrades every [[cut]] to a reliable
    * checkpoint: a fault-tolerant directory path. Unset (default) =
    * localCheckpoint. */
  val ConfKey = "graft.barrier.checkpointDir"

  /** Materialize `df` once and cut its lineage — localCheckpoint by
    * default, reliable checkpoint() when [[ConfKey]] is set. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) =>
        spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
