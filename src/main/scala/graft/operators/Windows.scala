package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window helpers with scale guards. */
object Windows {

  /** Deterministic 1-based dense rank of the DISTINCT values of `keyCol`.
    *
    * This is the ONLY sanctioned unpartitioned window in the codebase
    * (WindowGuardSpec enforces it by source scan): a global
    * `Window.orderBy` funnels its entire input through one task, so it
    * may only ever run on a provably bounded input. Here the distributed
    * distinct-aggregate reduces the input to the key set first; the
    * single-task sort then touches one row per key, not one per input
    * row. Broadcast-join the result back to number the original rows. */
  def distinctRank(df: DataFrame, keyCol: String, rankName: String): DataFrame =
    df.select(keyCol).distinct()
      .withColumn(rankName, dense_rank().over(Window.orderBy(keyCol)))

  /** Global top-`n` with a 1-based rank column — the retrieval "top-k
    * with ranks" shape (q96 BM25).
    *
    * The other sanctioned unpartitioned window, bounded by construction:
    * `orderBy.limit(n)` executes as TakeOrderedAndProject (per-partition
    * heaps + driver merge — the global selection is distributed and
    * carries ≤ n·partitions rows), and only the ≤ n surviving rows enter
    * the single-task ranking window. The same `order` drives both, so
    * the rank is consistent with the selection. */
  def topKRank(df: DataFrame, n: Int, rankName: String,
               order: org.apache.spark.sql.Column*): DataFrame = {
    require(n > 0 && n <= 100000, s"topKRank bound must be small, got $n")
    df.orderBy(order: _*).limit(n)
      .withColumn(rankName, row_number().over(Window.orderBy(order: _*)))
  }
}
