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
}
