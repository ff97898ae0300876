package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact join (lineitem⋈orders) is
  * shuffling both sides on the key. Writing both tables bucketed by that
  * key with the SAME bucket count pre-partitions them on disk: Catalyst
  * then plans a sort-merge join with NO Exchange on either side
  * (asserted in BucketingSpec). Bucket count rule of thumb: total size /
  * target task input (128–512 MB), rounded to a power of two.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int, sort: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet").bucketBy(numBuckets, key)
    (if (sort) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free by
    * construction when bucket counts match. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
