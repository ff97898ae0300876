package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the `OPTIMIZE` table-maintenance primitive
  * (Delta/Iceberg bin-packing rewrite): streaming ingest and
  * fine-grained partitioning leave thousands of KB-scale files per
  * partition; scans then pay per-file open/footer/scheduling costs that
  * dwarf the I/O. Compaction rewrites each Hive partition's files into
  * ~target-size outputs, preserving the row multiset and the partition
  * directory structure (a partition-pruned read stays pruned after).
  *
  * Plan shape, 100 TB-ready:
  *  1. per-partition input bytes from the `_metadata.file_size` hidden
  *     column (distinct (file, size) pairs → sum) — file-listing scale,
  *     no data read;
  *  2. target file count per partition `ceil(bytes / targetBytes)`,
  *     broadcast back onto the rows (one skinny dim of O(#partitions));
  *  3. every row gets a bin `pmod(xxhash64(key), n_files)` and ONE
  *     shuffle on (partition cols, bin) co-locates each output file's
  *     rows in one task — large partitions rewrite in parallel across
  *     their bins, unlike the naive `repartition(partCols)` which
  *     serializes a hot partition through a single task;
  *  4. `partitionBy(partCols)` write: each task holds exactly one
  *     (partition, bin) group, so it emits one output file in the right
  *     directory. Bin-count is approximate where hash collisions land
  *     two bins of the SAME partition in one task — that merges bins
  *     (fewer, larger files), never splits or misplaces rows.
  *
  * Row identity is the caller's to verify cheaply with the
  * order-independent q120 checksum (bit_xor of row hashes) — the
  * CompactionSpec and the q124 oracle both do.
  */
object Compaction {

  /** Rewrite the Hive-partitioned parquet table at `inputDir` into
    * `outputDir` with ~`targetBytes` files, preserving rows and the
    * `partitionCols` directory layout. `binKey` sprays rows across a
    * partition's bins (any roughly-uniform column; defaults callers
    * pass a key column). Returns the per-partition plan actually used
    * (partition values, input bytes, n_files) for observability. */
  def compact(spark: SparkSession, inputDir: String, outputDir: String,
              partitionCols: Seq[String], binKey: String,
              targetBytes: Long): DataFrame = {
    require(partitionCols.nonEmpty, "compaction needs >= 1 partition column")
    require(targetBytes > 0)
    val pcols = partitionCols.map(col)
    val df = spark.read.parquet(inputDir)

    // 1–2: per-partition byte totals → file counts (file-listing scale)
    val sizes = df
      .select(pcols :+ col("_metadata.file_path").as("__f")
        :+ col("_metadata.file_size").as("__sz"): _*)
      .distinct()
      .groupBy(pcols: _*)
      .agg(ceil(sum(col("__sz")).cast("double") / targetBytes)
        .cast("int").as("__n_files"))
      .select(pcols :+ greatest(col("__n_files"), lit(1)).as("__n_files"): _*)

    // 3–4: bin assignment, one shuffle, partitioned write
    val binned = df
      .join(broadcast(sizes), partitionCols)
      .withColumn("__bin", pmod(xxhash64(col(binKey)), col("__n_files")))
    binned
      .repartition(pcols :+ col("__bin"): _*)
      .drop("__n_files", "__bin")
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(outputDir)
    sizes.withColumnRenamed("__n_files", "n_files")
  }
}
