package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *  3. every row gets a bin `pmod(xxhash64(key), n_files)`, bins map to
  *     a DENSE global task index, and ONE range shuffle with an
  *     EXPLICIT partition count co-locates each output file's rows in
  *     one task — large partitions rewrite in parallel across their
  *     bins, unlike the naive `repartition(partCols)` which serializes
  *     a hot partition through a single task (see `writeBinned` for why
  *     the count must be explicit);
  *  4. `partitionBy(partCols)` write: each task holds ~one (partition,
  *     bin) group, so it emits one output file in the right directory.
  *     Range-boundary sampling can land two ADJACENT bins in one task —
  *     that merges neighbors (fewer, larger files), never splits or
  *     misplaces rows.
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
    val df = spark.read.parquet(inputDir)
    val sizes = partitionSizes(df, partitionCols, targetBytes)
    // 3–4: bin assignment, one shuffle, partitioned write
    val binned = df.join(broadcast(sizes), partitionCols)
      .withColumn("__bin", pmod(xxhash64(col(binKey)), col("__n_files")))
    writeBinned(binned, sizes, partitionCols, outputDir, sortCk = false)
    sizes.withColumnRenamed("__n_files", "n_files")
  }

  /** Shared write tail: map each (partition, bin) to a DENSE task index
    * (per-partition offsets = running sum over the tiny sizes frame)
    * and `repartitionByRange(totalBins, __task)`. The EXPLICIT partition
    * count keeps AQE from coalescing the small-at-test-scale shuffle
    * into one task (a column-only `repartition` is adaptive, and one
    * task writes one file per directory — silently un-compacting the
    * plan); range partitioning on the ordered index means any residual
    * bin co-location merges only ADJACENT bins of the same partition,
    * which for clustered output keeps file key-ranges disjoint. */
  private def writeBinned(binned: DataFrame, sizes: DataFrame,
                          partitionCols: Seq[String], outputDir: String,
                          sortCk: Boolean): Unit = {
    val pcols = partitionCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(pcols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offs = sizes.withColumn("__off",
      coalesce(sum(col("__n_files")).over(w), lit(0L)))
      .select(pcols :+ col("__off"): _*)
    val totalBins = sizes.agg(coalesce(sum(col("__n_files")), lit(0L)))
      .head.getLong(0).toInt
    val tasked = binned.join(broadcast(offs), partitionCols)
      .withColumn("__task", col("__off") + col("__bin"))
      .repartitionByRange(math.max(totalBins, 1), col("__task"))
    (if (sortCk) tasked.sortWithinPartitions(col("__task"), col("__ck"))
     else tasked)
      .drop("__n_files", "__bounds", "__fine", "__bin", "__off", "__task", "__ck")
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(outputDir)
  }

  /** Steps 1–2 of [[compact]]: per-partition input bytes from the
    * `_metadata` hidden columns → target output file count. */
  private def partitionSizes(df: DataFrame, partitionCols: Seq[String],
                             targetBytes: Long): DataFrame = {
    require(partitionCols.nonEmpty, "compaction needs >= 1 partition column")
    require(targetBytes > 0)
    val pcols = partitionCols.map(col)
    df.select(pcols :+ col("_metadata.file_path").as("__f")
        :+ col("_metadata.file_size").as("__sz"): _*)
      .distinct()
      .groupBy(pcols: _*)
      .agg(ceil(sum(col("__sz")).cast("double") / targetBytes)
        .cast("int").as("__n_files"))
      .select(pcols :+ greatest(col("__n_files"), lit(1)).as("__n_files"): _*)
  }

  /** CLUSTERED compaction — the `OPTIMIZE ... ZORDER BY` shape: like
    * [[compact]], but each partition's rows are split into target-size
    * files by RANGE over `clusterKey` (typically a
    * [[Bucketing.zOrderKey]]), so every output file covers a tight,
    * disjoint key range and parquet min/max footer statistics prune
    * scans on the clustered dimensions (data skipping).
    *
    * Scale shape: the naive form — one sort task per Hive partition —
    * serializes hot partitions; instead a per-partition QUANTILE GRID
    * of the cluster key (one `approx_percentile` aggregate, broadcast
    * back, O(partitions · grid) rows) turns bin assignment into a pure
    * map-side monotone function of the key: bin = floor(#gridBounds ≤
    * key · n_files / grid). One shuffle on (partition, bin) then
    * co-locates each output file; `sortWithinPartitions` orders rows
    * inside it (task-local sort, no global exchange). Rows with EQUAL
    * keys always share a bin, so file ranges are disjoint by
    * construction — CompactionSpec pins that on the actual footer
    * stats. Grid accuracy only affects file-size balance, never
    * row placement correctness. */
  def compactClustered(spark: SparkSession, inputDir: String, outputDir: String,
                       partitionCols: Seq[String], clusterKey: Column,
                       targetBytes: Long, grid: Int = 128): DataFrame = {
    require(grid >= 2)
    val pcols = partitionCols.map(col)
    val df = spark.read.parquet(inputDir).withColumn("__ck", clusterKey)
    val sizes = partitionSizes(df, partitionCols, targetBytes)
    val fracs = (1 until grid).map(_.toDouble / grid)
    val bounds = df.groupBy(pcols: _*)
      .agg(percentile_approx(col("__ck"), array(fracs.map(lit): _*), lit(10000))
        .as("__bounds"))
    val binned = df.join(broadcast(sizes), partitionCols)
      .join(broadcast(bounds), partitionCols)
      .withColumn("__fine",
        size(filter(col("__bounds"), b => b <= col("__ck"))))
      .withColumn("__bin",
        floor(col("__fine").cast("double") * col("__n_files") / grid).cast("long"))
    writeBinned(binned, sizes, partitionCols, outputDir, sortCk = true)
    sizes.withColumnRenamed("__n_files", "n_files")
  }
}
