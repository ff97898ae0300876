package graft.operators

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compaction must reduce file counts, preserve the row multiset, and
  * keep the partition directory structure prunable. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def partFiles(dir: Path): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    Files.list(dir).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
      .map { p =>
        val n = Files.list(p).iterator().asScala
          .count(_.getFileName.toString.startsWith("part-"))
        p.getFileName.toString -> n
      }.toMap
  }

  test("compact: fewer files, identical rows, partitions still prune") {
    val base = Files.createTempDirectory("compaction")
    val in = base.resolve("in"); val out = base.resolve("out")
    // many-small-files fixture: 24 shuffle outputs per partition dir
    val df = spark.range(30000).select(
      (col("id") % 4).as("p"), col("id").as("k"),
      md5(col("id").cast("string")).as("payload"))
    df.repartition(24).write.partitionBy("p").parquet(in.toString)
    val before = partFiles(in)
    assert(before.values.forall(_ >= 20), s"fixture not fragmented: $before")

    val plan = Compaction.compact(spark, in.toString, out.toString,
      partitionCols = Seq("p"), binKey = "k", targetBytes = 400L * 1024)
      .as[(Long, Int)].collect().toMap

    // file counts dropped to the per-partition plan (~bytes/target, here
    // a handful at most vs 24), and every partition dir survived
    val after = partFiles(out)
    assert(after.keySet == before.keySet, s"partition dirs changed: $after")
    after.foreach { case (p, n) =>
      assert(n < before(p) / 2, s"$p: $n files after vs ${before(p)} before")
      val pv = p.split("=")(1).toLong
      assert(n <= plan(pv), s"$p wrote $n files > planned ${plan(pv)}")
    }

    // row multiset preserved: order-independent bit_xor digest + count
    def digest(dir: String) = spark.read.parquet(dir)
      .withColumn("h",
        conv(substring(md5(concat_ws("|", col("p"), col("k"),
          col("payload"))), 1, 15), 16, 10).cast("long"))
      .agg(count(lit(1)), expr("bit_xor(h)")).as[(Long, Long)].head()
    assert(digest(out.toString) == digest(in.toString), "row multiset changed")

    // pruning: a partition predicate on the compacted table must resolve
    // from directory names (PartitionFilters), not data filters
    val scan = spark.read.parquet(out.toString).filter(col("p") === 2)
    val explained = scan.queryExecution.executedPlan.toString
    assert(explained.contains("PartitionFilters: [isnotnull(p"),
      s"no partition pruning after compaction:\n$explained")
    assert(scan.count() == 7500)
  }

  test("clustered compaction: disjoint per-file key ranges, rows preserved") {
    val base = Files.createTempDirectory("compaction-z")
    val in = base.resolve("in"); val out = base.resolve("out")
    // unsorted fixture: cluster key is a scrambled function of id
    val df = spark.range(30000).select(
      (col("id") % 4).as("p"),
      ((col("id") * 2654435761L) % 100000).as("k"),
      md5(col("id").cast("string")).as("payload"))
    df.repartition(24).write.partitionBy("p").parquet(in.toString)
    val before = partFiles(in)

    Compaction.compactClustered(spark, in.toString, out.toString,
      partitionCols = Seq("p"), clusterKey = col("k"),
      targetBytes = 48L * 1024)

    // fewer files than the fragmented input
    val after = partFiles(out)
    assert(after.keySet == before.keySet)
    after.foreach { case (p, n) =>
      assert(n > 1 && n < before(p) / 2, s"$p: $n files after vs ${before(p)}")
    }

    // row multiset preserved
    def digest(dir: String) = spark.read.parquet(dir)
      .withColumn("h",
        conv(substring(md5(concat_ws("|", col("p"), col("k"),
          col("payload"))), 1, 15), 16, 10).cast("long"))
      .agg(count(lit(1)), expr("bit_xor(h)")).as[(Long, Long)].head()
    assert(digest(out.toString) == digest(in.toString), "row multiset changed")

    // the clustering contract: within each partition, per-FILE key
    // ranges are pairwise disjoint (what parquet footer min/max stats
    // reflect — the data-skipping property)
    val ranges = spark.read.parquet(out.toString)
      .groupBy(col("p"), col("_metadata.file_path").as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .orderBy("p", "lo")
      .as[(Long, String, Long, Long)].collect()
    ranges.groupBy(_._1).foreach { case (p, rs) =>
      rs.sliding(2).foreach {
        case Array((_, _, _, hi1), (_, f2, lo2, _)) =>
          assert(hi1 < lo2, s"partition $p: overlapping file ranges at $f2")
        case _ =>
      }
    }
  }

  test("sizing subplan is O(files): binaryFile listing, no data scan, no window") {
    val base = Files.createTempDirectory("compaction-sizing")
    val in = base.resolve("in")
    spark.range(5000).select((col("id") % 3).as("p"), col("id").as("k"))
      .repartition(8).write.partitionBy("p").parquet(in.toString)
    val sizes = Compaction.partitionSizes(spark, in.toString, Seq("p"), 64L * 1024)
    val plan = sizes.queryExecution.executedPlan.toString
    // the sizing scan is the binaryFile LISTING (one row per file —
    // path/length + inferred partition values), not a parquet data scan:
    // at 100 TB this is O(files), zero data bytes
    assert(plan.contains("binaryFile"), s"sizing not listing-based:\n$plan")
    assert(!plan.contains("Format: Parquet") && !plan.contains("FileScan parquet"),
      s"sizing scans the data files:\n$plan")
    // content column pruned — the listing must never read file bytes
    assert(!plan.contains("content"), s"sizing reads file content:\n$plan")
    // offsets are computed driver-side from the O(#partitions) frame:
    // no Window anywhere in the compaction plans (the unpartitioned
    // WindowExec warning of r8 is gone by construction)
    val out = base.resolve("out")
    Compaction.compact(spark, in.toString, out.toString,
      partitionCols = Seq("p"), binKey = "k", targetBytes = 64L * 1024)
    assert(!sizes.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("compact: single-file partitions are not exploded") {
    val base = Files.createTempDirectory("compaction-noop")
    val in = base.resolve("in"); val out = base.resolve("out")
    spark.range(100).select((col("id") % 2).as("p"), col("id").as("k"))
      .coalesce(1).write.partitionBy("p").parquet(in.toString)
    Compaction.compact(spark, in.toString, out.toString,
      partitionCols = Seq("p"), binKey = "k", targetBytes = 128L * 1024 * 1024)
    val after = partFiles(out)
    assert(after.values.forall(_ == 1), s"tiny partitions fragmented: $after")
  }
}
