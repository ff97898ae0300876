package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame}

/** Input-layout probe + fan-out — the optimization guide's §2.5 remedy
  * for INPUT skew ("one huge unsplittable file … repartition immediately
  * after the read"), made layout-adaptive so it is a no-op wherever the
  * scan already parallelizes.
  *
  * Why it exists: a parquet scan's effective parallelism is its ROW-GROUP
  * count, not its split count — a split only does work when a row group's
  * midpoint lands in it. Single-file single-row-group tables (exactly the
  * bench inputs, and any un-compacted ingest drop) therefore serialize
  * every map-side kernel (tokenize / regex / fingerprint / vector math)
  * on one core no matter the cluster size, and every downstream stage
  * inherits the skew until the first exchange.
  *
  * [[fanOut]] probes the path's layout ONCE per JVM (driver-side footer
  * metadata only — never data; the probe short-circuits at `cores` files
  * without opening a footer, so a 100 TB table with thousands of files
  * costs one directory listing and repartitions nothing) and inserts a
  * deterministic hash repartition to `defaultParallelism` only when the
  * layout under-fills the machine. Hash keys (not round-robin) keep the
  * exchange free of the sort-before-repartition pass and deterministic
  * under task retry (guide §2.5's SPARK-38388 note). The explicit
  * partition count pins the exchange against AQE coalescing — the bytes
  * are tiny precisely when the fix is needed (CPU-bound kernels over
  * small-byte rows, where byte-proxy coalescing re-serializes the work).
  */
object ScanLayout {

  /** (path, cap) → effective slice count; layout is immutable for the
    * life of a run (the ensureServeIndex convention), so probe once. */
  private val probed = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Number of row groups across the path's parquet files, capped at
    * `cap`: listing stops counting at `cap` files (no footer reads), and
    * footer reads stop as soon as the running row-group sum reaches it. */
  def effectiveSlices(df: DataFrame, path: String, cap: Int): Int = {
    val key = s"$cap:$path"
    val cached = probed.get(key)
    if (cached != null) return cached.intValue()
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val n =
      if (files.length >= cap) cap
      else {
        var sum = 0
        val it = files.iterator
        while (sum < cap && it.hasNext) {
          val r = ParquetFileReader.open(HadoopInputFile.fromStatus(it.next(), conf))
          try sum += r.getRowGroups.size
          finally r.close()
        }
        math.min(sum, cap)
      }
    probed.put(key, n)
    n
  }

  /** `df` hash-repartitioned to `defaultParallelism` on `keys` iff the
    * parquet layout under `path` yields fewer effective slices than the
    * machine has cores; `df` unchanged otherwise. Apply between a read
    * and a compute-heavy map stage. Row-set identical either way (a
    * repartition only moves rows); only use above order-insensitive
    * consumers (aggregations keyed on the data, per-row kernels). */
  def fanOut(df: DataFrame, path: String, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "fanOut needs at least one deterministic hash key")
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (effectiveSlices(df, path, cores) >= cores) df
    else df.repartition(cores, keys: _*)
  }
}
