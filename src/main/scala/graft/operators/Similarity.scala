package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Two strategies, per the standard scale ladder:
  *  - [[bruteForceTopK]]: exact baseline. Probe set is broadcast; the corpus
  *    streams through one map stage computing cosines, then a per-probe
  *    window picks top-k. Linear in |corpus|×|probes| — right answer when
  *    the probe set is small, and the correctness oracle for ANN variants.
  *  - [[ivfTopK]]: inverted-file search. Corpus vectors are assigned to
  *    their nearest centroid once (map-only vs broadcast centroids); a probe
  *    only scans the `nprobe` clusters nearest to it, cutting scanned
  *    volume to ~nprobe/|centroids| of the corpus. The candidate join
  *    shuffles on the cluster id — at 100 TB the corpus would be written
  *    bucketed by cluster so the probe join is shuffle-free.
  *
  * All math is [[graft.functions.VectorFunctions]] column composition
  * (codegen'd, double precision, engine-portable).
  */
object Similarity {

  /** Exact top-k by cosine. `corpus`: (id, e); `probes`: (probe_id, p).
    * Deterministic tie-break on ascending corpus id. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("id"))
    corpus.join(broadcast(probes))
      .filter(col("id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("p"), col("e")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("id"), col("cos"))
  }

  /** Assign each corpus vector to its nearest centroid (cosine; ties broken
    * by ascending centroid id). `centroids`: (c_id, c). Map-only: centroids
    * are broadcast, corpus streams. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy(col("cos_c").desc, col("c_id"))
    corpus.join(broadcast(centroids))
      .withColumn("cos_c", cosine(col("e"), col("c")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("e"), col("c_id"))
  }

  /** IVF ANN: scan only the `nprobe` clusters nearest each probe. */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, probes: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    val assigned = ivfAssign(corpus, centroids)
    val wp = Window.partitionBy("probe_id").orderBy(col("cos_c").desc, col("c_id"))
    val probeClusters = probes.join(broadcast(centroids))
      .withColumn("cos_c", cosine(col("p"), col("c")))
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= nprobe)
      .select(col("probe_id"), col("p"), col("c_id"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("id"))
    probeClusters.join(assigned, "c_id")
      .filter(col("id") =!= col("probe_id"))
      .withColumn("cos", cosine(col("p"), col("e")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("id"), col("cos"))
  }
}
