package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 2-D toy corpus: two obvious clusters along the axes.
  private val corpus = Seq(
    (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.8, 0.05)),
    (4L, Seq(0.0, 1.0)), (5L, Seq(0.1, 0.9))
  ).toDF("id", "e")

  private val probes = Seq((100L, Seq(1.0, 0.01))).toDF("probe_id", "p")

  test("bruteForceTopK ranks by cosine with deterministic tie-break") {
    val r = Similarity.bruteForceTopK(corpus, probes, 3)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
    assert(r.map(_._3).toSeq == Seq(1L, 3L, 2L))
    assert(r.map(_._2).toSeq == Seq(1, 2, 3))
    assert(r.head._4 > 0.999)
  }

  test("ivfAssign buckets vectors to nearest centroid") {
    val centroids = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("c_id", "c")
    val a = Similarity.ivfAssign(corpus, centroids)
      .select("id", "c_id").as[(Long, Int)].collect().toMap
    assert(a == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1))
  }

  test("ivfTopK with nprobe=1 searches only the probe's cluster") {
    val centroids = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("c_id", "c")
    val r = Similarity.ivfTopK(corpus, centroids, probes, k = 5, nprobe = 1)
      .as[(Long, Int, Long, Double)].collect()
    assert(r.map(_._3).toSet == Set(1L, 2L, 3L)) // axis-y cluster never scanned
  }
}
