package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graph operators against hand-computable fixtures. */
class GraphAlgosSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank conserves mass and solves a 3-cycle exactly") {
    // 1→2→3→1: perfectly symmetric, every rank must stay 1/3
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = GraphAlgos.pageRank(cyc, iters = 10, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12, pr.toString))
    // an asymmetric graph: mass conserved, sink-ward node ranks highest
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val pr2 = GraphAlgos.pageRank(g, iters = 30, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(pr2.values.sum - 1.0) < 1e-9, s"mass leak: ${pr2.values.sum}")
    // 3 collects from 1 (half) AND 2 (all); 1 collects all of 3; 2 only
    // half of 1 — stationary order is 3 > 1 > 2
    assert(pr2(3L) > pr2(1L) && pr2(1L) > pr2(2L), pr2.toString)
    // lineage-truncated path (the 100 TB formulation) is value-identical
    val prCk = GraphAlgos.pageRank(g, iters = 30, damping = 0.85,
        checkpointEvery = 5)
      .as[(Long, Double)].collect().toMap
    assert(prCk == pr2, s"checkpointed path diverged: $prCk vs $pr2")
  }

  test("triangles counts K4 and ignores pendant paths") {
    // K4 (every vertex in 3 triangles) plus a pendant path 4-5-6
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val t = GraphAlgos.triangles(edges).as[(Long, Long)].collect().toMap
    assert(t == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), t.toString)
    // direction/duplication/self-loop insensitivity
    val messy = edges.unionByName(
      Seq((2L, 1L), (3L, 3L), (1L, 2L)).toDF("src", "dst"))
    val t2 = GraphAlgos.triangles(messy).as[(Long, Long)].collect().toMap
    assert(t2 == t, s"canonicalization broke: $t2")
  }
}
