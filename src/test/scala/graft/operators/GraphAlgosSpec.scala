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
  }

  test("pageRank conserves mass on graphs WITH dangling nodes") {
    // 1→2, 1→3, 2→3; node 3 is a SINK (no out-edge). Without the
    // dangling-mass term Σrank decays toward (1-d) = 0.15 — the silent
    // wrong answer on real host graphs.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val pr = GraphAlgos.pageRank(g, iters = 50, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9,
      s"mass leak with sink: Σ=${pr.values.sum}")
    // the sink collects from both others: highest rank
    assert(pr(3L) > pr(1L) && pr(3L) > pr(2L), pr.toString)
    // exact replay: 50 driver-side power-iteration steps with the same
    // update (contrib + dangling redistribution) must agree ~bitwise
    val d = 0.85; val base = (1.0 - d) / 3
    var (r1, r2, r3) = (1.0 / 3, 1.0 / 3, 1.0 / 3)
    (1 to 50).foreach { _ =>
      val dm = r3 // only the sink is dangling
      val n1 = base + d * (0.0 + dm / 3)
      val n2 = base + d * (r1 / 2 + dm / 3)
      val n3 = base + d * ((r1 / 2 + r2) + dm / 3)
      r1 = n1; r2 = n2; r3 = n3
    }
    assert(math.abs(pr(1L) - r1) < 1e-12 && math.abs(pr(2L) - r2) < 1e-12 &&
      math.abs(pr(3L) - r3) < 1e-12, s"$pr vs ($r1,$r2,$r3)")
    // an ALL-dangling graph (edge into a sink-only world): 2-node graph
    // 1→2 — node 2 redistributes everything, ranks stay finite and sum 1
    val tiny = Seq((1L, 2L)).toDF("src", "dst")
    val prT = GraphAlgos.pageRank(tiny, iters = 30, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(prT.values.sum - 1.0) < 1e-9, prT.toString)
    assert(prT(2L) > prT(1L))
    // caller-asserted hasSinks agrees with the probed default on both
    // shapes (the assertion only skips the probe, never changes values)
    val prAsserted = GraphAlgos.pageRank(g, iters = 50, damping = 0.85,
        hasSinks = Some(true)).as[(Long, Double)].collect().toMap
    assert(prAsserted == pr, s"asserted path diverged: $prAsserted vs $pr")
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val cycProbe = GraphAlgos.pageRank(cyc, iters = 10, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    val cycAsserted = GraphAlgos.pageRank(cyc, iters = 10, damping = 0.85,
        hasSinks = Some(false)).as[(Long, Double)].collect().toMap
    assert(cycAsserted == cycProbe)
  }

  test("pageRank honors graft.barrier.checkpointDir: reliable cuts, same ranks") {
    // the session-wide durable-barrier opt-in must flow through the
    // eager loop's cuts (executor-local blocks die with their executors
    // on a spot/dynamic-allocation cluster — a multi-hour PageRank must
    // be upgradeable by conf, not by editing the loop)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val plain = GraphAlgos.pageRank(g, iters = 5, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-ckpt")
    try {
      spark.conf.set(Barrier.ConfKey, dir.toString)
      val durable = GraphAlgos.pageRank(g, iters = 5, damping = 0.85)
        .as[(Long, Double)].collect().toMap
      assert(durable == plain, s"conf'd ranks drifted: $durable vs $plain")
      // reliable checkpoints actually landed in the conf'd directory
      val wrote = java.nio.file.Files.walk(dir).count() > 1
      assert(wrote, s"no checkpoint files under $dir")
    } finally {
      spark.conf.unset(Barrier.ConfKey)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  test("bfsDistances: multi-source min-hop, unreachable absent, cap and early-exit") {
    // directed graph: 1→2→3→4→5 chain, 10→3 shortcut, 6→7 an island,
    // 8 isolated (unreachable from any source)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 3L),
      (6L, 7L)).toDF("src", "dst")
    val sources = Seq(1L, 10L).toDF("node")
    val got = GraphAlgos.bfsDistances(edges, sources, maxIters = 10)
      .as[(Long, Long)].collect().toMap
    // 3 is reachable in 2 hops from 1 but ONE hop from 10 — min wins
    assert(got == Map(1L -> 0L, 10L -> 0L, 2L -> 1L, 3L -> 1L,
      4L -> 2L, 5L -> 3L), got.toString)
    // cap: maxIters=1 keeps only the first ring
    val capped = GraphAlgos.bfsDistances(edges, sources, maxIters = 1)
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(1L -> 0L, 10L -> 0L, 2L -> 1L, 3L -> 1L))
    // early-exit: the frontier dies at distance 3; a large maxIters
    // must not loop further (and an empty source set returns empty)
    assert(GraphAlgos.bfsDistances(edges, sources, maxIters = 50)
      .as[(Long, Long)].collect().toMap == got)
    assert(GraphAlgos.bfsDistances(edges,
      Seq.empty[Long].toDF("node"), maxIters = 5).isEmpty)
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
