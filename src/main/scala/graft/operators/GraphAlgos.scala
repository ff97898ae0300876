package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph algorithms over plain (src, dst) edge DataFrames —
  * the iterative-computation family (PageRank) and the multi-way
  * self-join family (triangles), both expressed as relational plans so
  * Catalyst owns the physical strategy.
  *
  * Scale notes:
  *  - PageRank is the canonical shuffle-per-iteration workload: each
  *    step is join(ranks ⋈ edges on src) → groupBy(dst) sum. At 100 TB
  *    the win is pre-partitioning `edges` by src (bucketed table) so the
  *    per-iteration join reuses the layout and only the skinny rank
  *    frame shuffles; iteration count is fixed (driver loop over lazy
  *    plans — nothing materializes until the action).
  *  - Triangle counting uses the degree-orientation trick: orient every
  *    undirected edge from the lower-(degree, id) endpoint to the
  *    higher, count directed wedges closed by an oriented edge. Each
  *    wedge join is bounded by Σ orientedDeg² where oriented out-degree
  *    is ≤ √(2m) — the standard m^{3/2} bound instead of Σ deg².
  */
object GraphAlgos {

  /** `iters` PageRank steps at damping `d` over `edges` (src, dst; no
    * dangling nodes — every node needs ≥1 out-edge). Returns
    * (node, rank). Node set = src ∪ dst. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double,
               checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val nDf = nodes.agg(count(lit(1)).cast("double").as("n"))
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    var ranks = nodes.crossJoin(broadcast(nDf))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    (1 to iters).foreach { i =>
      // checkpointEvery > 0 truncates the lineage every K steps — what
      // GraphX/ALS do at scale, where re-planning/re-executing an
      // iters-deep join tree dominates; at small scale the lazy plan is
      // cheaper than materializing intermediates, so 0 (fully lazy) is
      // the default and the spec pins both paths identical
      if (checkpointEvery > 0 && i > 1 && (i - 1) % checkpointEvery == 0)
        ranks = ranks.localCheckpoint(true)
      val contrib = ranks.join(edges, col("node") === col("src"))
        .join(deg, "src")
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      ranks = nodes.crossJoin(broadcast(nDf))
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(1.0 - damping) / col("n") +
            lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
    }
    ranks
  }

  /** Per-node triangle counts of the UNDIRECTED graph given as a
    * symmetric-free edge list (each undirected edge once, src < dst not
    * required; self-loops and duplicates are cleaned here). Returns
    * (node, n_triangles) for nodes in ≥1 triangle. */
  def triangles(edges: DataFrame): DataFrame = {
    // canonical undirected form: a < b, deduped, no loops
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("v"))
      .union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient from the (degree, id)-smaller endpoint
    val da = deg.select(col("v").as("a"), col("d").as("da"))
    val db = deg.select(col("v").as("b"), col("d").as("db"))
    val oriented = und.join(da, "a").join(db, "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("lo"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("hi"))
    // wedges lo→x, lo→y (x < y by id) closed by oriented edge x→y or y→x:
    // since orientation is total, the closing edge is oriented from the
    // (degree,id)-smaller of x,y — join both legs via the canonical
    // undirected form instead
    val w1 = oriented.select(col("lo"), col("hi").as("x"))
    val w2 = oriented.select(col("lo"), col("hi").as("y"))
    val wedges = w1.join(w2, "lo").filter(col("x") < col("y"))
    val closed = wedges.join(
      und.select(col("a").as("x"), col("b").as("y")), Seq("x", "y"))
    closed.select(explode(array(col("lo"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
