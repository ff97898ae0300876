package graft.operators

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Scale guard: an unpartitioned `Window.orderBy` funnels its whole
  * input through one task, so the codebase allows it ONLY inside
  * [[Windows.distinctRank]], where a distributed distinct-aggregate
  * bounds the input first. Enforced by source scan (grep-able
  * invariant) + a behavior check. */
class WindowGuardSpec extends SparkSpec {
  import spark.implicits._

  test("the only unpartitioned window in main source is Windows.distinctRank") {
    val root = Paths.get("src/main/scala")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p: Path =>
        val text = new String(Files.readAllBytes(p), "UTF-8")
        if (text.contains("Window.orderBy")) Some(p.toString) else None
      }.toList
    assert(offenders == List("src/main/scala/graft/operators/Windows.scala"),
      s"unpartitioned Window.orderBy outside Windows.distinctRank: $offenders")
  }

  test("whole-table sketches: constant-group hazard pinned, global form bounded") {
    import org.apache.spark.sql.functions._
    val df = spark.range(10000).select(lit(1).as("g"), col("id"),
      (col("id") % 97).cast("double").as("v"))
    // THE HAZARD, pinned so a Spark upgrade that fixes it is noticed: a
    // CONSTANT group column folds out of the window partition spec and
    // the optimizer then SKIPS the WindowGroupLimit insertion — every
    // row funnels through one unpartitioned window task. This is why
    // whole-table sketches must use the global form below.
    val grouped = Sketches.quantileSketch(df, "g", col("id"), col("v"), 50,
      "wg", Seq(0.5))
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"),
      "constant-group windows now get WindowGroupLimit — revisit " +
        "quantileSketchAll's rationale (and keep it: TakeOrdered is still " +
        "the better plan)")
    // the GLOBAL form plans as TakeOrdered: per-partition top-k map-side,
    // O(partitions*k) over the exchange — bounded at any table size
    val global = Sketches.quantileSketchAll(df, col("id"), col("v"), 50,
      "wg", Seq(0.5))
    val gplan = global.queryExecution.executedPlan.toString
    assert(gplan.contains("TakeOrderedAndProject"),
      s"global sketch lost the TakeOrdered shape:\n$gplan")
    // and the two forms agree exactly (same k-smallest-by-(h,v) sample)
    val a = grouped.select("n_kept", "q50").head()
    val b = global.head()
    assert(a.getLong(0) == b.getLong(0) && a.getDouble(1) == b.getDouble(1))
  }

  test("distinctRank numbers distinct keys densely in sort order") {
    val df = Seq("b", "a", "b", "c", "a").toDF("k")
    val ranked = Windows.distinctRank(df, "k", "i")
      .as[(String, Int)].collect().toMap
    assert(ranked == Map("a" -> 1, "b" -> 2, "c" -> 3))
    // joined back, every original row is numbered; dups share a rank
    val joined = df.join(ranked.toSeq.toDF("k", "i"), Seq("k"))
    assert(joined.count() == 5)
  }
}
