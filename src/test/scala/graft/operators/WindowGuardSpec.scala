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
