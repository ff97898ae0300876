package graft

import org.apache.spark.sql.execution.ExplainMode

/** Spark 4 pushes rank()<=k filters into WindowGroupLimit (partial per-
  * partition top-k before the shuffle) — confirm q06 benefits, so the
  * built-in window path IS the optimal top-k-per-key operator and no
  * custom SparkPlan is warranted (SURVEY §4). */
class WindowLimitSpec extends SparkSpec {
  test("q06 window top-k gets the WindowGroupLimit partial pushdown") {
    val p = SparkEntry.queries("q06_window_topk")(spark, sf001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p")
  }
}
