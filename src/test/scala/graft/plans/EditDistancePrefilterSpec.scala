package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The levenshtein length-prefilter rule: injected guard visible in the
  * optimized plan, semantics preserved, idempotent under the fixed-point
  * batch, and scoped to upper bounds only. */
class EditDistancePrefilterSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    graft.GraftExtensions.register(spark) // installs extraOptimizations
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == EditDistancePrefilter)
  }

  // parquet-backed pairs: local relations constant-fold straight through
  // the optimizer (filter included), which would hide the rewrite
  private lazy val pairs = graft.Tables.documents(spark, sf001)
    .select(col("text").as("a"),
      regexp_replace(col("text"), "^[^ ]+ ", "").as("b"),
      col("doc_id"))

  test("guard appears in the optimized plan and prunes by length first") {
    withRule {
      val q = pairs.filter(levenshtein($"a", $"b") <= 8)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("abs(") && opt.contains("length("),
        s"no length guard injected:\n$opt")
      // semantics: identical row set with the rule removed
      val got = q.select("doc_id").as[Long].collect().toSet
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == EditDistancePrefilter)
      val want = pairs.filter(levenshtein($"a", $"b") <= 8)
        .select("doc_id").as[Long].collect().toSet
      assert(got == want && got.nonEmpty)
    }
  }

  test("rule is idempotent under the fixed-point optimizer batch") {
    withRule {
      val opt = pairs.filter(levenshtein($"a", $"b") <= 8)
        .queryExecution.optimizedPlan.toString
      val guards = "abs\\(\\(length".r.findAllIn(opt).size max
        "abs\\(".r.findAllIn(opt).size
      assert(guards == 1, s"guard duplicated ($guards):\n$opt")
    }
  }

  test("lower-bound predicates are untouched; non-literal k works") {
    withRule {
      val lower = pairs.filter(levenshtein($"a", $"b") >= 2)
        .queryExecution.optimizedPlan.toString
      assert(!lower.contains("abs("), s"guard wrongly added:\n$lower")
      // k from a column: guard still sound and result matches unguarded
      val df = pairs.withColumn("k", length($"b") - length($"b") + 8)
      val got = df.filter(levenshtein($"a", $"b") <= $"k")
        .select("doc_id").as[Long].collect().toSet
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == EditDistancePrefilter)
      val want = df.filter(levenshtein($"a", $"b") <= $"k")
        .select("doc_id").as[Long].collect().toSet
      assert(got == want && got.nonEmpty)
    }
  }
}
