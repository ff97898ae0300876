package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}
import graft.operators.Sampling

/** q131 split-leakage audit + q131b remediation: the split labels must
  * be the SAME pure function groupedSplit attaches (parity), the audit
  * must add ZERO exchanges to the near-dup join it rides (the 100 TB
  * contract — a join against the split assignment would re-shuffle the
  * corpus), every reported row must be a genuine cross-split near-dup
  * pair, and the remediation must be exactly eval-split ∖ audit with
  * only the output sort shuffling. */
class SplitLeakageSpec extends SparkSpec {
  import spark.implicits._

  private val fracs = Seq("train" -> 0.8, "eval" -> 0.2)

  /** Shuffle-exchange count of a registry query's formatted plan (also
    * rejects cartesians). One definition for every plan pin here. */
  private def exchanges(name: String): Int = {
    val p = plan(name)
    assert(!p.contains("CartesianProduct"), s"$name degenerated:\n$p")
    "\\(\\d+\\) Exchange".r.findAllIn(p).size
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("splitLabel is exactly groupedSplit's assignment (parity)") {
    val docs = (1L to 3000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val viaOp = Sampling.groupedSplit(docs, "doc_id", "sp2", fracs)
      .select(col("doc_id"), col("split"))
    val viaCol = docs.select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"), "sp2", fracs).as("split"))
    assert(viaOp.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaOp).isEmpty)
    // both names present at roughly the configured rates
    val byName = viaCol.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(byName("train").toDouble / 3000.0 - 0.8) < 0.03)
    assert(math.abs(byName("eval").toDouble / 3000.0 - 0.2) < 0.03)
  }

  test("q131 adds zero exchanges over q64 — the split is map-side") {
    assert(exchanges("q131_split_leakage") == exchanges("q64_simhash_neardup"))
  }

  test("q131b: audit materialized once, anti-join broadcast, only the sort shuffles") {
    // the leaked-id frame is checkpointed (the audit runs exactly once —
    // without it Catalyst pushes the anti-join below the corpus Union and
    // duplicates the banded-join lineage into both branches), so the
    // remediation's ONLY shuffle is the output sort. ONE plan fetch
    // serves all three pins: each queries() call eagerly re-runs the
    // audit (localCheckpoint), so repeated fetches re-pay that job.
    val p = plan("q131b_leakage_remediation")
    assert(!p.contains("CartesianProduct"), s"degenerated:\n$p")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, s"plan:\n$p")
    assert(exchanges("q131_split_leakage") > 1) // the audit's own shuffles
    // and the anti-join really is broadcast (the corpus side must not
    // shuffle against the output-sized leaked-id frame)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"remediation anti-join not broadcast:\n$p")
  }

  test("q131b = eval split minus exactly q131's leaked eval ids") {
    val audit = SparkEntry.queries("q131_split_leakage")(spark, sf001)
      .select(col("eval_id")).distinct()
    val evalSplit: DataFrame = {
      // same corpus construction as the queries (documents + near-dup copies)
      val doc = graft.Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
      doc.unionByName(doc.select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "^[^ ]+ ", "").as("text")))
        .filter(Sampling.splitLabel(col("doc_id"), "sp2", fracs) === "eval")
        .select("doc_id")
    }
    // cache: every action on `cleaned` would otherwise re-run the whole
    // audit job (the eager localCheckpoint inside the query body)
    val cleaned = SparkEntry.queries("q131b_leakage_remediation")(spark, sf001)
      .cache()
    try {
      val expected = evalSplit.join(audit.withColumnRenamed("eval_id", "doc_id"),
        Seq("doc_id"), "left_anti")
      assert(cleaned.exceptAll(expected).isEmpty && expected.exceptAll(cleaned).isEmpty)
      // the remediation must actually remove something on the dup-dense corpus
      val n = cleaned.count()
      assert(n < evalSplit.count())
      assert(n > 0)
    } finally cleaned.unpersist()
  }

  test("every reported pair is a genuine cross-split near-dup; audit is non-empty") {
    val out = SparkEntry.queries("q131_split_leakage")(spark, sf001)
      .withColumn("s_eval", Sampling.splitLabel(col("eval_id"), "sp2", fracs))
      .withColumn("s_train", Sampling.splitLabel(col("train_id"), "sp2", fracs))
      .cache()
    assert(out.count() > 0, "dup-dense corpus must leak under a doc-level split")
    assert(out.filter(col("s_eval") =!= "eval" || col("s_train") =!= "train").isEmpty,
      "a reported pair does not straddle the split")
    assert(out.filter(col("hamming") > 3).isEmpty)
    out.unpersist()
  }
}
