package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  // ---- asofJoin -----------------------------------------------------------

  private def leftDf = Seq(
    (1L, "u1", 100L), // exact tie with a right row at t=100
    (2L, "u1", 150L), // between right rows
    (3L, "u1", 10L),  // before any right row → nulls
    (4L, "u2", 500L), // different key
    (5L, "u3", 500L)  // key with no right rows at all → nulls
  ).toDF("id", "k", "t")

  private def rightDf = Seq(
    ("u1", 100L, "a"),
    ("u1", 120L, "b"),
    ("u2", 499L, "c"),
    ("u2", 501L, "d") // after the only u2 left row → never matches
  ).toDF("k", "rt", "v")

  test("asofJoin picks the latest right row at or before each left time") {
    val out = TemporalJoins.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt")
      .orderBy("id")
      .select("id", "rt", "v")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
    assert(out === Seq(
      (1L, 100L, "a"),  // inclusive: rt == t matches
      (2L, 120L, "b"),  // latest of {100, 120} <= 150
      (3L, -1L, null),  // nothing at or before t=10
      (4L, 499L, "c"),  // 501 excluded (future)
      (5L, -1L, null))) // no u3 right rows
  }

  test("asofJoin emits all right payload columns from the same matched row") {
    val right = Seq(("u1", 100L, "a", 1.0), ("u1", 120L, "b", 2.0))
      .toDF("k", "rt", "v", "w")
    val out = TemporalJoins.asofJoin(leftDf.filter($"k" === "u1"), right, Seq("k"), "t", "rt")
      .filter($"id" === 2L).select("v", "w").head()
    assert(out === Row("b", 2.0)) // both from the rt=120 row, never mixed
  }

  test("asofJoin preserves left row count (it is a left join)") {
    val out = TemporalJoins.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt")
    assert(out.count() === leftDf.count())
  }

  test("asofJoin ignores right rows with a null time") {
    val right = Seq(("u1", Some(100L), "a"), ("u1", None, "ghost"))
      .toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoin(leftDf, right, Seq("k"), "t", "rt")
      .orderBy("id").select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // id=3 (t=10, before every real right row) must stay unmatched — the
    // null-time row would otherwise win via nulls-first + last(ignoreNulls)
    assert(out === Seq((1L, "a"), (2L, "a"), (3L, null), (4L, null), (5L, null)))
  }

  test("asofJoin rejects a lossy right-time cast (timestamp → date)") {
    val left = Seq((1L, "u1", java.sql.Date.valueOf("2024-01-02")))
      .toDF("id", "k", "t")
    val right = Seq(("u1", java.sql.Timestamp.valueOf("2024-01-02 13:00:00"), "a"))
      .toDF("k", "rt", "v")
    assertThrows[IllegalArgumentException] {
      TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt")
    }
  }

  test("asofJoin direction=forward picks the earliest right at or after") {
    val out = TemporalJoins.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
        direction = "forward")
      .orderBy("id").select("id", "rt", "v").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
    assert(out === Seq(
      (1L, 100L, "a"),  // inclusive: rt == t matches forward too
      (2L, -1L, null),  // nothing at or after t=150 for u1
      (3L, 100L, "a"),  // earliest of {100, 120} >= 10
      (4L, 501L, "d"),  // 499 is in the past now
      (5L, -1L, null)))
    // forward + tolerance: the t=10 row's match at 100 is 90 away
    val tight = TemporalJoins.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
        tolerance = Some(lit(89L)), direction = "forward")
      .filter($"id" === 3L).select("rt").head()
    assert(tight.isNullAt(0))
    // a left row with a NULL time never matches forward (the following
    // frame would otherwise hand it the globally earliest right)
    val withNull = Seq((9L, "u1", Option.empty[Long])).toDF("id", "k", "t")
    val nm = TemporalJoins.asofJoin(withNull, rightDf, Seq("k"), "t", "rt",
        direction = "forward").select("rt").head()
    assert(nm.isNullAt(0), "null-time left matched forward")
  }

  test("asofJoin forward matches the naive inequality join for random data") {
    val left = spark.range(300).select(
      $"id".as("lid"),
      pmod(hash($"id"), lit(7)).cast("string").as("k"),
      pmod(hash($"id" + 3), lit(500)).cast("long").as("t"))
    val right = spark.range(150).select(
        pmod(hash($"id" + 11), lit(7)).cast("string").as("k"),
        pmod(hash($"id" + 17), lit(500)).cast("long").as("rt"),
        $"id".as("v"))
      .groupBy("k", "rt").agg(max("v").as("v"))
    val fast = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt",
        direction = "forward")
      .select("lid", "rt", "v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    val best = left.join(right, Seq("k"), "left")
      .filter(col("rt").isNull || col("rt") >= col("t"))
      .groupBy("lid").agg(min("rt").as("rt"))
    val naive = left.select("lid", "k")
      .join(best, Seq("lid"), "left")
      .join(right, Seq("k", "rt"), "left")
      .select("lid", "rt", "v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(fast === naive)
  }

  test("asofJoin tolerance nulls stale matches, keeps fresh ones") {
    val out = TemporalJoins.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
        tolerance = Some(lit(30L)))
      .orderBy("id").select("id", "rt").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out === Seq(
      (1L, 100L), // exact tie: age 0 <= 30
      (2L, 120L), // age 30 <= 30 (inclusive)
      (3L, -1L),
      (4L, 499L), // age 1
      (5L, -1L)))
    val tight = TemporalJoins.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt",
        tolerance = Some(lit(29L)))
      .filter($"id" === 2L).select("rt").head()
    assert(tight.isNullAt(0), "age-30 match must be discarded at tolerance 29")
  }

  test("asofJoin rejects colliding column names") {
    val bad = rightDf.withColumnRenamed("v", "id")
    assertThrows[IllegalArgumentException] {
      TemporalJoins.asofJoin(leftDf, bad, Seq("k"), "t", "rt")
    }
    assertThrows[IllegalArgumentException] {
      TemporalJoins.asofJoin(leftDf.withColumn("__tag", lit(1)), rightDf, Seq("k"), "t", "rt")
    }
  }

  test("rangeJoin rejects shared and reserved column names") {
    assertThrows[IllegalArgumentException] {
      TemporalJoins.rangeJoin(pointsDf, col("pt"),
        intervalsDf.withColumnRenamed("iid", "pid"), col("lo"), col("hi"), 8L)
    }
    assertThrows[IllegalArgumentException] {
      TemporalJoins.rangeJoin(pointsDf.withColumn("__pt", col("pt")), col("pt"),
        intervalsDf, col("lo"), col("hi"), 8L)
    }
  }

  test("asofJoin plans one keyed window, not a nested-loop join") {
    val p = TemporalJoins.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("Window"), s"expected keyed window:\n$p")
  }

  test("asofJoin matches the naive inequality join for random data") {
    val left = spark.range(300).select(
      $"id".as("lid"),
      pmod(hash($"id"), lit(7)).cast("string").as("k"),
      pmod(hash($"id" + 3), lit(500)).cast("long").as("t"))
    val right = spark.range(150).select(
        pmod(hash($"id" + 11), lit(7)).cast("string").as("k"),
        pmod(hash($"id" + 17), lit(500)).cast("long").as("rt"),
        $"id".as("v"))
      .groupBy("k", "rt").agg(max("v").as("v")) // unique per (k, rt)

    val fast = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt")
      .select("lid", "rt", "v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

    val best = left.join(right, Seq("k"), "left")
      .filter(col("rt").isNull || col("rt") <= col("t"))
      .groupBy("lid").agg(max("rt").as("rt"))
    val naive = left.select("lid", "k")
      .join(best, Seq("lid"), "left")
      .join(right, Seq("k", "rt"), "left")
      .select("lid", "rt", "v")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

    assert(fast === naive)
  }

  // ---- rangeJoin ----------------------------------------------------------

  private def pointsDf = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L))
    .toDF("pid", "pt")
  private def intervalsDf = Seq((10L, 10L, 20L), (20L, 0L, 100L), (30L, 40L, 40L))
    .toDF("iid", "lo", "hi")

  test("rangeJoin is [lo, hi) and emits each matching pair exactly once") {
    val out = TemporalJoins.rangeJoin(
        pointsDf, col("pt"), intervalsDf, col("lo"), col("hi"), bucketWidth = 8L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    // interval 10 = [10,20): points 10, 19 (20 excluded); interval 20 = [0,100): all;
    // interval 30 is empty (hi == lo) and must vanish.
    assert(out === Seq(
      (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L), (3L, 20L), (4L, 20L), (5L, 20L)).sorted)
  }

  test("rangeJoin matches the naive inequality join for random data") {
    val pts = spark.range(200).select($"id".as("pid"), pmod(hash($"id"), lit(1000)).cast("long").as("pt"))
    val ivs = spark.range(40).select(
      $"id".as("iid"),
      pmod(hash($"id" + 7), lit(900)).cast("long").as("lo"))
      .withColumn("hi", $"lo" + pmod(hash($"iid" + 13), lit(150)).cast("long"))
    val fast = TemporalJoins.rangeJoin(pts, col("pt"), ivs, col("lo"), col("hi"), 64L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    val naive = pts.join(ivs, col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted
    assert(fast === naive)
  }

  test("rangeJoin plans a hash join on the bucket id, not a nested loop") {
    val p = TemporalJoins.rangeJoin(
        pointsDf, col("pt"), intervalsDf, col("lo"), col("hi"), 8L)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("HashJoin"), s"expected hash join on bucket:\n$p")
  }
}
