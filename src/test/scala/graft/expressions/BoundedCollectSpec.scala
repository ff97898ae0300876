package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

import graft.SparkSpec

/** [[BoundedCollectList]] — the O(cap) membership carrier of the banded
  * dedup guard. Pins: complete below the cap, witnesses (never hides)
  * overflow, and the guarded join recovers over-cap membership through
  * the broadcast fallback, not the truncated array. */
class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  private def collected(groups: Seq[(Int, Long)], cap: Int): Map[Int, Seq[Long]] = {
    val c = column(BoundedCollectList(
      expression(col("v")), cap).toAggregateExpression())
    groups.toDF("g", "v").groupBy("g").agg(c.as("vs"))
      .as[(Int, Seq[Long])].collect().toMap
  }

  test("groups at or below the cap keep every element") {
    val data = (1L to 4L).map(v => (1, v)) ++ Seq((2, 10L))
    val got = collected(data, cap = 4)
    assert(got(1).sorted === Seq(1L, 2L, 3L, 4L))
    assert(got(2) === Seq(10L))
  }

  test("overflowing groups are witnessed by size > cap, bounded by cap + 1") {
    val data = (1L to 100L).map(v => (1, v))
    val got = collected(data, cap = 8)
    assert(got(1).size === 9) // cap + 1: witnesses overflow, never grows past it
    assert(got(1).toSet.subsetOf((1L to 100L).toSet))
  }

  test("nulls are skipped like collect_list") {
    val c = column(BoundedCollectList(
      expression(col("v")), 8).toAggregateExpression())
    val got = Seq((1, Some(5L)), (1, None), (1, Some(7L)))
      .toDF("g", "v").groupBy("g").agg(c.as("vs"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1).sorted === Seq(5L, 7L))
  }

  test("membership costs exactly ONE upstream evaluation (two with overflow)") {
    // the whole point of carrying membership in the bounded collect: the
    // (expensive) pipeline that produces the fingerprints must run once,
    // not once per consumer branch. Counted with a side-effecting UDF —
    // if a refactor reintroduces a join-back or per-branch aggregate
    // specialization, this number jumps.
    def countedRun(memberCap: Int): Long = {
      val acc = spark.sparkContext.longAccumulator(s"upstream_rows_$memberCap")
      val base = Seq((1L, "0000111100001111"), (2L, "0000111100001111"),
        (10L, "1111000011110000"), (20L, "0101010101010101")).toDF("sid", "fp")
      val tracked = base.filter(
        udf((_: Long) => { acc.add(1); true }).apply(col("sid")))
      graft.operators.Dedup.bandedHammingPairsGuarded(
        tracked, Nil, bits = 16, bands = 2, memberCap = memberCap)
        .membership.collect()
      acc.value
    }
    assert(countedRun(memberCap = 8) === 4L,
      "no-overflow membership re-evaluated the upstream input")
    // with overflow (cap 1 < the 2-member group) the broadcast recovery
    // pass legitimately reads the input once more — and only once more
    assert(countedRun(memberCap = 1) === 8L,
      "overflow recovery should cost exactly one extra upstream pass")
  }

  test("an over-cap NULL-fingerprint group keeps every member (null-safe recovery)") {
    // undecodable inputs share fp = NULL; when such a group exceeds the
    // cap its members must come back through the overflow join, which a
    // plain equi-join on fp would silently drop
    val fps = Seq[(Long, String)](
      (1L, null), (2L, null), (3L, null), (4L, null), (5L, null),
      (10L, "1111000011110000"), (20L, "0101010101010101"))
      .toDF("sid", "fp")
    val g = graft.operators.Dedup.bandedHammingPairsGuarded(
      fps, Nil, bits = 16, bands = 2, memberCap = 2)
    val membership = g.membership.as[(Long, Long)].collect().toMap
    assert(membership === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 10L -> 10L, 20L -> 20L),
      "null-fp members lost by the overflow recovery join")
  }

  test("guarded join recovers over-cap membership via the broadcast fallback") {
    // one 5-member identical group with memberCap=2 → overflow path;
    // one 2-member group → bounded-array path; one singleton
    val fps = Seq(
      (1L, "0000111100001111"), (2L, "0000111100001111"),
      (3L, "0000111100001111"), (4L, "0000111100001111"),
      (5L, "0000111100001111"),
      (10L, "1111000011110000"), (11L, "1111000011110000"),
      (20L, "0101010101010101")).toDF("sid", "fp")
    val g = graft.operators.Dedup.bandedHammingPairsGuarded(
      fps, Nil, bits = 16, bands = 2, memberCap = 2)
    val membership = g.membership.as[(Long, Long)].collect().toMap
    assert(membership === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
    val multi = g.multiMembers.select("sid").as[Long].collect().toSet
    assert(multi === Set(1L, 2L, 3L, 4L, 5L, 10L, 11L))
    // pairs stay at the representative level
    val pairs = g.pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 > 1L && p._1 < 10L), "non-rep sid paired")
  }
}
