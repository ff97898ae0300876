package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property check: [[TemporalJoins.scd2History]] against an independent
  * in-memory reference fold over seeded-random CDC streams — heavy
  * timestamp collisions, no-op runs, and null values included. The
  * reference is a direct transcription of the SCD2 definition (sort,
  * collapse consecutive equal values, number, close intervals), sharing
  * no code with the windowed operator. */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  /** The definitionally-obvious fold the operator must agree with. */
  private def reference(rows: Seq[(Long, Long, Long, Option[String])])
      : Set[(Long, Int, Option[String], Long, Option[Long], Boolean)] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3))
      val changes = ordered.foldLeft(Vector.empty[(Long, Option[String])]) {
        case (acc, (_, ts, _, v)) =>
          if (acc.nonEmpty && acc.last._2 == v) acc else acc :+ (ts, v)
      }
      changes.zipWithIndex.map { case ((ts, v), i) =>
        val to = if (i + 1 < changes.length) Some(changes(i + 1)._1) else None
        (k, i + 1, v, ts, to, to.isEmpty)
      }
    }.toSet

  test("random CDC streams: operator == reference fold (3 seeds)") {
    for (seed <- Seq(7, 42, 20260815)) {
      val rnd = new scala.util.Random(seed)
      // 400 rows over 12 keys; ts drawn from a SMALL range so same-key
      // same-ts ties are common; ~15% nulls; ~40% repeat values
      val rows: Seq[(Long, Long, Long, Option[String])] = (0 until 400).map { i =>
        val k = rnd.nextInt(12).toLong
        val ts = (rnd.nextInt(20) * 1000).toLong
        val v = if (rnd.nextInt(100) < 15) None
                else Some(("v" + rnd.nextInt(3)))
        (k, ts, i.toLong, v)
      }
      val cdc = rows.toDF("k", "tsl", "tie", "v")
        .select(col("k"), timestamp_millis(col("tsl")).as("ts"),
          col("tie"), col("v"))
      val got = TemporalJoins.scd2History(cdc, Seq("k"), "ts", "tie", "v")
        .select(col("k"), col("version"), col("v"),
          unix_millis(col("valid_from")).as("f"),
          unix_millis(col("valid_to")).as("t"), col("is_current"))
        .as[(Long, Int, Option[String], Long, Option[Long], Boolean)]
        .collect().toSet
      assert(got == reference(rows), s"seed $seed: operator != reference")
    }
  }

  test("random point-in-time lookups: as-of composition == interval-membership reference") {
    // the q128b composition in the general case: history → drop empty
    // [t,t) intervals → backward as-of on valid_from. The reference is
    // the DEFINITION — scan each fact's key history for the version
    // with valid_from <= ts < valid_to (null = ∞) — sharing no code
    // with the window/union machinery. Fact times are drawn from the
    // same small range as the CDC, so exact-boundary hits (ts ==
    // valid_from, ts == valid_to) and before-first-version misses all
    // occur.
    for (seed <- Seq(11, 20260815)) {
      val rnd = new scala.util.Random(seed)
      val cdcRows: Seq[(Long, Long, Long, Option[String])] = (0 until 300).map { i =>
        (rnd.nextInt(10).toLong, (rnd.nextInt(15) * 1000).toLong, i.toLong,
          if (rnd.nextInt(100) < 15) None else Some("v" + rnd.nextInt(3)))
      }
      val facts: Seq[(Long, Long, Long)] = (0 until 200).map { i =>
        (10000L + i, rnd.nextInt(10).toLong, (rnd.nextInt(17) * 1000 - 1000).toLong)
      }
      val hist = reference(cdcRows).toSeq
      val expected = facts.map { case (fid, k, ts) =>
        val hit = hist.find { case (hk, _, _, f, t, _) =>
          hk == k && ts >= f && t.forall(ts < _)
        }
        (fid, hit.map(_._2), hit.flatMap(_._3), hit.map(_._4))
      }.toSet

      val cdc = cdcRows.toDF("k", "tsl", "tie", "v")
        .select(col("k"), timestamp_millis(col("tsl")).as("ts"),
          col("tie"), col("v"))
      val dim = TemporalJoins.scd2History(cdc, Seq("k"), "ts", "tie", "v")
        .filter(col("valid_to").isNull || col("valid_to") > col("valid_from"))
        .select(col("k"), col("valid_from"), col("version"), col("v").as("status"))
      val factDf = facts.toDF("fact_id", "k", "tsl")
        .select(col("fact_id"), col("k"), timestamp_millis(col("tsl")).as("ts"))
      val got = TemporalJoins.asofJoin(factDf, dim, Seq("k"), "ts", "valid_from")
        .select(col("fact_id"), col("version"), col("status"),
          unix_millis(col("valid_from")).as("f"))
        .as[(Long, Option[Int], Option[String], Option[Long])]
        .collect().map(r => (r._1, r._2, r._3, r._4)).toSet
      assert(got == expected, s"seed $seed: PIT lookup != interval membership")
    }
  }
}
