package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** q43 (exact percentile, test-scale oracle) vs q43b (approx_percentile,
  * the 100 TB path): the sketch's rank-error guarantee must hold against
  * the exact form, and the oracle-facing bound booleans must all be true.
  */
class PercentilesSpec extends SparkSpec {

  test("q43b bound booleans are all true (the oracle contract)") {
    val rows = Relational.q43bPercentilesApprox.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3),
        s"rank bound violated for group ${r.get(0)}: $r")
    }
  }

  test("approx_percentile value error vs exact percentile is small") {
    val li = Tables.lineitem(spark, sf001).select("l_returnflag", "l_extendedprice")
    val joined = li.groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("exact"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)").as("approx"))
      .select(col("l_returnflag"), col("exact"), col("approx"))
      .collect()
    joined.foreach { r =>
      val exact = r.getSeq[Double](1)
      val approx = r.getSeq[Double](2)
      exact.zip(approx).foreach { case (e, a) =>
        // accuracy=10000 → rank eps 1e-4; on sf0.001 (~6k rows/group) that
        // still allows a couple of ranks of slack — value-space tolerance
        // of 1% relative covers it with a wide margin while still failing
        // hard if the sketch were wrong.
        assert(math.abs(a - e) <= 0.01 * math.abs(e),
          s"approx $a vs exact $e for group ${r.getString(0)}")
      }
    }
  }
}
