package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result equals plain join on a hot-key distribution") {
    // 90% of fact rows hit key 1 (the skew pattern salting exists for)
    val fact = (1 to 1000)
      .map(i => (if (i <= 900) 1L else (i % 50).toLong, i.toLong))
      .toDF("k", "fact_id")
    val dim = (0 to 49).map(k => (k.toLong, s"dim_$k")).toDF("k", "dim_val")

    val plain = fact.join(dim, "k")
      .select("k", "fact_id", "dim_val").as[(Long, Long, String)].collect().toSet
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "k", numSalts = 8,
        saltBy = Seq(col("fact_id")))
      .select("k", "fact_id", "dim_val").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("hot key actually spreads across the salt space") {
    val fact = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "fact_id")
    val salts = fact.withColumn("__salt",
        pmod(xxhash64(col("fact_id")), lit(8)).cast("int"))
      .groupBy("__salt").count().as[(Int, Long)].collect().toMap
    assert(salts.size == 8)
    assert(salts.values.max < 1000 * 0.3, s"salt distribution too skewed: $salts")
  }
}
