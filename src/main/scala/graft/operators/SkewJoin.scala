package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (fact) side deterministically and
  * replicate the build (dim) side across the salt space, so one hot key
  * spreads over `numSalts` reducers instead of stalling a single task.
  *
  * Complements AQE's skew-join split (`spark.sql.adaptive.skewJoin.*`,
  * which only kicks in for sort-merge joins past size thresholds): manual
  * salting also covers aggregate-free hot-key joins and keeps working when
  * AQE is off. Results are identical to the plain join — salting is a
  * physical-distribution trick, so the DuckDB oracle for a salted query is
  * simply the unsalted SQL.
  *
  * The salt is `pmod(xxhash64(fact row key cols + disambiguator), n)` —
  * deterministic (reproducible runs, resumable shuffles), unlike rand(). */
object SkewJoin {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted `numSalts` ways.
    * `saltBy` columns (default: all fact columns) feed the salt hash —
    * pass the fact's unique id for even spreading. */
  def saltedInnerJoin(fact: DataFrame, dim: DataFrame, key: String,
                      numSalts: Int, saltBy: Seq[Column]): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltBy: _*), lit(numSalts)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
