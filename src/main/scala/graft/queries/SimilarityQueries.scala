package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Similarity-search suite over the `embeddings` table (SURVEY.md north
  * star): exact brute-force cosine top-k as the baseline, IVF
  * (centroid-bucketed) search as the 100 TB scale path.
  *
  * Centroids are the embedding of the smallest vec_id per label — a
  * deterministic "seed medoid" choice both engines reproduce exactly
  * (a float mean would be accumulation-order-sensitive across engines).
  */
object SimilarityQueries {

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))

  /** Exact ANN baseline: 20 probes × full corpus, top-5 by cosine. */
  val q27AnnBruteForce = QueryDef(
    "q27_ann_bruteforce",
    (s, d) => {
      val corpus = emb(s, d).select(col("vec_id").as("id"), col("e"))
      val probes = emb(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("probe_id"), col("e").as("p"))
      Similarity.bruteForceTopK(corpus, probes, 5)
        .select(col("probe_id"), col("rank"), col("id"), round(col("cos"), 9).as("cos"))
        .orderBy("probe_id", "rank")
    },
    Some("""
      WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      probes AS (SELECT vec_id AS probe_id, e AS p FROM emb WHERE vec_id < 20),
      scored AS (
        SELECT probe_id, vec_id AS id,
               list_dot_product(p, e) /
               (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(e, e))) AS cos,
               row_number() OVER (PARTITION BY probe_id
                 ORDER BY list_dot_product(p, e) /
                   (sqrt(list_dot_product(p, p)) * sqrt(list_dot_product(e, e))) DESC,
                   vec_id) AS rank
        FROM emb CROSS JOIN probes
        WHERE vec_id <> probe_id)
      SELECT probe_id, rank, id, round(cos, 9) AS cos
      FROM scored WHERE rank <= 5
      ORDER BY probe_id, rank
    """),
    bench = true)

  /** IVF ANN: corpus bucketed by nearest seed-centroid; probes scan only
    * their 2 nearest clusters. */
  val q28AnnIvf = QueryDef(
    "q28_ann_ivf",
    (s, d) => {
      val e = emb(s, d)
      val ws = org.apache.spark.sql.expressions.Window
        .partitionBy("label").orderBy("vec_id")
      val centroids = e
        .withColumn("rn", row_number().over(ws)).filter(col("rn") === 1)
        .select(col("label").as("c_id"), col("e").as("c"))
      val corpus = e.select(col("vec_id").as("id"), col("e"))
      val probes = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("probe_id"), col("e").as("p"))
      Similarity.ivfTopK(corpus, centroids, probes, k = 3, nprobe = 2)
        .select(col("probe_id"), col("rank"), col("id"), round(col("cos"), 9).as("cos"))
        .orderBy("probe_id", "rank")
    },
    Some("""
      WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
      seeds AS (SELECT label, min(vec_id) AS seed_id FROM emb GROUP BY label),
      cent AS (
        SELECT s.label AS c_id, e.e AS c
        FROM seeds s JOIN emb e ON e.vec_id = s.seed_id),
      assigned AS (
        SELECT vec_id AS id, e, c_id FROM (
          SELECT emb.vec_id, emb.e, cent.c_id,
                 row_number() OVER (PARTITION BY emb.vec_id
                   ORDER BY list_dot_product(e, c) /
                     (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(c, c))) DESC,
                     cent.c_id) AS rn
          FROM emb CROSS JOIN cent)
        WHERE rn = 1),
      probes AS (
        SELECT probe_id, p, c_id FROM (
          SELECT emb.vec_id AS probe_id, emb.e AS p, cent.c_id,
                 row_number() OVER (PARTITION BY emb.vec_id
                   ORDER BY list_dot_product(e, c) /
                     (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(c, c))) DESC,
                     cent.c_id) AS rn
          FROM emb CROSS JOIN cent
          WHERE emb.vec_id < 20)
        WHERE rn <= 2),
      scored AS (
        SELECT p.probe_id, a.id,
               list_dot_product(p.p, a.e) /
               (sqrt(list_dot_product(p.p, p.p)) * sqrt(list_dot_product(a.e, a.e))) AS cos,
               row_number() OVER (PARTITION BY p.probe_id
                 ORDER BY list_dot_product(p.p, a.e) /
                   (sqrt(list_dot_product(p.p, p.p)) * sqrt(list_dot_product(a.e, a.e))) DESC,
                   a.id) AS rank
        FROM probes p JOIN assigned a ON a.c_id = p.c_id
        WHERE a.id <> p.probe_id)
      SELECT probe_id, rank, id, round(cos, 9) AS cos
      FROM scored WHERE rank <= 3
      ORDER BY probe_id, rank
    """))

  val all: Seq[QueryDef] = Seq(q27AnnBruteForce, q28AnnIvf)
}
