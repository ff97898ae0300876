package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal binary-column operators over the documents table (payload =
  * utf-8 bytes standing in for image/audio blobs; see
  * [[graft.multimodal.Multimodal]] — decode is a documented deterministic
  * stub, the binary plumbing is real). */
object MultimodalQueries {

  /** Binary payload metadata + stub-decoded dimensions, end-to-end through
    * the real mapPartitions extraction stage. */
  val q37MultimodalMeta = QueryDef(
    "q37_multimodal_meta",
    (s, d) => {
      import s.implicits._
      val media = Multimodal.attachPayload(Tables.documents(s, d), "text", "doc_id")
        .withColumn("kind", col("kind"))
        .select(col("media_id"), col("kind"), col("payload"),
          lit(0).as("width"), lit(0).as("height"), col("n_bytes"))
        .as[Multimodal.MediaRow]
      Multimodal.extractFeatures(media).toDF()
        .orderBy("media_id")
    },
    Some("""
      WITH m AS (
        SELECT doc_id AS media_id, md5(text) AS content_hash,
               ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        FROM documents),
      dims AS (
        SELECT media_id, content_hash,
               ((h % 640) + 1)::INT AS width,
               (((h // 640) % 480) + 1)::INT AS height
        FROM m)
      SELECT media_id, content_hash, width, height,
             CASE WHEN width >= height THEN 'landscape' ELSE 'portrait' END AS aspect_bucket
      FROM dims
      ORDER BY media_id
    """))

  val all: Seq[QueryDef] = Seq(q37MultimodalMeta)
}
