package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("attachPayload produces binary payload with correct byte length") {
    val m = Multimodal.attachPayload(docs, "text", "doc_id")
    assert(m.schema("payload").dataType.typeName == "binary")
    val mism = m.join(docs, m("media_id") === docs("doc_id"))
      .filter(col("n_bytes") =!= length(col("text"))).count()
    assert(mism == 0) // ascii corpus: bytes == chars
  }

  test("extractFeatures: deterministic stub decode, bounded dims, md5 hash") {
    val media = Multimodal.attachPayload(docs, "text", "doc_id")
      .select(col("media_id"), col("kind"), col("payload"),
        lit(0).as("width"), lit(0).as("height"), col("n_bytes"))
      .as[Multimodal.MediaRow]
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq) // deterministic
    assert(f1.forall(f => f.width >= 1 && f.width <= 640))
    assert(f1.forall(f => f.height >= 1 && f.height <= 480))
    assert(f1.forall(f => f.content_hash.length == 32))
    // hash matches md5 of the original text bytes
    val expected = docs.select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("h"))
      .as[(Long, String)].collect().toMap
    assert(f1.forall(f => expected(f.media_id) == f.content_hash))
  }
}
