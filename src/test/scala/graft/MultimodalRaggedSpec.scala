package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Pins the stubbed decode pipeline's plumbing and the ragged
  * pack ∘ explode = id law (i3cols offsets semantics — SURVEY.md §2.1
  * R3/R8). */
class MultimodalRaggedSpec extends SparkSpec {
  import spark.implicits._

  test("multimodal_decode emits one typed feature row per document") {
    val docs = Tables.documents(spark, sf001)
    val out = SparkEntry.queries("multimodal_decode")(spark, sf001)
    assert(out.columns.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "mean_byte", "frame_count"))
    assert(out.count() == docs.count())
    // the native ByteMean kernel is deterministic: mean_byte equals the
    // driver-side recomputation (same fround) for a sampled row
    val row = out.where(col("doc_id") === 0).collect().head
    val text = docs.where(col("doc_id") === 0).select("text").as[String].collect().head
    val bytes = text.getBytes("UTF-8")
    val mean = math.floor(
      bytes.map(b => (b & 0xff).toLong).sum.toDouble / bytes.length * 10000 + 0.5) / 10000
    assert(row.getDouble(3) == mean)
    assert(row.getLong(2) == bytes.length.toLong)
    assert(row.getLong(4) == 1L + bytes.length % 30)
  }

  test("decodeFeatures mapPartitions batch shape matches the native kernel") {
    // the per-partition iterator surface a real codec binds to: one
    // feature row per doc, mean_byte agreeing with ByteMeanImpl
    val feats = Multimodal.decodeFeatures(spark,
      Multimodal.withPayload(Tables.documents(spark, sf001)))
    assert(feats.schema == Multimodal.featureSchema)
    val docs = Tables.documents(spark, sf001)
    assert(feats.count() == docs.count())
    val row = feats.where(col("doc_id") === 0).collect().head
    val text = docs.where(col("doc_id") === 0).select("text").as[String].collect().head
    val bytes = text.getBytes("UTF-8")
    val mean = math.rint(bytes.map(b => (b & 0xff).toDouble).sum / bytes.length * 10000) / 10000
    assert(row.getDouble(3) == mean)
  }

  test("multimodal payloads survive the binary roundtrip byte-exactly") {
    val p = Multimodal.withPayload(Tables.documents(spark, sf001))
      .select(col("doc_id"), col("payload"))
    val back = p.select(col("doc_id"), col("payload").cast("string").as("t"))
      .join(Tables.documents(spark, sf001), "doc_id")
      .where(col("t") =!= col("text"))
    assert(back.count() == 0)
  }

  test("ragged pack then explode reproduces lineitem exactly") {
    val li = Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val packed = li
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("items"))
    val exploded = packed
      .select(col("l_orderkey"), explode(col("items")).as("it"))
      .select(col("l_orderkey"), col("it.l_linenumber").as("l_linenumber"),
              col("it.l_quantity").as("l_quantity"))
    assertSameRows(exploded, li, "pack∘explode")
  }
}
