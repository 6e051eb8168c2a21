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

  test("fixture invariant: documents.text is pure single-byte ASCII (phash premise)") {
    // multimodal_phash's engine samples payload BYTES (ascii of a
    // 1-byte binary substring, byte length) while its oracle reads
    // CHARACTER codes and character length — they agree only while
    // every document is pure ASCII. A multibyte doc would diverge
    // silently; pin the premise loudly instead of assuming it.
    for (dir <- Seq(sf001, sf01)) {
      val bad = Tables.documents(spark, dir).where(
        expr("octet_length(text) != char_length(text)") ||
        col("text") =!= col("text").cast("binary").cast("string"))
      assert(bad.count() == 0, s"non-ASCII documents.text in $dir")
    }
  }

  test("phashCandidates: hot-band guard keeps a biased corpus far from all-pairs, losslessly") {
    // planted bias with the fixture's generative profile: word-like
    // text (spaces drag the byte mean below most letters, so ~78% of
    // average-hash bits come out set and single 6-bit band keys
    // collapse — the measured UNGUARDED single-band join emits ~75% of
    // all-pairs on this corpus). The guard must stay far below that
    // while the exact gate still finds EVERY true pair (planted
    // near-dup clones included).
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def word(): String = Seq.fill(2 + rnd.nextInt(8))(alpha(rnd.nextInt(26))).mkString
    val texts = scala.collection.mutable.ArrayBuffer[String]()
    for (_ <- 0 until 1000) texts += Seq.fill(40 + rnd.nextInt(81))(word()).mkString(" ")
    for (i <- 0 until 15) { // near-dup clones: a few character edits
      val t = texts(i).toCharArray
      for (_ <- 0 until (1 + rnd.nextInt(4))) t(rnd.nextInt(t.length)) = alpha(rnd.nextInt(26))
      texts += new String(t)
    }
    def sigOf(t: String): Long = {
      val bs = t.getBytes("UTF-8"); val L = bs.length
      val samples = (0 until Multimodal.PhashBits).map(i =>
        bs((i * L) / Multimodal.PhashBits) & 0xff)
      val tot = samples.sum
      samples.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
        if (Multimodal.PhashBits * x >= tot) acc | (1L << i) else acc }
    }
    val sigs = texts.map(sigOf).toIndexedSeq
    val n = sigs.length
    val truth = (for {
      i <- 0 until n; j <- i + 1 until n
      if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= Multimodal.PhashMaxDist
    } yield (i.toLong, j.toLong)).toSet
    assert(truth.nonEmpty, "planted corpus must contain true near-dup pairs")
    val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "sig")
    val cand = Multimodal.phashCandidates(df).cache()
    val nCand = cand.count()
    val allPairs = n.toLong * (n - 1) / 2
    assert(nCand < allPairs / 5, s"hot-band guard failed: $nCand candidates of $allPairs pairs")
    val got = cand.where(expr(s"bit_count(sa ^ sb) <= ${Multimodal.PhashMaxDist}"))
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    cand.unpersist()
    assert(got == truth, "guarded banding must be exactly lossless at d <= PhashMaxDist")
  }

  test("phashCandidates: an unbiased corpus takes the pure cold path, still lossless") {
    // iid ~50% bits spread 200 docs over 64 keys per band (~3 per
    // bucket, far under the cap) — the hot set is EMPTY and the guard
    // must degrade to exactly the classic single-band LSH join,
    // including the planted near-dup pair
    val rnd = new scala.util.Random(11)
    val base = IndexedSeq.fill(200)(rnd.nextLong() & ((1L << 60) - 1))
    val sigs = base :+ (base.head ^ ((1L << 3) | (1L << 40))) // d=2 clone
    val n = sigs.length
    val truth = (for {
      i <- 0 until n; j <- i + 1 until n
      if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= Multimodal.PhashMaxDist
    } yield (i.toLong, j.toLong)).toSet
    assert(truth.contains((0L, 200L)))
    val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "sig")
    val got = Multimodal.phashCandidates(df)
      .where(expr(s"bit_count(sa ^ sb) <= ${Multimodal.PhashMaxDist}"))
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth)
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

  test("multimodal_vad: planted frame pattern segments exactly") {
    // 8-byte frames: 'z'*8 = 976 (active), ' '*8 = 256 (inactive);
    // pattern active, inactive, active, active (+3 tail bytes dropped)
    val text = "z" * 8 + " " * 8 + "z" * 16 + "zzz"
    val docs = Seq((1L, text, "en", "src0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Tables.scratch(sf001, "vad_spec")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("multimodal_vad")(spark, dir).collect()(0)
    assert(r.getString(1) == "audio")                    // doc_id % 3 == 1
    assert(r.getLong(2) == 4L, s"n_frames ${r.getLong(2)}")
    assert(r.getLong(3) == 3L, s"n_active ${r.getLong(3)}")
    assert(r.getLong(4) == 2L, s"n_segments ${r.getLong(4)}")
    assert(r.getLong(5) == 2L, s"longest ${r.getLong(5)}")
    assert(r.getDouble(6) == 0.75)
  }
}
