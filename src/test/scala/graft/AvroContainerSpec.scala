package graft

import graft.sources.AvroContainer
import graft.sources.AvroContainer._

/** The general Avro container codec (source_avro / sink_avro_roundtrip):
  * hand-rolled encode, OFFICIAL org.apache.avro decode — every test a
  * conformance check of the writer — plus the strict whole-frame
  * validation the official reader lacks (it swallows torn blocks). */
class AvroContainerSpec extends SparkSpec {

  private val fields = Seq(
    Field("id", ALong), Field("name", AString), Field("score", ADouble),
    Field("opt", ANullable(ADouble)), Field("payload", ABytes))

  private val rows: Seq[Seq[Any]] = Seq(
    Seq[Any](1L, "alpha", 0.1, java.lang.Double.valueOf(2.5),
             Array[Byte](1, 2, 3)),
    Seq[Any](-2L, "héllo ✓", -0.0, null, Array.empty[Byte]),
    Seq[Any](Long.MaxValue, "", 1e-300, java.lang.Double.valueOf(-1e300),
             Array[Byte](0, -1)),
    Seq[Any](Long.MinValue, "z", Double.MaxValue, null, Array[Byte](42)),
    Seq[Any](0L, "mid", 3.14159, java.lang.Double.valueOf(0.0),
             Array[Byte](7, 7)))

  test("all five types round-trip the official decoder bit-exactly, " +
       "both union branches included") {
    val bytes = AvroContainer.encode("t", fields, rows.iterator, "seed:1")
    val got = AvroContainer.decodeRows(bytes)
    assert(got.size == rows.size)
    rows.zip(got).foreach { case (want, a) =>
      assert(a(0) == want(0))
      assert(a(1) == want(1))
      // doubles travel as raw IEEE bits — compare bit patterns so
      // -0.0 and denormal-range values are checked exactly
      assert(java.lang.Double.doubleToLongBits(a(2).asInstanceOf[Double]) ==
             java.lang.Double.doubleToLongBits(want(2).asInstanceOf[Double]))
      (want(3), a(3)) match {
        case (null, g) => assert(g == null)
        case (w: java.lang.Double, g: java.lang.Double) =>
          assert(java.lang.Double.doubleToLongBits(w) ==
                 java.lang.Double.doubleToLongBits(g))
        case other => fail(s"union mismatch: $other")
      }
      assert(a(4).asInstanceOf[Array[Byte]]
        .sameElements(want(4).asInstanceOf[Array[Byte]]))
    }
  }

  test("multi-block containers (blockRecords=2) decode whole and validate") {
    val bytes = AvroContainer.encode("t", fields, rows.iterator, "seed:2",
                                     blockRecords = 2)
    assert(AvroContainer.decodeRows(bytes).size == rows.size)
    // and byte-stability: same rows + seed => identical bytes
    val again = AvroContainer.encode("t", fields, rows.iterator, "seed:2",
                                     blockRecords = 2)
    assert(bytes.sameElements(again))
  }

  test("a torn container fails loudly in validation, never a silent " +
       "partial decode (the bee425c discipline)") {
    val bytes = AvroContainer.encode("t", fields, rows.iterator, "seed:3")
    // every truncation point after the header must throw — the
    // official reader alone would serve the records before the tear
    Seq(bytes.length - 1, bytes.length - 17, bytes.length / 2).foreach { cut =>
      val torn = java.util.Arrays.copyOfRange(bytes, 0, cut)
      val ex = intercept[RuntimeException] { AvroContainer.decodeRows(torn) }
      assert(ex.getMessage.contains("invalid Avro container"),
        s"cut=$cut: ${ex.getMessage}")
    }
  }

  test("a corrupted sync marker fails validation") {
    val bytes = AvroContainer.encode("t", fields, rows.iterator, "seed:4")
    val bad = bytes.clone()
    bad(bytes.length - 1) = (bad(bytes.length - 1) ^ 0x01).toByte
    val ex = intercept[RuntimeException] { AvroContainer.decodeRows(bad) }
    assert(ex.getMessage.contains("sync marker mismatch"), ex.getMessage)
  }

  test("logical types annotate the schema without changing the wire " +
       "format, and the official reader parses them") {
    val lf = Seq(Field("id", ALong),
                 Field("ts", AvroContainer.ATimestampMicros),
                 Field("amt", AvroContainer.ADecimal(12, 2)))
    val cents = Seq(0L, 1L, -1L, 123456L, -9999999999L)
    val rows = cents.zipWithIndex.map { case (c, i) =>
      Seq[Any](i.toLong, 907372800000000L + i,
               java.math.BigInteger.valueOf(c).toByteArray)
    }
    val bytes = AvroContainer.encode("t", lf, rows.iterator, "seed:lt")
    // the embedded schema must carry the annotations (a real reader
    // resolves decimals/timestamps through them)
    val got = AvroContainer.decodeRows(bytes)
    assert(got.size == rows.size)
    got.zip(cents).zipWithIndex.foreach { case ((a, c), i) =>
      assert(a(1) == 907372800000000L + i)
      assert(new java.math.BigInteger(a(2).asInstanceOf[Array[Byte]])
        .longValueExact == c, s"cents $c")
    }
    val reader = new org.apache.avro.file.DataFileStream(
      new java.io.ByteArrayInputStream(bytes),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try {
      val sch = reader.getSchema
      assert(sch.getField("ts").schema().getProp("logicalType") == "timestamp-micros")
      assert(sch.getField("amt").schema().getProp("logicalType") == "decimal")
      assert(sch.getField("amt").schema().getObjectProp("scale") == 2)
    } finally reader.close()
  }

  test("an empty record set is a valid header-only container") {
    val bytes = AvroContainer.encode("t", fields, Iterator.empty, "seed:5")
    assert(AvroContainer.decodeRows(bytes).isEmpty)
  }

  test("AvroManifest's 2-string instance still flows through the shared " +
       "codec byte-stably") {
    val entries = Seq(("path/a.parquet", "PARQUET"), ("path/b.parquet", "PARQUET"))
    val bytes = graft.sources.AvroManifest.encode(entries, "tbl:1")
    val tmp = java.nio.file.Files.createTempFile("avro_manifest", ".avro")
    java.nio.file.Files.write(tmp, bytes)
    try
      assert(graft.sources.AvroManifest.readEntries(tmp.toString) == entries)
    finally java.nio.file.Files.delete(tmp)
  }
}
