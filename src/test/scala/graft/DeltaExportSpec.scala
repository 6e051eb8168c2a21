package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** scan_delta_export: the oracle checks the reconstructed history;
  * these pin the PHYSICAL log claims — protocol/metaData placement,
  * NDJSON action layout, remove accounting on the rewrite commit,
  * footer-true stats, and idempotent re-export. */
class DeltaExportSpec extends SparkSpec {

  private lazy val root = operators.Scans.deltaFixture(spark, sf001)
  private lazy val logDir = operators.Scans.exportDeltaLog(root)
  private def lines(d: Int): Seq[String] =
    Files.readAllLines(Paths.get(logDir, f"$d%020d.json")).asScala.toSeq

  test("version 0 carries protocol + metaData exactly once; later versions never do") {
    val v0 = lines(0)
    assert(v0.count(_.contains("\"protocol\"")) == 1)
    assert(v0.count(_.contains("\"metaData\"")) == 1)
    assert(v0.head.contains("\"commitInfo\""), "commitInfo leads the file")
    assert(v0.exists(_.contains("\"schemaString\"")))
    Seq(1, 2).foreach { d =>
      assert(!lines(d).exists(l =>
        l.contains("\"protocol\"") || l.contains("\"metaData\"")), s"v$d")
    }
  }

  test("the compaction commit is an OPTIMIZE whose removes are exactly the prior file set") {
    val v2 = lines(2)
    assert(v2.exists(_.contains("\"operation\": \"OPTIMIZE\"")))
    val removed = v2.filter(_.contains("\"remove\""))
    val addedBefore = (lines(0) ++ lines(1)).count(_.contains("\"add\""))
    assert(removed.size == addedBefore,
      s"rewrite must retire every pre-compaction file: $removed vs $addedBefore")
    assert(v2.exists(_.contains("\"add\"")), "the rewrite adds the compacted files")
  }

  test("the dataChange bit: rewrites false, real writes true — and CDC honors it") {
    assert(lines(2).filter(l => l.contains("\"add\"") || l.contains("\"remove\""))
      .forall(_.contains("\"dataChange\": false")),
      "OPTIMIZE actions must carry dataChange=false")
    Seq(0, 1).foreach { d =>
      assert(lines(d).filter(_.contains("\"add\""))
        .forall(_.contains("\"dataChange\": true")), s"v$d adds")
    }
    // the feed sums to the table exactly once despite the rewrite
    val cdc = SparkEntry.queries("scan_delta_cdc")(spark, sf001).collect()
    assert(cdc.map(_.getLong(0)).toSeq == Seq(0L, 1L), "no change batch for OPTIMIZE")
    assert(cdc.map(_.getLong(2)).sum == Tables.orders(spark, sf001).count())
  }

  test("add stats are footer-true: numRecords sums to the actual table count") {
    val statRe = "\"numRecords\\\\\": (\\d+)".r
    val v0adds = lines(0).filter(_.contains("\"add\""))
      .flatMap(l => statRe.findFirstMatchIn(l).map(_.group(1).toLong))
    assert(v0adds.nonEmpty, "every add carries a stats string")
    val expected = Tables.orders(spark, sf001)
      .where(org.apache.spark.sql.functions.col("o_orderdate") <
        org.apache.spark.sql.functions.lit(operators.Scans.TimeTravelCutoff)
          .cast("timestamp")).count()
    assert(v0adds.sum == expected, s"${v0adds.sum} vs $expected")
  }

  test("re-export is idempotent byte-for-byte (atomic rewrite, no drift)") {
    val before = (0 to 2).map(lines)
    operators.Scans.exportDeltaLog(root)
    assert((0 to 2).map(lines) == before)
  }

  test("scan_delta_import serves the exact table through the log's live set alone") {
    val got = SparkEntry.queries("scan_delta_import")(spark, sf001).collect()(0)
    val want = Tables.orders(spark, sf001).count()
    assert(got.getLong(0) == want, s"served ${got.getLong(0)} rows, table has $want")
  }

  test("scan_iceberg_import navigates history: v1 is the strict pre-cutoff subset of v2") {
    val rows = SparkEntry.queries("scan_iceberg_import")(spark, sf001).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows(0).getLong(1) < rows(1).getLong(1),
      "the first snapshot must be a strict subset")
    assert(rows(1).getLong(1) == Tables.orders(spark, sf001).count())
  }

  test("manifest lists are REAL Avro containers: hand-encoded bytes " +
       "round-trip through the official decoder, byte-stable") {
    import graft.sources.AvroManifest
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_rt")
    val entries = Seq(("/data/a.parquet", "PARQUET"), ("/data/b.parquet", "PARQUET"))
    val p = dir.resolve("m.avro")
    AvroManifest.write(p, entries, "seed")
    val bytes = java.nio.file.Files.readAllBytes(p)
    // the container magic the Avro spec mandates
    assert(bytes.take(4).sameElements(Array[Byte]('O', 'b', 'j', 1)))
    // the INDEPENDENT half: org.apache.avro's DataFileReader (not our
    // writer's mirror image) must accept the bytes and return the
    // records — a wrong varint, codec or block frame fails here
    assert(AvroManifest.readEntries(p.toString) == entries)
    // deterministic export: same inputs + seed → identical bytes
    val p2 = dir.resolve("m2.avro")
    AvroManifest.write(p2, entries, "seed")
    assert(java.util.Arrays.equals(bytes, java.nio.file.Files.readAllBytes(p2)))
    // a header-only (empty) container is still valid Avro
    val p0 = dir.resolve("m0.avro")
    AvroManifest.write(p0, Seq.empty, "seed")
    assert(AvroManifest.readEntries(p0.toString).isEmpty)
    // >127-byte payload + >63 records exercise multi-byte zigzag varints
    val many = (1 to 300).map(i => (s"/data/part-$i.parquet", "PARQUET"))
    val pm = dir.resolve("many.avro")
    AvroManifest.write(pm, many, "s2")
    assert(AvroManifest.readEntries(pm.toString) == many)
    // and the LIVE export's lists decode through the same official
    // path — now the SPEC-COMPLETE two-level layout (r18 Missing #3):
    // snap-v.avro carries a full manifest_file record whose length /
    // counts must be REAL, manifest-v.avro carries manifest_entry
    // records with footer-true row counts
    val root = graft.operators.Scans.timeTravelFixture(spark, sf001)
    val meta = graft.operators.Scans.exportIcebergMetadata(root)
    val lists = new java.io.File(s"$root/_iceberg").listFiles()
      .filter(_.getName.matches("snap-\\d+\\.avro"))
    assert(lists.nonEmpty)
    lists.foreach { f =>
      val v = f.getName.stripPrefix("snap-").stripSuffix(".avro").toLong
      val recs = graft.sources.AvroContainer.decodeRows(
        java.nio.file.Files.readAllBytes(f.toPath))
      assert(recs.size == 1, s"${f.getName}: one manifest_file record")
      val mf = recs.head
      val manifestPath = mf(0).asInstanceOf[String]
      // manifest_length is the REAL byte size of the pointed file
      assert(mf(1).asInstanceOf[Long] ==
             java.nio.file.Files.size(java.nio.file.Paths.get(manifestPath)))
      assert(mf(3).asInstanceOf[Number].intValue == 0) // content = data
      assert(mf(4).asInstanceOf[Long] == v)            // sequence_number
      assert(mf(6).asInstanceOf[Long] == v)            // added_snapshot_id
      assert(mf(13) == null && mf(14) == null)         // partitions/key null
      val entries = graft.sources.AvroContainer.decodeRows(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(manifestPath)))
      assert(entries.nonEmpty)
      // file/row counts in the manifest_file record match the entries
      val (added, existing) = entries.partition(_(0).asInstanceOf[Number].intValue == 1)
      assert(mf(7).asInstanceOf[Number].intValue == added.size)
      assert(mf(8).asInstanceOf[Number].intValue == existing.size)
      // data_file layout: (content, file_path, file_format, partition,
      // record_count, file_size_in_bytes)
      def rows(es: Seq[Array[Any]]) = es.map(
        _(4).asInstanceOf[Array[Any]](4).asInstanceOf[Long]).sum
      assert(mf(10).asInstanceOf[Long] == rows(added))
      assert(mf(11).asInstanceOf[Long] == rows(existing))
      entries.foreach { e =>
        val df = e(4).asInstanceOf[Array[Any]]
        assert(df(2) == "PARQUET")
        // data_file sizes are the real on-disk bytes
        assert(df(5).asInstanceOf[Long] == java.nio.file.Files.size(
          java.nio.file.Paths.get(df(1).asInstanceOf[String])))
      }
      // the reader walk returns exactly the snapshot's live file set
      assert(AvroManifest.readFilePaths(f.getPath).toSet ==
             entries.map(_(4).asInstanceOf[Array[Any]](1)).toSet)
    }
    assert(meta.endsWith(".metadata.json"))
  }

  test("a torn Avro container fails loudly in the official decoder; an " +
       "unmarked add+remove commit refuses dataChange=false") {
    import graft.sources.AvroManifest
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_neg")
    val entries = Seq(("/data/a.parquet", "PARQUET"), ("/data/b.parquet", "PARQUET"))
    val p = dir.resolve("m.avro")
    AvroManifest.write(p, entries, "seed")
    val bytes = java.nio.file.Files.readAllBytes(p)
    // truncate mid-RECORD (clipping only the trailing sync is
    // tolerated after the final block): the reader must throw, never
    // return a silent partial list — a half-read manifest would serve
    // a half-table as if it were whole
    val torn = dir.resolve("torn.avro")
    java.nio.file.Files.write(torn, bytes.take(bytes.length - 30))
    intercept[Exception] { AvroManifest.readEntries(torn.toString) }
    // corrupt the magic: rejected before any record parsing
    val bad = bytes.clone(); bad(0) = 'X'.toByte
    val badP = dir.resolve("bad.avro")
    java.nio.file.Files.write(badP, bad)
    intercept[Exception] { AvroManifest.readEntries(badP.toString) }
    // and the Delta-side gate (r17 ADVICE): an add+remove commit with
    // NO compaction marker must refuse the OPTIMIZE/dataChange=false
    // classification instead of silently dropping rows from the feed
    val root = graft.operators.Scans.deltaFixture(spark, sf001)
    val marker = java.nio.file.Paths.get(root, "_compactions", "v3.txt")
    val keep = java.nio.file.Files.readAllBytes(marker)
    java.nio.file.Files.delete(marker)
    try {
      val ex = intercept[IllegalArgumentException] {
        graft.operators.Scans.exportDeltaLog(root)
      }
      assert(ex.getMessage.contains("_compactions marker"), ex.getMessage)
    } finally {
      java.nio.file.Files.write(marker, keep)
      // restore the exported log to the marked state for later tests
      graft.operators.Scans.exportDeltaLog(root)
    }
  }

  test("the query reconstructs live rows that never decrease across the history") {
    val rows = SparkEntry.queries("scan_delta_export")(spark, sf001).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val live = rows.map(_.getLong(4))
    assert(live.sliding(2).forall(p => p(0) <= p(1)),
      "base → append → compaction never loses rows")
    assert(rows.map(_.getString(2)).toSeq == Seq("WRITE", "APPEND", "OPTIMIZE"))
  }
}
