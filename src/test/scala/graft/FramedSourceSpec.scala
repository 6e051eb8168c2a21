package graft

import graft.sources.FramedSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The DataSource V2 framed-format connector (the i3cols R1–R3 extract
  * story): schema inference from the first frame, lossless extraction
  * of every typed key including the ragged array, and column pruning
  * pushed into the frame parser. */
class FramedSourceSpec extends SparkSpec {

  /** Trigger the fixture write (memoized per JVM) and return its dir. */
  private def fixtureDir: String = {
    SparkEntry.queries("source_framed_extract")(spark, sf001).collect()
    Tables.scratch(sf001, "framed_src")
  }

  test("schema inference discovers every key name and type from one frame") {
    assert(FramedSource.infer(fixtureDir) == StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("user_id", LongType, nullable = false),
      StructField("ts_us", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false),
      StructField("event_type", StringType, nullable = false),
      StructField("pulses", ArrayType(LongType, containsNull = false), nullable = false))))
  }

  test("extraction is lossless: framed roundtrip equals the source rows, ragged key included") {
    val back = spark.read.format("graft.sources.FramedSource").load(fixtureDir)
      .select("event_id", "user_id", "ts_us", "value", "event_type", "pulses")
    val expected = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
              col("value"), col("event_type"),
              // sequence(1, 0) would generate a DESCENDING ramp, so the
              // np=0 case needs an explicit empty array
              when(col("event_id") % 5 === 0, array().cast("array<bigint>"))
                .otherwise(transform(sequence(lit(1L), col("event_id") % 5),
                  i => unix_micros(col("ts")) % 1000000L + i - 1)).as("pulses"))
    assertSameRows(
      back.withColumn("pulses", col("pulses").cast("string")),
      expected.withColumn("pulses", col("pulses").cast("string")),
      "framed roundtrip")
  }

  test("column pruning reaches the frame parser (BatchScan reads only requested keys)") {
    val pruned = spark.read.format("graft.sources.FramedSource").load(fixtureDir)
      .select("event_type")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("BatchScan"), p)
    assert(p.contains("event_type"), p)
    // unrequested keys must not appear in the scan output
    assert(!p.contains("pulses") && !p.contains("user_id"), p)
    assert(pruned.distinct().count() == 5)
  }

  test("filter pushdown reaches the scan and the parser sheds failing frames") {
    val df = spark.read.format("graft.sources.FramedSource").load(fixtureDir)
      .where(col("event_type") === "purchase" && col("value") >= 50.0)
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.asInstanceOf[graft.sources.FramedScan]
    assert(scan.pushed.length == 2, scan.description())
    // reader-level: a pushed filter drops frames before rows materialize
    val file = FramedSource.frameFiles(fixtureDir).head
    val req = StructType(Seq(StructField("event_type", StringType, nullable = false)))
    def countRows(pushed: Seq[org.apache.spark.sql.sources.Filter]): Int = {
      val r = new graft.sources.FramedReader(file, req, pushed)
      var n = 0
      while (r.next()) n += 1
      r.close()
      n
    }
    val all = countRows(Nil)
    val shed = countRows(Seq(org.apache.spark.sql.sources.EqualTo("event_type", "purchase")))
    assert(shed > 0 && shed < all, s"pushed filter kept $shed of $all")
    // best-effort + residual is exact end-to-end
    val viaParquet = Tables.events(spark, sf001)
      .where(col("event_type") === "purchase" && col("value") >= 50.0).count()
    assert(df.count() == viaParquet)
  }

  test("streaming read tails the directory: files landing between batches arrive exactly once") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_stream").toString
    def writeFile(name: String, ids: Range): Unit = {
      val dos = new java.io.DataOutputStream(
        new java.io.FileOutputStream(s"$dir/$name"))
      try ids.foreach { i =>
        writeFrame(dos, Seq(
          ("event_id", TagLong, i.toLong),
          ("etype", TagString, if (i % 2 == 0) "a" else "b")))
      } finally dos.close()
    }
    writeFile("f0.frames", 0 until 10)
    writeFile("f1.frames", 10 until 25)

    val out = java.nio.file.Files.createTempDirectory("graft_framed_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_framed_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.FramedSource").load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 25)
    // a new file lands; a restarted stream picks up ONLY the suffix
    writeFile("f2.frames", 25 until 31)
    runOnce()
    val all = spark.read.parquet(out)
    assert(all.count() == 31, "appended file must arrive exactly once")
    assert(all.select("event_id").distinct().count() == 31)
  }

  test("streaming tail decodes compressed files landing mid-stream — block-gz included") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_stream_gz").toString
    // seed file: uncompressed (schema inference source)
    val d0 = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/f0.frames"))
    try (0 until 5).foreach(i => writeFrame(d0, Seq(("event_id", TagLong, i.toLong))))
    finally d0.close()
    val out = java.nio.file.Files.createTempDirectory("graft_framed_sgz_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_framed_sgz_ck").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.FramedSource").load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 5)
    // a whole-file-gz archive lands (the .i3.gz relay shape)...
    val gz = new java.io.DataOutputStream(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/f1.frames.gz")))
    try (5 until 12).foreach(i => writeFrame(gz, Seq(("event_id", TagLong, i.toLong))))
    finally gz.close()
    // ...and a BLOCK-compressed engine-written file (multi-member gz +
    // v2 sidecar) lands via the DSv2 sink into a staging dir, then
    // moves in (rename keeps the .idx name pairing)
    val stage = java.nio.file.Files.createTempDirectory("graft_framed_sgz_stage").toString
    spark.range(12, 40).coalesce(1).select(col("id").as("event_id"))
      .write.format("graft.sources.FramedSource")
      .option("compression", "gzip").option("indexBlockBytes", "64")
      .mode("overwrite").save(stage)
    new java.io.File(stage).listFiles()
      .filter(f => f.getName.endsWith(".frames.gz") || f.getName.endsWith(".idx"))
      .foreach { f =>
        assert(f.renameTo(new java.io.File(dir, f.getName)), s"move failed: $f")
      }
    runOnce()
    val all = spark.read.parquet(out)
    assert(all.count() == 40, "compressed landings must arrive exactly once")
    assert(all.select("event_id").distinct().count() == 40)
  }

  test("_file metadata column carries provenance without living in the data schema") {
    val df = spark.read.format("graft-framed").load(fixtureDir) // registered short name
    assert(!df.columns.contains("_file"), "metadata column must not leak into the default projection")
    val withFile = df.select(col("_file"), col("event_id"))
    // every row's _file is a real fixture file, and rows group back to
    // exactly the file set on disk
    val files = withFile.select("_file").distinct()
      .collect().map(_.getString(0)).toSet
    assert(files == FramedSource.frameFiles(fixtureDir).toSet)
    assert(withFile.count() == df.count())
  }

  test("corrupt input fails loudly and names the file — never silent truncation") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_corrupt")
    def freshFile(name: String)(tail: java.io.DataOutputStream => Unit): String = {
      val f = dir.resolve(name).toString
      val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
      // one valid frame first: corruption mid-file must not surface as a
      // clean EOF after the good prefix
      try { writeFrame(dos, Seq(("event_id", TagLong, 1L))); tail(dos) }
      finally dos.close()
      f
    }
    val req = StructType(Seq(StructField("event_id", LongType, nullable = false)))
    def readAll(file: String): Int = {
      val r = new graft.sources.FramedReader(file, req, Nil)
      try { var n = 0; while (r.next()) n += 1; n } finally r.close()
    }

    // (a) negative body length — the length-prefix contract is broken
    val bad = freshFile("bad_len.frames") { dos => dos.writeInt(-5) }
    val e1 = intercept[IllegalArgumentException](readAll(bad))
    assert(e1.getMessage.contains("corrupt frame") && e1.getMessage.contains(bad), e1.getMessage)

    // (b) unknown type tag — a frame from a newer/foreign writer
    val tagged = freshFile("bad_tag.frames") { dos =>
      dos.writeInt(12); dos.writeInt(1)           // bodyLen, nKeys
      dos.writeShort(1); dos.write('k'); dos.writeByte(99)
    }
    val e2 = intercept[IllegalStateException](readAll(tagged))
    assert(e2.getMessage.contains("unknown type tag 99") && e2.getMessage.contains(tagged), e2.getMessage)

    // (c) truncation mid-frame (torn write): loud EOF, not a short read
    val torn = freshFile("torn.frames") { dos =>
      dos.writeInt(64); dos.writeInt(2)           // claims 2 keys, delivers none
    }
    intercept[java.io.EOFException](readAll(torn))
  }

  test("inference errors loudly on frameless and all-empty dirs, but not on a missing write target") {
    // existing dir without frame files: a READ pointed at the wrong place
    val noFrames = java.nio.file.Files.createTempDirectory("graft_noframes").toString
    new java.io.FileOutputStream(s"$noFrames/readme.txt").close()
    val e1 = intercept[Exception] {
      spark.read.format("graft.sources.FramedSource").load(noFrames).schema
    }
    assert(e1.getMessage.contains("no .frames files"), e1.getMessage)
    // every frame file empty: nothing to infer from
    val allEmpty = java.nio.file.Files.createTempDirectory("graft_allempty").toString
    new java.io.FileOutputStream(s"$allEmpty/a.frames").close()
    val e2 = intercept[Exception] {
      spark.read.format("graft.sources.FramedSource").load(allEmpty).schema
    }
    assert(e2.getMessage.contains("are empty"), e2.getMessage)
    // missing dir: the write-target case — empty schema, no error
    assert(graft.sources.FramedSource.infer(s"$allEmpty/not_there") ==
      org.apache.spark.sql.types.StructType(Nil))
  }

  test("parallelism is per file: one input partition per .frames file") {
    val n = FramedSource.frameFiles(fixtureDir).size
    assert(n > 1, s"fixture should span multiple files, got $n")
    val scanned = spark.read.format("graft.sources.FramedSource").load(fixtureDir)
    assert(scanned.rdd.getNumPartitions == n)
  }

  test("Trigger.AvailableNow drains natively in multiple bounded micro-batches, exactly once") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_an").toString
    def writeFile(name: String, ids: Range): Unit = {
      val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/$name"))
      try ids.foreach(i => writeFrame(dos, Seq(("event_id", TagLong, i.toLong))))
      finally dos.close()
    }
    (0 until 4).foreach(k => writeFile(s"f$k.frames", k * 10 until (k + 1) * 10))
    val out = java.nio.file.Files.createTempDirectory("graft_framed_an_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_framed_an_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.FramedSource")
        .option("maxFilesPerTrigger", "1").load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "AvailableNow drain did not finish")
    }
    runOnce()
    // one offset entry per micro-batch: the 4-file dir under
    // maxFilesPerTrigger=1 must take 4 batches, NOT the single-batch
    // fallback the engine uses for sources without native support
    val batches = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 4, s"expected >=4 bounded micro-batches, got $batches")
    assert(spark.read.parquet(out).count() == 40)
    // a file landing after the drain is picked up by the NEXT run only,
    // exactly once
    writeFile("f4.frames", 40 until 55)
    runOnce()
    val all = spark.read.parquet(out)
    assert(all.count() == 55)
    assert(all.select("event_id").distinct().count() == 55)
  }

  test("mid-drain restart with an uncommitted batch re-runs it without duplicates") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_rs").toString
    (0 until 3).foreach { k =>
      val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/f$k.frames"))
      try (k * 10 until (k + 1) * 10).foreach(i =>
        writeFrame(dos, Seq(("event_id", TagLong, i.toLong))))
      finally dos.close()
    }
    val out = java.nio.file.Files.createTempDirectory("graft_framed_rs_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_framed_rs_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.FramedSource")
        .option("maxFilesPerTrigger", "1").load(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000))
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 30)
    // simulate a crash between offset write and commit: drop the last
    // commit marker so batch N is planned-but-uncommitted on restart —
    // exactly the edge the engine's single-batch fallback warns about
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val lastCrc = new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (lastCrc.exists()) assert(lastCrc.delete())
    runOnce()
    val all = spark.read.parquet(out)
    assert(all.count() == 30, "re-run of the uncommitted batch must not duplicate rows")
    assert(all.select("event_id").distinct().count() == 30)
  }

  test("gz-compressed frame files decode identically through the connector") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_gz").toString
    def frames(n: Int): Seq[Seq[(String, Byte, Any)]] =
      (0 until n).map(i => Seq(
        ("event_id", TagLong, i.toLong),
        ("score", TagDouble, i * 0.5),
        ("kind", TagString, s"k${i % 3}"),
        ("pulses", TagLongArray, Array.tabulate(i % 4)(_.toLong))))
    val raw = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/a.frames"))
    try frames(20).foreach(writeFrame(raw, _)) finally raw.close()
    val gz = new java.io.DataOutputStream(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/b.frames.gz")))
    try frames(20).foreach(writeFrame(gz, _)) finally gz.close()
    // listing accepts both; 2 files → 2 partitions → both decoded
    assert(FramedSource.frameFiles(dir).size == 2)
    val back = spark.read.format("graft.sources.FramedSource").load(dir)
    assert(back.count() == 40)
    // every row appears exactly twice (once per file) — the gz copy is
    // byte-identical after decode
    val dup = back.groupBy("event_id", "score", "kind", "pulses").count()
    assert(dup.where(col("count") =!= 2).isEmpty, "gz decode diverged from raw")
    // corrupt-input contract holds through the codec: torn frame in gz
    val torn = new java.io.DataOutputStream(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/torn.frames.gz")))
    try { writeFrame(torn, Seq(("event_id", TagLong, 1L))); torn.writeInt(64); torn.writeInt(2) }
    finally torn.close()
    val req = StructType(Seq(StructField("event_id", LongType, nullable = false)))
    val r = new graft.sources.FramedReader(s"$dir/torn.frames.gz", req, Nil)
    try intercept[java.io.EOFException] { while (r.next()) () } finally r.close()
  }

  test("session hadoop conf reaches the scan and survives serialization to readers") {
    spark.sparkContext.hadoopConfiguration.set("graft.test.marker", "visible")
    try {
      val df = spark.read.format("graft.sources.FramedSource").load(fixtureDir)
        .select("event_id")
      val scan = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.head.asInstanceOf[graft.sources.FramedScan]
      assert(scan.conf.value.get("graft.test.marker") == "visible",
        "session conf key not captured at scan build")
      // the reader factory ships the conf through java serialization
      val bytes = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bytes)
      oos.writeObject(scan.createReaderFactory()); oos.close()
      val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes.toByteArray))
        .readObject().asInstanceOf[graft.sources.FramedReaderFactory]
      assert(back.conf.value.get("graft.test.marker") == "visible",
        "conf key lost in serialization to the executor side")
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.test.marker")
  }

  test("fractional comparison values on long keys are rejected at admission and safe in eval") {
    import org.apache.spark.sql.sources._
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false),
      StructField("event_type", StringType, nullable = false)))
    // ADVICE r4: LessThan(k, 3.5) via longValue truncation would
    // evaluate k < 3 and unrecoverably drop k = 3
    assert(!graft.sources.FramedFilters.supported(LessThan("event_id", 3.5), schema))
    assert(!graft.sources.FramedFilters.supported(EqualTo("event_id", 3.5f), schema))
    assert(graft.sources.FramedFilters.supported(LessThan("event_id", 3L), schema))
    assert(graft.sources.FramedFilters.supported(LessThan("event_id", 3), schema))
    assert(graft.sources.FramedFilters.supported(LessThan("value", 3), schema))
    // double keys reject integral literals beyond 2^53: doubleValue
    // shifts the comparison point and a pushed drop is unrecoverable
    assert(graft.sources.FramedFilters.supported(LessThan("value", 1L << 53), schema))
    assert(!graft.sources.FramedFilters.supported(LessThan("value", (1L << 53) + 1), schema))
    assert(!graft.sources.FramedFilters.supported(LessThan("value", Long.MaxValue), schema))
    assert(!graft.sources.FramedFilters.supported(LessThan("value", Long.MinValue), schema))
    assert(graft.sources.FramedFilters.supported(EqualTo("event_type", "x"), schema))
    assert(!graft.sources.FramedFilters.supported(EqualTo("event_type", 1L), schema))
    assert(!graft.sources.FramedFilters.supported(EqualTo("nosuch", 1L), schema))
    assert(!graft.sources.FramedFilters.supported(EqualTo("event_id", null), schema))
    // the public eval surface compares exactly even when handed a
    // fractional value: k = 3 satisfies k < 3.5
    assert(graft.sources.FramedFilters.eval(LessThan("event_id", 3.5), Map("event_id" -> 3L)))
    assert(!graft.sources.FramedFilters.eval(LessThan("event_id", 3.0), Map("event_id" -> 3L)))
    assert(graft.sources.FramedFilters.eval(GreaterThan("event_id", 2.5), Map("event_id" -> 3L)))
  }

  test("torn write inside a SKIPPED payload fails loudly — pruning never hides truncation") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_skip")
    val f = dir.resolve("skip_torn.frames").toString
    val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
    try {
      writeFrame(dos, Seq(("event_id", TagLong, 1L), ("blob", TagString, "full payload")))
      // second frame: blob declares 100 bytes but the file ends after 4;
      // bodyLen is consistent with the DECLARED length so the checked
      // skip (not length validation) is what trips
      val name = "blob".getBytes("UTF-8")
      dos.writeInt(4 + 2 + name.length + 1 + 4 + 100)
      dos.writeInt(1)
      dos.writeShort(name.length); dos.write(name); dos.writeByte(TagString)
      dos.writeInt(100); dos.write("oops".getBytes("UTF-8"))
    } finally dos.close()
    // required schema EXCLUDES blob → its payload takes the skip path
    val req = StructType(Seq(StructField("event_id", LongType, nullable = false)))
    val r = new graft.sources.FramedReader(f, req, Nil)
    // ADVICE r4: an unchecked skipBytes would surface this as a clean
    // EOF after one good row — silent truncation
    try {
      val e = intercept[java.io.EOFException] { while (r.next()) () }
      assert(e.getMessage.contains("truncated frame") && e.getMessage.contains(f), e.getMessage)
    } finally r.close()
  }

  test("targetPartitionBytes packs many small files into composite partitions, losslessly") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_pack").toString
    (0 until 6).foreach { k =>
      val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/f$k.frames"))
      try (k * 10 until (k + 1) * 10).foreach(i =>
        writeFrame(dos, Seq(("event_id", TagLong, i.toLong))))
      finally dos.close()
    }
    // default: writer owns split sizing → one partition per file
    val perFile = spark.read.format("graft.sources.FramedSource").load(dir)
    assert(perFile.rdd.getNumPartitions == 6)
    // packed: 6 tiny files + 4 MB open cost each under a 16 MB target
    // → ceil(6 × 4 MB / 16 MB) = 2 composite partitions
    val packed = spark.read.format("graft.sources.FramedSource")
      .option("targetPartitionBytes", (16L * 1024 * 1024).toString).load(dir)
    assert(packed.rdd.getNumPartitions == 2, s"got ${packed.rdd.getNumPartitions}")
    // no row lost or duplicated across the file boundary inside a partition
    assert(packed.count() == 60)
    assert(packed.select("event_id").distinct().count() == 60)
    // `_file` provenance stays per FILE, not per partition
    assert(packed.select(col("_file")).distinct().count() == 6)
    // pushdown still sheds inside every packed file
    assert(packed.where(col("event_id") < 15L).count() == 15)
    // empty files interleaved in a packed partition are skipped
    // iteratively (clean frame-boundary EOF → next file), not mistaken
    // for truncation
    (0 until 3).foreach(k => new java.io.FileOutputStream(s"$dir/e$k.frames").close())
    val withEmpty = spark.read.format("graft.sources.FramedSource")
      .option("targetPartitionBytes", (64L * 1024 * 1024).toString).load(dir)
    assert(withEmpty.rdd.getNumPartitions == 1)
    assert(withEmpty.count() == 60)
  }

  test("DSv2 write path: append/overwrite semantics, lossless roundtrip, no temp residue") {
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_framed_w")}/table"
    val df = spark.range(0, 100).select(
      col("id").as("event_id"),
      concat(lit("k"), col("id") % 3).as("kind"),
      (col("id") * 0.5).as("score"),
      transform(sequence(lit(0L), col("id") % 4), i => i * 2).as("pulses"))
    df.write.format("graft.sources.FramedSource").mode("overwrite").save(dir)
    val back = spark.read.format("graft.sources.FramedSource").load(dir)
    assert(back.columns.toSeq == Seq("event_id", "kind", "score", "pulses"))
    assertSameRows(
      back.withColumn("pulses", col("pulses").cast("string")),
      df.withColumn("pulses", col("pulses").cast("string")),
      "framed write roundtrip")
    // append adds, overwrite truncates back to one copy
    df.write.format("graft.sources.FramedSource").mode("append").save(dir)
    assert(spark.read.format("graft.sources.FramedSource").load(dir).count() == 200)
    df.write.format("graft.sources.FramedSource").mode("overwrite").save(dir)
    assert(spark.read.format("graft.sources.FramedSource").load(dir).count() == 100)
    // two-phase commit leaves no temp files behind: only *.frames and
    // their local-FS ChecksumFileSystem companions (.<name>.crc)
    val residue = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(n => n.endsWith(".frames") || n.endsWith(".crc"))
    assert(residue.isEmpty, s"non-frame residue: ${residue.mkString(",")}")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.contains(".tmp-")),
      "uncommitted temp file left behind")
    // unencodable column types are rejected loudly at write build
    val bad = spark.range(3).select(col("id").cast("int").as("i"))
    val e = intercept[Exception] {
      bad.write.format("graft.sources.FramedSource").mode("append").save(dir)
    }
    assert(e.getMessage.contains("cannot encode"), e.getMessage)
  }

  test("writer task abort removes its temp; epoch re-commit is idempotent; nulls fail loudly") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_wcommit").toString
    val schema = StructType(Seq(StructField("event_id", LongType, nullable = true)))
    val conf = new graft.sources.SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    def listAll() = new java.io.File(dir).listFiles().map(_.getName).toSeq
    // (a) abort deletes the temp — a failed attempt leaves nothing
    val w1 = new graft.sources.FramedDataWriter(schema, dir, "q1", 0, 7L, conf.value)
    w1.write(new GenericInternalRow(Array[Any](1L)))
    w1.abort()
    assert(!listAll().exists(_.contains("tmp")), listAll().mkString(","))
    // (b) streaming epoch re-commit: replay of a committed epoch drops
    // its temp instead of failing (crash between sink commit and
    // checkpoint write)
    val write = graft.sources.FramedWrite(schema, dir, "q1", truncate = false, conf)
    def epochAttempt(taskId: Long) = {
      val w = new graft.sources.FramedDataWriter(schema, dir, "q1", 0, taskId, conf.value, epochId = 5L)
      w.write(new GenericInternalRow(Array[Any](42L)))
      w.commit()
    }
    write.commit(5L, Array(epochAttempt(100L)))
    write.commit(5L, Array(epochAttempt(101L))) // replay, must not throw
    assert(graft.sources.FramedSource.frameFiles(dir).size == 1)
    assert(!listAll().exists(_.contains("tmp")), listAll().mkString(","))
    assert(spark.read.format("graft.sources.FramedSource").load(dir).count() == 1)
    // (c) null values must fail the task, never encode garbage
    val w2 = new graft.sources.FramedDataWriter(schema, dir, "q2", 0, 8L, conf.value)
    val e = intercept[IllegalArgumentException] {
      w2.write(new GenericInternalRow(Array[Any](null)))
    }
    assert(e.getMessage.contains("cannot encode NULL"), e.getMessage)
    w2.abort()
  }

  test("streaming WRITE: framed-to-framed relay lands epochs exactly once across restarts") {
    import graft.sources.FramedFormat._
    val src = java.nio.file.Files.createTempDirectory("graft_relay_src").toString
    def writeFile(name: String, ids: Range): Unit = {
      val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$src/$name"))
      try ids.foreach(i => writeFrame(dos, Seq(
        ("event_id", TagLong, i.toLong), ("score", TagDouble, i * 1.5))))
      finally dos.close()
    }
    (0 until 3).foreach(k => writeFile(s"f$k.frames", k * 10 until (k + 1) * 10))
    val sink = s"${java.nio.file.Files.createTempDirectory("graft_relay_sink")}/out"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_relay_ckpt").toString
    def relayOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.FramedSource")
        .option("maxFilesPerTrigger", "1").load(src)
        .writeStream.format("graft.sources.FramedSource")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "relay drain did not finish")
    }
    relayOnce()
    val landed = spark.read.format("graft.sources.FramedSource").load(sink)
    assert(landed.count() == 30)
    assert(landed.select("event_id").distinct().count() == 30)
    // epoch-scoped file names: ≥3 epochs landed as separate files
    assert(graft.sources.FramedSource.frameFiles(sink).size >= 3)
    // a new source file after the drain relays exactly once on restart
    writeFile("f3.frames", 30 until 42)
    relayOnce()
    val all = spark.read.format("graft.sources.FramedSource").load(sink)
    assert(all.count() == 42, "appended file must relay exactly once")
    assert(all.select("event_id").distinct().count() == 42)
    // values survive the double framed roundtrip bit-for-bit
    assert(all.where(col("score") =!= col("event_id") * 1.5).isEmpty)
  }

  test("a file torn inside the 4-byte frame-length header fails loudly, not as a clean EOF") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_hdr")
    val f = dir.resolve("torn_header.frames").toString
    val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
    // one good frame, then 2 of the next frame's 4 length bytes — a
    // torn write mid-header. A plain readInt EOF would silently end
    // the file after the good row (ADVICE r5).
    try { writeFrame(dos, Seq(("event_id", TagLong, 1L))); dos.writeShort(0) }
    finally dos.close()
    val req = StructType(Seq(StructField("event_id", LongType, nullable = false)))
    val r = new graft.sources.FramedReader(f, req, Nil)
    try {
      val e = intercept[java.io.EOFException] { while (r.next()) () }
      assert(e.getMessage.contains("truncated frame header") && e.getMessage.contains(f),
        e.getMessage)
    } finally r.close()
    // inference is equally loud when its first frame's header is torn:
    // only a ZERO-byte file is the skippable empty-writer case
    val dir2 = java.nio.file.Files.createTempDirectory("graft_framed_hdr2")
    val dos2 = new java.io.DataOutputStream(
      new java.io.FileOutputStream(dir2.resolve("only_header_bytes.frames").toString))
    try dos2.writeShort(0) finally dos2.close()
    val e2 = intercept[java.io.EOFException] { graft.sources.FramedSource.infer(dir2.toString) }
    assert(e2.getMessage.contains("truncated frame header"), e2.getMessage)
  }

  test("reading a missing directory fails at analysis with a clear message") {
    val missing = s"${java.nio.file.Files.createTempDirectory("graft_framed_miss")}/not_there"
    val e = intercept[Exception] {
      spark.read.format("graft.sources.FramedSource").load(missing).collect()
    }
    assert(e.getMessage.contains("read path does not exist"), e.getMessage)
    // the write path stays open: a first write CREATES the directory
    spark.range(3).select(col("id").as("event_id"))
      .write.format("graft.sources.FramedSource").mode("append").save(missing)
    assert(spark.read.format("graft.sources.FramedSource").load(missing).count() == 3)
  }

  test("double-key eval is hardened like the long key: non-Number passes, precision never shifts the drop") {
    import org.apache.spark.sql.sources._
    import graft.sources.FramedFilters.eval
    // non-Number comparison value on a double key: pass through to the
    // residual, never ClassCastException (ADVICE r5)
    assert(eval(LessThan("value", "oops"), Map("value" -> 1.0)))
    // a decimal with more precision than double: 0.1 is really
    // 0.1000000000000000055511151231257827…; a doubleValue comparison
    // against 0.1000000000000000056 would wrongly call them equal and
    // drop the row on EqualTo-negation shapes — BigDecimal keeps the
    // true ordering (value > key here)
    assert(eval(GreaterThan("value", new java.math.BigDecimal("0.1000000000000000055511151231257827021181583404541015625")),
      Map("value" -> 0.1)) === false) // equal, not greater
    assert(eval(EqualTo("value", new java.math.BigDecimal("0.1000000000000000055511151231257827021181583404541015625")),
      Map("value" -> 0.1)))
    assert(!eval(EqualTo("value", new java.math.BigDecimal("0.1000000000000000056")),
      Map("value" -> 0.1)))
    assert(eval(LessThan("value", new java.math.BigDecimal("0.1000000000000000056")),
      Map("value" -> 0.1)))
    // NaN/Infinity values fall back to IEEE ordering instead of
    // throwing in BigDecimal
    assert(eval(LessThan("value", Double.PositiveInfinity), Map("value" -> 1.0)))
    assert(!eval(GreaterThan("value", Double.NaN), Map("value" -> 1.0)))
    assert(eval(EqualTo("value", 1.0), Map("value" -> 1.0)))
    // long-key NaN comparison is equally safe (shared exactDecimal path)
    assert(eval(LessThan("event_id", Double.NaN), Map("event_id" -> 3L)))
    // string keys pass through non-String values
    assert(eval(EqualTo("event_type", 7L), Map("event_type" -> "x")))
  }

  test("streaming offset compaction needs consecutive absent listings — one listing flicker never re-admits a file") {
    import graft.sources.{FramedFormat, FramedMicroBatchStream, SerializableHadoopConf}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_compact").toString
    def writeFile(name: String): Unit = {
      val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/$name"))
      try FramedFormat.writeFrame(dos, Seq(("event_id", FramedFormat.TagLong, 1L)))
      finally dos.close()
    }
    writeFile("f0.frames"); writeFile("f1.frames")
    val schema = StructType(Seq(StructField("event_id", LongType, nullable = false)))
    val stream = new FramedMicroBatchStream(schema, schema, Nil, dir,
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    def files(o: org.apache.spark.sql.connector.read.streaming.Offset): Set[String] =
      o.asInstanceOf[stream.FileSetOffset].files
    val o1 = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
    assert(files(o1).size == 2)
    // f1 vanishes from ONE listing (FS hiccup / non-atomic object-store
    // listing / archive-then-restore), then reappears: the processed
    // name must survive the flicker — dropping it would re-admit the
    // file as fresh and deliver its rows twice (ADVICE r5)
    val f1 = new java.io.File(s"$dir/f1.frames")
    val bytes = java.nio.file.Files.readAllBytes(f1.toPath)
    assert(f1.delete())
    val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())
    assert(files(o2).exists(_.endsWith("f1.frames")),
      "one absent listing must not compact a processed file")
    java.nio.file.Files.write(f1.toPath, bytes)
    val o3 = stream.latestOffset(o2, ReadLimit.allAvailable())
    assert(stream.planInputPartitions(o2, o3).isEmpty,
      "reappeared file was re-admitted as fresh — duplicate delivery")
    // truly-gone files DO compact, after CompactAfterMissing
    // consecutive absent listings — the offset stays bounded by the
    // directory's live contents plus a short grace window
    assert(f1.delete())
    var o = o3
    (1 to stream.CompactAfterMissing).foreach { _ =>
      o = stream.latestOffset(o, ReadLimit.allAvailable())
    }
    assert(!files(o).exists(_.endsWith("f1.frames")),
      "aged-out file never compacted — offsets would grow unboundedly")
  }

  test("a large indexed frame file reads as multiple ranged partitions, losslessly") {
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_framed_split")}/table"
    // one task → ONE file; small index blocks so the fixture stays tiny
    val n = 5000L
    spark.range(0, n).coalesce(1).select(
        col("id").as("event_id"),
        concat(lit("payload-"), col("id") % 7).as("kind"),
        (col("id") * 0.25).as("score"))
      .write.format("graft.sources.FramedSource")
      .option("indexBlockBytes", "4096").mode("overwrite").save(dir)
    val files = graft.sources.FramedSource.frameFiles(dir)
    assert(files.size == 1, s"expected one data file, got ${files.size}")
    // frameFiles returns qualified URIs (file:/…) — resolve to local paths
    def local(p: String) = new java.io.File(new java.net.URI(p).getPath)
    assert(local(graft.sources.FrameIndex.sidecarPath(files.head)).exists(),
      "writer did not publish the sidecar index")
    // default targetSplitBytes (128 MiB) ≫ file size → whole file, 1 partition
    val whole = spark.read.format("graft.sources.FramedSource").load(dir)
    assert(whole.rdd.getNumPartitions == 1)
    // small targetSplitBytes → ranged partitions at indexed frame
    // boundaries; zero row loss, zero duplication (VERDICT r5 #1)
    val split = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "16384").load(dir)
    val parts = split.rdd.getNumPartitions
    assert(parts > 1, s"indexed large file still read as $parts partition(s)")
    assert(split.count() == n)
    assert(split.select("event_id").distinct().count() == n)
    // values, not just counts: checksum equality against the unsplit read
    val sumWhole = whole.agg(sum(col("score"))).collect()(0).getDouble(0)
    val sumSplit = split.agg(sum(col("score"))).collect()(0).getDouble(0)
    assert(sumWhole == sumSplit)
    // provenance: many partitions, one file
    assert(split.select("_file").distinct().count() == 1)
    // pushdown still sheds inside every range
    assert(split.where(col("event_id") < 100L).count() == 100)
    // a STALE sidecar (file length mismatch after an out-of-band
    // append) is ignored — whole-file fallback, never a wrong result
    val out = new java.io.FileOutputStream(
      local(graft.sources.FrameIndex.sidecarPath(files.head)), false)
    try out.write("not an index".getBytes("UTF-8")) finally out.close()
    val fallback = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "16384").load(dir)
    assert(fallback.rdd.getNumPartitions == 1, "corrupt sidecar must degrade to whole-file")
    assert(fallback.count() == n)
    // overwrite truncation removes the stale sidecar with its data file
    spark.range(0, 10).coalesce(1).select(col("id").as("event_id"))
      .write.format("graft.sources.FramedSource").mode("overwrite").save(dir)
    assert(!local(graft.sources.FrameIndex.sidecarPath(files.head)).exists(),
      "overwrite left a stale sidecar behind")
  }

  test("tag-4 ragged struct key (pulse series) roundtrips through write and read, schema included") {
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_framed_t4")}/table"
    val df = spark.range(0, 200).select(
      col("id").as("event_id"),
      when(col("id") % 4 === 0, array().cast("array<struct<t:bigint,q:double>>"))
        .otherwise(transform(sequence(lit(1L), col("id") % 4), i =>
          struct((col("id") * 10 + i - 1).as("t"), ((i - 1).cast("double") * 0.5).as("q"))))
        .as("pulses"))
    df.write.format("graft.sources.FramedSource").mode("overwrite").save(dir)
    // inference reconstructs the nested type from the wire field directory
    assert(graft.sources.FramedSource.infer(dir) == StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("pulses", ArrayType(StructType(Seq(
        StructField("t", LongType, nullable = false),
        StructField("q", DoubleType, nullable = false))), containsNull = false),
        nullable = false))))
    val back = spark.read.format("graft.sources.FramedSource").load(dir)
    assertSameRows(
      back.withColumn("pulses", col("pulses").cast("string")),
      df.withColumn("pulses", col("pulses").cast("string")),
      "tag-4 roundtrip")
    // a struct wider than the wire's uint8 field count is rejected at
    // write BUILD (tagOf declines it), never truncated into corruption
    val wide = StructType((0 until 256).map(i =>
      StructField(s"f$i", LongType, nullable = false)))
    assert(graft.sources.FramedWrite.tagOf(
      ArrayType(wide, containsNull = false)).isEmpty)
    assert(graft.sources.FramedWrite.tagOf(ArrayType(StructType(
      (0 until 255).map(i => StructField(s"f$i", LongType, nullable = false))),
      containsNull = false)).contains(graft.sources.FramedFormat.TagStructArray))
    // NULL struct elements / fields fail the write loudly
    val withNull = spark.range(3).select(col("id").as("event_id"),
      array(struct(lit(1L).as("t"),
        when(col("id") === 1L, lit(null).cast("double")).otherwise(lit(0.5)).as("q")))
        .as("pulses"))
    val e = intercept[Exception] {
      withNull.write.format("graft.sources.FramedSource").mode("append").save(dir)
    }
    assert(e.getMessage.contains("NULL") || e.getCause != null, e.getMessage)
  }

  test("struct-field pruning reaches the frame parser: unrequested field blocks are skipped") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_t4p").toString
    val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/a.frames"))
    try (0 until 10).foreach { i =>
      writeFrame(dos, Seq(
        ("event_id", TagLong, i.toLong),
        ("pulses", TagStructArray, StructColumns(
          Seq(("t", TagLong), ("q", TagDouble), ("w", TagDouble)),
          3,
          Seq(Array.tabulate(3)(j => (i * 10 + j).toLong),
              Array.tabulate(3)(j => j * 0.5),
              Array.tabulate(3)(j => j * 2.0))))))
    } finally dos.close()
    // reader-level: a required schema whose struct keeps only (t) must
    // decode t and SKIP the q/w column blocks — and the decode must
    // stay aligned (all 10 frames parse)
    val pruned = StructType(Seq(
      StructField("pulses", ArrayType(StructType(Seq(
        StructField("t", LongType, nullable = false))), containsNull = false),
        nullable = false)))
    val r = new graft.sources.FramedReader(s"$dir/a.frames", pruned, Nil)
    var n = 0
    var tSum = 0L
    try while (r.next()) {
      val arr = r.get().getArray(0)
      (0 until arr.numElements()).foreach(j => tSum += arr.getStruct(j, 1).getLong(0))
      n += 1
    } finally r.close()
    assert(n == 10)
    assert(tSum == (0 until 10).map(i => 3L * (i * 10) + 3L).sum)
    // end-to-end: projecting one nested field yields correct values
    val viaDf = spark.read.format("graft.sources.FramedSource").load(dir)
      .select(explode(col("pulses")).as("p")).select(sum(col("p.t"))).collect()(0).getLong(0)
    assert(viaDf == tSum)
    // a required field the wire lacks fails loudly (foreign/evolved file)
    val missing = StructType(Seq(
      StructField("pulses", ArrayType(StructType(Seq(
        StructField("nosuch", LongType, nullable = false))), containsNull = false),
        nullable = false)))
    val r2 = new graft.sources.FramedReader(s"$dir/a.frames", missing, Nil)
    try {
      val e = intercept[IllegalStateException] { while (r2.next()) () }
      assert(e.getMessage.contains("lacks required field"), e.getMessage)
    } finally r2.close()
    // corrupt struct-array count: checked against bodyLen, never a
    // misaligned parse
    val f2 = s"$dir/bad_count.frames"
    val dos2 = new java.io.DataOutputStream(new java.io.FileOutputStream(f2))
    try {
      val name = "pulses".getBytes("UTF-8")
      val tb = "t".getBytes("UTF-8")
      dos2.writeInt(4 + 2 + name.length + 1 + 1 + (2 + tb.length + 1) + 4 + 8)
      dos2.writeInt(1)
      dos2.writeShort(name.length); dos2.write(name); dos2.writeByte(TagStructArray)
      dos2.writeByte(1); dos2.writeShort(tb.length); dos2.write(tb); dos2.writeByte(TagLong)
      dos2.writeInt(0x20000000) // claims 2^29 elements in a 30-byte body
      dos2.writeLong(7L)
    } finally dos2.close()
    val r3 = new graft.sources.FramedReader(f2, pruned, Nil)
    try {
      val e = intercept[IllegalStateException] { while (r3.next()) () }
      assert(e.getMessage.contains("corrupt frame") && e.getMessage.contains("struct array"),
        e.getMessage)
    } finally r3.close()
  }

  test("index backfill makes an externally-produced bare archive range-splittable") {
    import graft.sources.FramedFormat._
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_framed_backfill")}/table"
    new java.io.File(dir).mkdirs()
    // a bare archive no engine sink wrote: no sidecar
    val n = 4000
    val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/a.frames"))
    try (0 until n).foreach { i =>
      writeFrame(dos, Seq(
        ("event_id", TagLong, i.toLong),
        ("score", TagDouble, i * 0.25),
        ("kind", TagString, s"k${i % 5}")))
    } finally dos.close()
    def parts(split: Long): Int =
      spark.read.format("graft.sources.FramedSource")
        .option("targetSplitBytes", split.toString).load(dir).rdd.getNumPartitions
    assert(parts(8192) == 1, "bare file must read whole before backfill")
    val indexed = graft.sources.FramedSource.backfillIndexes(
      spark, dir, blockBytes = 4096, minBytes = 16 * 1024)
    assert(indexed.size == 1 && indexed.head.endsWith("a.frames"), indexed.toString)
    assert(parts(8192) > 1, "backfilled file must split")
    // lossless: same rows, same values, through the ranged read
    val split = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "8192").load(dir)
    assert(split.count() == n)
    assert(split.select("event_id").distinct().count() == n)
    assert(split.agg(sum(col("score"))).collect()(0).getDouble(0) ==
           (0 until n).map(_ * 0.25).sum)
    // idempotent: a second pass finds the valid sidecar and does nothing
    assert(graft.sources.FramedSource.backfillIndexes(
      spark, dir, blockBytes = 4096, minBytes = 16 * 1024).isEmpty)
    // small and compressed files are skipped entirely
    val d2 = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/small.frames"))
    try writeFrame(d2, Seq(("event_id", TagLong, 0L))) finally d2.close()
    val gz = new java.io.DataOutputStream(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/c.frames.gz")))
    try (0 until 5000).foreach(i => writeFrame(gz, Seq(("event_id", TagLong, i.toLong))))
    finally gz.close()
    assert(graft.sources.FramedSource.backfillIndexes(
      spark, dir, blockBytes = 4096, minBytes = 16).isEmpty,
      "small/compressed files must be skipped")
    // a torn file (truncated mid-frame) fails the walk loudly — no
    // sidecar is ever published for it
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/a.frames"))
    val tornPath = java.nio.file.Paths.get(s"$dir/torn.frames")
    java.nio.file.Files.write(tornPath, bytes.take(bytes.length - 7))
    val e = intercept[Exception] {
      graft.sources.FrameIndex.backfill(s"$dir/torn.frames",
        spark.sparkContext.hadoopConfiguration, 4096)
    }
    assert(e.getMessage.contains("truncated") || e.getMessage.contains("torn") ||
           e.getMessage.contains("corrupt"), e.getMessage)
    assert(!new java.io.File(s"$dir/torn.frames.idx").exists())
  }

  test("a frame missing a required top-level key fails loudly, never a silent null slot") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_misskey").toString
    val d1 = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/a.frames"))
    try (0 until 3).foreach { i =>
      writeFrame(d1, Seq(("a", TagLong, i.toLong), ("b", TagDouble, i * 0.5)))
    } finally d1.close()
    // a later (schema-evolved / foreign) file carries only key `a`
    val d2 = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/b.frames"))
    try writeFrame(d2, Seq(("a", TagLong, 99L))) finally d2.close()
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", DoubleType, nullable = false)))
    val r = new graft.sources.FramedReader(s"$dir/b.frames", schema, Nil)
    try {
      val e = intercept[IllegalStateException] { while (r.next()) () }
      assert(e.getMessage.contains("lacks required key") && e.getMessage.contains("b"),
        e.getMessage)
    } finally r.close()
    // the well-formed file still reads; _file metadata stays exempt —
    // and pruning makes the contract precise: a query touching only
    // keys PRESENT everywhere succeeds over the mixed dir...
    val ok = spark.read.format("graft.sources.FramedSource").load(dir)
      .where(col("_file").endsWith("a.frames"))
    assert(ok.count() == 3)
    assert(spark.read.format("graft.sources.FramedSource").load(dir)
      .select("a").count() == 4)
    // ...while one demanding the evolved-away key fails loudly
    val e2 = intercept[Exception] {
      spark.read.format("graft.sources.FramedSource").load(dir)
        .select("a", "b").collect()
    }
    assert(e2.toString.contains("lacks required key") ||
           Option(e2.getCause).exists(_.toString.contains("lacks required key")),
      e2.toString)
  }

  test("allowMissingKeys null-fills evolved-away top-level keys; default stays loud") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_evolve").toString
    // season 1 predates key `b`; season 2 carries the evolved key set
    val d1 = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/s1.frames"))
    try (0 until 3).foreach { i =>
      writeFrame(d1, Seq(("a", TagLong, i.toLong)))
    } finally d1.close()
    val d2 = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/s2.frames"))
    try (0 until 2).foreach { i =>
      writeFrame(d2, Seq(("a", TagLong, 10L + i), ("b", TagDouble, i + 0.5)))
    } finally d2.close()
    val evolved = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", DoubleType, nullable = true)))
    // default: the same evolved schema over the mixed dir stays LOUD
    val e = intercept[Exception] {
      spark.read.format("graft.sources.FramedSource").schema(evolved)
        .load(dir).collect()
    }
    assert(e.toString.contains("lacks required key") ||
           Option(e.getCause).exists(_.toString.contains("lacks required key")),
      e.toString)
    // opt-in: season-1 rows null-fill b, season-2 rows keep their value
    val rows = spark.read.format("graft.sources.FramedSource").schema(evolved)
      .option("allowMissingKeys", "true").load(dir)
    assert(rows.count() == 5)
    assert(rows.where(col("b").isNull).count() == 3)
    assert(rows.where(col("b").isNotNull).count() == 2)
    // a pushed filter on the evolved key must not drop missing-key rows
    // at the PARSER (conservative keep) — Spark's residual null
    // semantics then exclude them from the comparison correctly
    assert(rows.where(col("b") > 0.0).count() == 2)
    assert(rows.where(col("b").isNull).agg(sum(col("a"))).head.getLong(0) == 3L)
    // aggregates skip the filled nulls like any SQL null
    assert(rows.agg(sum(col("b"))).head.getDouble(0) == 2.0)
    // inference under the option declares every top-level key nullable
    val inferred = spark.read.format("graft.sources.FramedSource")
      .option("allowMissingKeys", "true").load(dir).schema
    assert(inferred.fields.forall(_.nullable), inferred.simpleString)
    // a USER-SUPPLIED schema with non-nullable fields is WIDENED to
    // all-nullable at getTable under the option (ADVICE r12): the
    // table-level schema must never promise non-null on a slot the
    // reader may null-fill (undefined behavior under codegen)
    assert(rows.schema.fields.forall(_.nullable), rows.schema.simpleString)
    // SINGLE policy (ADVICE r13): the hand-built scan builder — the
    // public-surface backdoor that skips getTable — applies the SAME
    // widening (logged, not silent), so the two entry points cannot
    // disagree about what allowMissingKeys means
    val scan = new graft.sources.FramedScanBuilder(evolved, dir,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("allowMissingKeys", "true"))).build()
      .asInstanceOf[graft.sources.FramedScan]
    assert(scan.readSchema().fields.forall(_.nullable),
      scan.readSchema().simpleString)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("allowWidenedKeys accepts int64->double widening; default and narrowing stay loud") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_widen").toString
    // season 1 stored v as int64; season 2 widened it to double
    val d1 = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/s1.frames"))
    try (1 to 3).foreach { i =>
      writeFrame(d1, Seq(("k", TagLong, i.toLong), ("v", TagLong, i * 10L)))
    } finally d1.close()
    val d2 = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/s2.frames"))
    try (4 to 5).foreach { i =>
      writeFrame(d2, Seq(("k", TagLong, i.toLong), ("v", TagDouble, i + 0.5)))
    } finally d2.close()
    val widened = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false)))
    // DEFAULT: the declared-double read of the mixed-width directory
    // fails loudly at the mismatched key, naming the opt-in
    val e = intercept[Exception] {
      spark.read.format("graft.sources.FramedSource").schema(widened)
        .load(dir).collect()
    }
    assert(e.toString.contains("allowWidenedKeys") ||
           Option(e.getCause).exists(_.toString.contains("allowWidenedKeys")),
      e.toString)
    // OPT-IN: int64 values decode widened, doubles pass through
    val rows = spark.read.format("graft.sources.FramedSource").schema(widened)
      .option("allowWidenedKeys", "true").load(dir)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0),
                             (4L, 4.5), (5L, 5.5)))
    // a pushed filter on the widened key compares the SAME widened
    // double the query sees (spans both seasons' physical types)
    val flt = spark.read.format("graft.sources.FramedSource").schema(widened)
      .option("allowWidenedKeys", "true").load(dir)
      .where(col("v") > 5.0).orderBy("k")
      .collect().map(_.getLong(0))
    assert(flt.toSeq == Seq(1L, 2L, 3L, 5L))
    // NARROWING (declared long over the double season) has no opt-in
    val narrow = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    val e2 = intercept[Exception] {
      spark.read.format("graft.sources.FramedSource").schema(narrow)
        .option("allowWidenedKeys", "true").load(dir).collect()
    }
    assert(e2.toString.contains("double on the wire but declared bigint") ||
           Option(e2.getCause).exists(_.toString.contains(
             "double on the wire but declared bigint")), e2.toString)
    // an unrelated physical mismatch (string declared over a long
    // wire key) is loud too — never a downstream ClassCastException
    val wrong = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", DoubleType, nullable = false)))
    val e3 = intercept[Exception] {
      spark.read.format("graft.sources.FramedSource").schema(wrong)
        .option("allowWidenedKeys", "true").load(dir).collect()
    }
    assert(e3.toString.contains("int64 on the wire but declared string") ||
           Option(e3.getCause).exists(_.toString.contains(
             "int64 on the wire but declared string")), e3.toString)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("tag-5 scalar struct key (event header) roundtrips through write and read, schema included") {
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_framed_t5")}/table"
    val df = spark.range(0, 200).select(
      col("id").as("event_id"),
      struct((col("id") % 7).as("run"), (col("id") % 3).as("sub"),
             (col("id") * 1000L - 5L).as("t0"),
             (col("id").cast("double") * 0.25 - 1.0).as("q")).as("header"))
    df.write.format("graft.sources.FramedSource").mode("overwrite").save(dir)
    // inference reconstructs the nested type from the wire field directory
    assert(graft.sources.FramedSource.infer(dir) == StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("header", StructType(Seq(
        StructField("run", LongType, nullable = false),
        StructField("sub", LongType, nullable = false),
        StructField("t0", LongType, nullable = false),
        StructField("q", DoubleType, nullable = false))), nullable = false))))
    val back = spark.read.format("graft.sources.FramedSource").load(dir)
    assertSameRows(
      back.withColumn("header", col("header").cast("string")),
      df.withColumn("header", col("header").cast("string")),
      "tag-5 roundtrip")
    // a struct wider than the wire's uint8 field count is rejected at
    // write BUILD (tagOf declines it), never truncated into corruption
    val wide = StructType((0 until 256).map(i =>
      StructField(s"f$i", LongType, nullable = false)))
    assert(graft.sources.FramedWrite.tagOf(wide).isEmpty)
    assert(graft.sources.FramedWrite.tagOf(StructType(
      (0 until 255).map(i => StructField(s"f$i", LongType, nullable = false))))
      .contains(graft.sources.FramedFormat.TagStruct))
    // NULL struct fields fail the write loudly
    val withNull = spark.range(3).select(col("id").as("event_id"),
      struct(lit(1L).as("run"),
        when(col("id") === 1L, lit(null).cast("double")).otherwise(lit(0.5)).as("q"))
        .as("header"))
    val e = intercept[Exception] {
      withNull.write.format("graft.sources.FramedSource").mode("append").save(dir)
    }
    assert(e.getMessage.contains("NULL") || e.getCause != null, e.getMessage)
  }

  test("scalar-struct field pruning reaches the frame parser and the scan (tag 5)") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_t5p").toString
    val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(s"$dir/a.frames"))
    try (0 until 10).foreach { i =>
      writeFrame(dos, Seq(
        ("event_id", TagLong, i.toLong),
        ("header", TagStruct, StructScalar(
          Seq(("run", TagLong), ("t0", TagLong), ("q", TagDouble)),
          Seq(java.lang.Long.valueOf(i % 3L), java.lang.Long.valueOf(i * 100L),
              java.lang.Double.valueOf(i * 0.5))))))
    } finally dos.close()
    // reader-level: a required schema keeping only (t0) must decode t0
    // and SKIP run/q — and the decode must stay aligned (all 10 parse)
    val pruned = StructType(Seq(
      StructField("header", StructType(Seq(
        StructField("t0", LongType, nullable = false))), nullable = false)))
    val r = new graft.sources.FramedReader(s"$dir/a.frames", pruned, Nil)
    var n = 0
    var tSum = 0L
    try while (r.next()) {
      tSum += r.get().getStruct(0, 1).getLong(0)
      n += 1
    } finally r.close()
    assert(n == 10)
    assert(tSum == (0 until 10).map(_ * 100L).sum)
    // end-to-end: nested pruning reaches the scan's ReadSchema
    val df = spark.read.format("graft.sources.FramedSource").load(dir)
      .select(col("header.t0").as("t0"))
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.asInstanceOf[graft.sources.FramedScan]
    val st = scan.readSchema()("header").dataType.asInstanceOf[StructType]
    assert(st.fieldNames.toSeq == Seq("t0"),
      s"run/q not pruned from the scan: ${scan.readSchema().simpleString}")
    assert(df.agg(sum(col("t0"))).collect()(0).getLong(0) == tSum)
    // a required field the wire lacks fails loudly (foreign/evolved file)
    val missing = StructType(Seq(
      StructField("header", StructType(Seq(
        StructField("nosuch", LongType, nullable = false))), nullable = false)))
    val r2 = new graft.sources.FramedReader(s"$dir/a.frames", missing, Nil)
    try {
      val e = intercept[IllegalStateException] { while (r2.next()) () }
      assert(e.getMessage.contains("lacks required field"), e.getMessage)
    } finally r2.close()
    // corrupt field-name length: checked against bodyLen, never a
    // misaligned parse into garbage values
    val f2 = s"$dir/bad_name.frames"
    val dos2 = new java.io.DataOutputStream(new java.io.FileOutputStream(f2))
    try {
      val name = "header".getBytes("UTF-8")
      dos2.writeInt(4 + 2 + name.length + 1 + 1 + 2) // tiny body
      dos2.writeInt(1)
      dos2.writeShort(name.length); dos2.write(name); dos2.writeByte(TagStruct)
      dos2.writeByte(1)
      dos2.writeShort(0xFFFF) // field-name length far beyond the body
    } finally dos2.close()
    val r3 = new graft.sources.FramedReader(f2, pruned, Nil)
    try {
      val e = intercept[IllegalStateException] { while (r3.next()) () }
      assert(e.getMessage.contains("corrupt frame") &&
        e.getMessage.contains("struct field name"), e.getMessage)
    } finally r3.close()
  }

  test("compressed WRITE: gzip sink roundtrips, block-splits via the v2 index, rejects unusable codecs") {
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_framed_wgz")}/table"
    val df = spark.range(0, 500).select(
      col("id").as("event_id"),
      concat(lit("k"), col("id") % 3).as("kind"),
      (col("id") * 0.5).as("score"))
    df.coalesce(1).write.format("graft.sources.FramedSource")
      .option("compression", "gzip")
      .option("indexBlockBytes", "1024") // several codec members
      .mode("overwrite").save(dir)
    val files = graft.sources.FramedSource.frameFiles(dir)
    assert(files.size == 1 && files.head.endsWith(".frames.gz"),
      s"expected one .frames.gz, got $files")
    // block-compressed output publishes the v2 member-boundary sidecar
    // (VERDICT r6 #1: compressed files split too)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.exists(_.endsWith(".idx")),
      "block-compressed output must publish its v2 split index")
    // whole-file read: concatenated members are a valid gzip stream
    val back = spark.read.format("graft.sources.FramedSource").load(dir)
    assert(back.rdd.getNumPartitions == 1, "default split size must keep one partition")
    assertSameRows(back, df, "compressed write roundtrip")
    // ranged read: member-boundary seeks, zero loss/dup, same values
    val split = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "2048").load(dir)
    assert(split.rdd.getNumPartitions > 1,
      s"block-compressed indexed file still read as one partition")
    assertSameRows(split, df, "block-compressed ranged read")
    // a STALE sidecar (content no longer matching the data file) is
    // ignored — whole-file fallback, never a wrong result
    def local(p: String) = new java.io.File(new java.net.URI(p).getPath)
    val sidecar = local(graft.sources.FrameIndex.sidecarPath(files.head))
    val goodBytes = java.nio.file.Files.readAllBytes(sidecar.toPath)
    val bad = goodBytes.clone()
    bad(goodBytes.length / 2) = (bad(goodBytes.length / 2) ^ 0x55).toByte
    java.nio.file.Files.write(sidecar.toPath, bad)
    val fb = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "2048").load(dir)
    assert(fb.rdd.getNumPartitions == 1,
      "corrupt (CRC-failing) sidecar must degrade to whole-file read")
    assertSameRows(fb, df, "corrupt-sidecar fallback")
    java.nio.file.Files.write(sidecar.toPath, goodBytes)
    // overwrite truncation removes compressed files too
    df.limit(10).write.format("graft.sources.FramedSource")
      .option("compression", "gzip").mode("overwrite").save(dir)
    assert(spark.read.format("graft.sources.FramedSource").load(dir).count() == 10)
    // unknown codec fails at write build with a clear message
    val e1 = intercept[Exception] {
      df.write.format("graft.sources.FramedSource")
        .option("compression", "nosuchcodec").mode("append").save(dir)
    }
    assert(e1.getMessage.contains("compression codec"), e1.getMessage)
    // zstd: pure-JVM via graft.sources.ZstdCodec (zstd-jni, which
    // Spark ships) — registered by sessionHadoopConf, so the codec is
    // ALWAYS usable and must hit full gzip parity: block-compressed
    // write (zstd frames concatenate, so the concatMemberSafe probe
    // admits blocks), v2 split index, whole-file and ranged reads
    val zdir = s"${java.nio.file.Files.createTempDirectory("graft_framed_wzst")}/table"
    df.coalesce(1).write.format("graft.sources.FramedSource")
      .option("compression", "zstd")
      .option("indexBlockBytes", "1024")
      .mode("overwrite").save(zdir)
    val zfiles = graft.sources.FramedSource.frameFiles(zdir)
    assert(zfiles.size == 1 && zfiles.head.endsWith(".frames.zst"),
      s"expected one .frames.zst, got $zfiles")
    assert(new java.io.File(zdir).listFiles().map(_.getName).exists(_.endsWith(".idx")),
      "zstd is concat-member-safe, so block-compressed output must publish its v2 index")
    assertSameRows(
      spark.read.format("graft.sources.FramedSource").load(zdir), df, "zstd roundtrip")
    val zsplit = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "2048").load(zdir)
    assert(zsplit.rdd.getNumPartitions > 1,
      "block-compressed indexed .frames.zst still read as one partition")
    assertSameRows(zsplit, df, "zstd block-compressed ranged read")
  }

  test("legacy v1 sidecars still split; concat-unsafe codecs degrade to one unsplit stream") {
    // (a) v1 back-compat: an archive indexed by the pre-v2 engine must
    // KEEP its splittability after the upgrade (review r7: rejecting
    // v1 silently demoted every old indexed file to one task)
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_framed_v1idx")}/table"
    val df = spark.range(0, 3000).coalesce(1).select(
      col("id").as("event_id"), (col("id") * 0.25).as("score"))
    df.write.format("graft.sources.FramedSource")
      .option("indexBlockBytes", "4096").mode("overwrite").save(dir)
    val file = graft.sources.FramedSource.frameFiles(dir).head
    def local(p: String) = new java.io.File(new java.net.URI(p).getPath)
    val dataLen = local(file).length()
    val conf = spark.sparkContext.hadoopConfiguration
    val v2 = graft.sources.FrameIndex.read(file, dataLen, conf).get
    assert(!v2.blockCompressed && v2.disk.length >= 2)
    // rewrite the sidecar in the v1 layout: magic, version=1,
    // dataLength, n, raw offsets — no flags, no rawLength, no CRC
    val sidecar = local(graft.sources.FrameIndex.sidecarPath(file))
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    o.writeInt(graft.sources.FrameIndex.Magic)
    o.writeInt(1)
    o.writeLong(dataLen)
    o.writeInt(v2.raw.length)
    v2.raw.foreach(o.writeLong)
    java.nio.file.Files.write(sidecar.toPath, bos.toByteArray)
    // the out-of-band rewrite invalidates LocalFileSystem's checksum
    // sibling — drop it (a REAL v1 archive has a v1-consistent .crc)
    new java.io.File(sidecar.getParentFile, s".${sidecar.getName}.crc").delete()
    val parsed = graft.sources.FrameIndex.read(file, dataLen, conf)
    assert(parsed.isDefined, "v1 sidecar must still parse")
    assert(!parsed.get.blockCompressed &&
      parsed.get.disk.sameElements(v2.raw) && parsed.get.raw.sameElements(v2.raw))
    val split = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "16384").load(dir)
    assert(split.rdd.getNumPartitions > 1,
      "v1-indexed file must still fan out into ranged partitions")
    assertSameRows(split, df, "v1-sidecar ranged read")
    // a corrupt v1 body (bad offsets) still degrades to whole-file
    val badBos = new java.io.ByteArrayOutputStream()
    val b = new java.io.DataOutputStream(badBos)
    b.writeInt(graft.sources.FrameIndex.Magic); b.writeInt(1)
    b.writeLong(dataLen); b.writeInt(2); b.writeLong(5L); b.writeLong(3L)
    java.nio.file.Files.write(sidecar.toPath, badBos.toByteArray)
    assert(graft.sources.FrameIndex.read(file, dataLen, conf).isEmpty,
      "non-monotonic v1 offsets must be rejected")
    // (b) block compression is gated on the runtime's decoder reading
    // CONCATENATED codec members (review r7: raw-zlib style decoders
    // that stop at the first member would silently truncate a
    // whole-file read to the first block). This runtime's pure-JVM
    // decoders all pass; the probe is the analysis-time gate that
    // keeps a runtime where they don't from ever writing a file it
    // cannot fully read back.
    val factory = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
    assert(graft.sources.FramedWrite.concatMemberSafe(factory.getCodecByName("gzip")))
    assert(graft.sources.FramedWrite.concatMemberSafe(factory.getCodecByName("bzip2")))
    // (c) the concat-unsafe fallback path: a writer built with
    // blockCompress=false emits ONE whole-file codec stream and NO
    // split sidecar — correct everywhere, just unsplit
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val dir2 = java.nio.file.Files.createTempDirectory("graft_framed_ss").toString
    val schema = StructType(Seq(StructField("event_id", LongType, nullable = true)))
    val sconf = new graft.sources.SerializableHadoopConf(conf)
    val w = new graft.sources.FramedDataWriter(schema, dir2, "qss", 0, 1L, conf,
      indexBlockBytes = 64L, compression = Some("gzip"), blockCompress = false)
    (0L until 500L).foreach(i => w.write(new GenericInternalRow(Array[Any](i))))
    val msg = w.commit()
    graft.sources.FramedWrite(schema, dir2, "qss", truncate = false, sconf)
      .commit(Array(msg))
    val names2 = new java.io.File(dir2).listFiles().map(_.getName)
    assert(names2.exists(_.endsWith(".frames.gz")), names2.mkString(","))
    assert(!names2.exists(_.endsWith(".idx")),
      "single-stream compressed output must not publish a split index")
    val back = spark.read.format("graft.sources.FramedSource").load(dir2)
    assert(back.rdd.getNumPartitions == 1)
    assert(back.count() == 500 && back.agg(sum(col("event_id"))).collect()(0).getLong(0)
      == (0L until 500L).sum)
  }

  test("bzip2 block compression roundtrips and splits like gzip") {
    // the second concat-safe codec family takes the same block-wise
    // path: independent members, v2 sidecar, ranged member-seek reads
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_framed_wbz2")}/table"
    val df = spark.range(0, 400).select(
      col("id").as("event_id"),
      concat(lit("k"), col("id") % 3).as("kind"),
      (col("id") * 0.5).as("score"))
    df.coalesce(1).write.format("graft.sources.FramedSource")
      .option("compression", "bzip2")
      .option("indexBlockBytes", "1024")
      .mode("overwrite").save(dir)
    val files = graft.sources.FramedSource.frameFiles(dir)
    assert(files.size == 1 && files.head.endsWith(".frames.bz2"),
      s"expected one .frames.bz2, got $files")
    assert(new java.io.File(dir).listFiles().map(_.getName).exists(_.endsWith(".idx")),
      "block-compressed bzip2 output must publish its v2 split index")
    val back = spark.read.format("graft.sources.FramedSource").load(dir)
    assert(back.rdd.getNumPartitions == 1)
    assertSameRows(back, df, "bzip2 whole-file roundtrip")
    val split = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "2048").load(dir)
    assert(split.rdd.getNumPartitions > 1,
      "block-compressed bzip2 indexed file still read as one partition")
    assertSameRows(split, df, "bzip2 ranged member-seek read")
  }

  test("bin-packing composes with index splitting: a huge indexed file fans out inside a packed directory") {
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_framed_packsplit")}/table"
    // one large indexed file...
    spark.range(0, 5000).coalesce(1).select(
        col("id").as("event_id"), (col("id") * 0.25).as("score"))
      .write.format("graft.sources.FramedSource")
      .option("indexBlockBytes", "4096").mode("overwrite").save(dir)
    // ...plus several small ones in the same directory
    spark.range(5000, 5100).repartition(4).select(
        col("id").as("event_id"), (col("id") * 0.25).as("score"))
      .write.format("graft.sources.FramedSource").mode("append").save(dir)
    // packing enabled AND a small split size: the big file must still
    // cut into ranged pieces (ADVICE r6 — before, the packing branch
    // never consulted the index, so one huge file serialized onto one
    // task even when its sidecar allowed splits)
    val packed = spark.read.format("graft.sources.FramedSource")
      .option("targetPartitionBytes", (6L * 1024 * 1024).toString)
      .option("targetSplitBytes", "16384")
      .load(dir)
    val df = packed.select(col("_file"), col("event_id"))
    assert(df.count() == 5100, "packing+splitting lost or duplicated rows")
    assert(df.select("event_id").distinct().count() == 5100)
    val bigFile = graft.sources.FramedSource.frameFiles(dir)
      .map(f => f -> new java.io.File(new java.net.URI(f).getPath).length())
      .maxBy(_._2)._1
    val bigParts = packed
      .select(col("_file"), org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .where(col("_file") === bigFile)
      .select("p").distinct().count()
    assert(bigParts > 1,
      s"large indexed file still serializes onto $bigParts partition under packing")
  }

  test("nested-schema pruning reaches the scan: a t-only projection prunes q from ReadSchema") {
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_framed_t4n")}/table"
    spark.range(0, 50).select(
        col("id").as("event_id"),
        transform(sequence(lit(0L), col("id") % 3), i =>
          struct((col("id") + i).as("t"), (i.cast("double") * 0.5).as("q"))).as("pulses"))
      .write.format("graft.sources.FramedSource").mode("overwrite").save(dir)
    val df = spark.read.format("graft.sources.FramedSource").load(dir)
      .select(explode(col("pulses")).as("p")).select(col("p.t"))
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.asInstanceOf[graft.sources.FramedScan]
    val elem = scan.readSchema()("pulses").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(elem.fieldNames.toSeq == Seq("t"),
      s"q not pruned from the scan: ${scan.readSchema().simpleString}")
    assert(df.agg(sum(col("t"))).collect()(0).getLong(0) ==
      (0L until 50L).map(id => (0L to id % 3).map(id + _).sum).sum)
  }

  test("corrupt array count cannot overflow the skip into misaligned garbage") {
    import graft.sources.FramedFormat._
    val dir = java.nio.file.Files.createTempDirectory("graft_framed_ovf")
    val f = dir.resolve("overflow.frames").toString
    val dos = new java.io.DataOutputStream(new java.io.FileOutputStream(f))
    try {
      writeFrame(dos, Seq(("event_id", TagLong, 1L), ("arr", TagLongArray, Array(1L, 2L))))
      // corrupt count 0x30000000: n * 8 overflows Int to a negative
      // no-op skip in unchecked arithmetic, silently misaligning the
      // parse; checked n.toLong * 8 vs bodyLen must throw instead
      val name = "arr".getBytes("UTF-8")
      dos.writeInt(4 + 2 + name.length + 1 + 4 + 16)
      dos.writeInt(1)
      dos.writeShort(name.length); dos.write(name); dos.writeByte(TagLongArray)
      dos.writeInt(0x30000000)
      dos.writeLong(1L); dos.writeLong(2L)
    } finally dos.close()
    val req = StructType(Seq(StructField("event_id", LongType, nullable = false)))
    val r = new graft.sources.FramedReader(f, req, Nil)
    try {
      val e = intercept[IllegalStateException] { while (r.next()) () }
      assert(e.getMessage.contains("corrupt frame") && e.getMessage.contains("array"), e.getMessage)
    } finally r.close()
  }

  // ---- v3 per-block min/max stats skipping (the row-group analog) ----

  /** One sorted, indexed, single-file fixture in a fresh temp dir:
    * event_id is a 0..3999 ramp so consecutive index blocks hold
    * DISJOINT id ranges — the layout that gives stats their pruning
    * power. Returns (dir, file URI, data length, the source frame). */
  private def sortedStatsFixture(): (String, String, Long, org.apache.spark.sql.DataFrame) = {
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_framed_skip")}/table"
    val df = spark.range(0, 4000).coalesce(1)
      .select(col("id").as("event_id"), (col("id") * 0.25).as("score"))
      .sortWithinPartitions("event_id")
    df.write.format("graft.sources.FramedSource")
      .option("indexBlockBytes", "4096").mode("overwrite").save(dir)
    val file = graft.sources.FramedSource.frameFiles(dir).head
    val len = new java.io.File(new java.net.URI(file).getPath).length()
    (dir, file, len, df)
  }

  test("v3 stats: a selective pushed predicate plans a strict subset of blocks") {
    import org.apache.spark.sql.sources._
    val (dir, file, dataLen, _) = sortedStatsFixture()
    val conf = spark.sparkContext.hadoopConfiguration
    val info = graft.sources.FrameIndex.read(file, dataLen, conf).get
    // the writer recorded stats for both scalar keys, all-present
    assert(info.stats.map(_.name).toSet == Set("event_id", "score"))
    assert(info.disk.length >= 4, s"fixture too small: ${info.disk.length} blocks")
    val ids = info.stats.find(_.name == "event_id").get
    assert(ids.present.forall(identity))
    // sorted input → strictly increasing disjoint per-block id ranges
    assert(ids.min.zip(ids.max).forall { case (mn, mx) => mn <= mx })
    assert(ids.max.init.zip(ids.min.tail).forall { case (pmx, nmn) => pmx < nmn })
    // the planner-side mask: lowest 5% of ids keeps block 0, refutes most
    val keep = graft.sources.FramedFilters.keptBlocks(
      info, Seq(LessThanOrEqual("event_id", 199L)))
    assert(keep(0), "the block holding matching ids must survive")
    assert(keep.count(!_) >= info.disk.length / 2, s"mask: ${keep.mkString(",")}")
    def blockExtent(i: Int): (Long, Long) =
      (info.disk(i), if (i + 1 < info.disk.length) info.disk(i + 1) else dataLen)
    val kept = graft.sources.FrameIndex.rangesKept(info, dataLen, 4096L, keep)
    // STRICT subset of the file's bytes, refuted blocks in NO range…
    assert(kept.map(_.diskLen).sum < dataLen)
    for (i <- keep.indices if !keep(i); r <- kept) {
      val (bs, be) = blockExtent(i)
      assert(r.diskStart >= be || r.diskStart + r.diskLen <= bs,
        s"refuted block $i [$bs,$be) overlaps planned range $r")
    }
    // …and every kept block fully covered (a wrong skip is data loss)
    for (i <- keep.indices if keep(i)) {
      val (bs, be) = blockExtent(i)
      assert(kept.exists(r => r.diskStart <= bs && be <= r.diskStart + r.diskLen),
        s"kept block $i [$bs,$be) not covered by $kept")
    }
    // end-to-end: the DSv2 plan carries only the surviving ranges
    val pruned = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "4096").load(dir)
      .where(col("event_id") <= 199L)
    val scan = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.asInstanceOf[graft.sources.FramedScan]
    val splits = scan.planInputPartitions()
      .flatMap(_.asInstanceOf[graft.sources.FramedPartition].splits)
    assert(splits.nonEmpty && splits.forall(_.length >= 0L))
    assert(splits.map(_.length).sum < dataLen,
      s"planned raw bytes ${splits.map(_.length).sum} must be < file's $dataLen")
    // value-level safety: the pruned read loses and invents nothing
    assert(pruned.count() == 200L)
    assert(pruned.agg(sum(col("event_id"))).head().getLong(0) == (0L to 199L).sum)
  }

  test("stats-skip degrades: v2 sidecar, backfilled stats-less v3, unrefutable filters") {
    import org.apache.spark.sql.sources._
    val (dir, file, dataLen, df) = sortedStatsFixture()
    val conf = spark.sparkContext.hadoopConfiguration
    val v3 = graft.sources.FrameIndex.read(file, dataLen, conf).get
    // no filters / a key without stats / an unhandled filter shape →
    // all-true mask (exactly today's no-skip planning)
    assert(graft.sources.FramedFilters.keptBlocks(v3, Nil).forall(identity))
    assert(graft.sources.FramedFilters.keptBlocks(
      v3, Seq(EqualTo("no_such_key", 5L))).forall(identity))
    assert(graft.sources.FramedFilters.keptBlocks(
      v3, Seq(Not(EqualTo("event_id", 5L)))).forall(identity))
    // crafted v2 sidecar (the r6/r7 engine's layout: header + entries
    // + CRC, NO stats section) over the same data file — the
    // back-compat branch the current writer can no longer produce
    val sidecar = new java.io.File(new java.net.URI(
      graft.sources.FrameIndex.sidecarPath(file)).getPath)
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    o.writeInt(graft.sources.FrameIndex.Magic)
    o.writeInt(2)
    o.writeLong(dataLen)
    o.writeLong(v3.rawLength)
    o.writeInt(0)
    o.writeInt(v3.disk.length)
    v3.disk.indices.foreach { i => o.writeLong(v3.disk(i)); o.writeLong(v3.raw(i)) }
    o.flush()
    val body = bos.toByteArray
    val crc = new java.util.zip.CRC32()
    crc.update(body, 0, body.length)
    o.writeLong(crc.getValue)
    o.flush()
    java.nio.file.Files.write(sidecar.toPath, bos.toByteArray)
    // out-of-band rewrite invalidates LocalFileSystem's checksum sibling
    new java.io.File(sidecar.getParentFile, s".${sidecar.getName}.crc").delete()
    val v2 = graft.sources.FrameIndex.read(file, dataLen, conf).get
    assert(v2.stats.isEmpty, "v2 sidecars parse with EMPTY stats")
    assert(v2.disk.sameElements(v3.disk) && v2.raw.sameElements(v3.raw) &&
      v2.rawLength == v3.rawLength && !v2.blockCompressed)
    // …and keeps splitting: ranged read, >1 partition, identical rows
    val split = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "16384").load(dir)
    assert(split.rdd.getNumPartitions > 1, "v2-indexed file must still fan out")
    assertSameRows(split, df, "v2-sidecar ranged read")
    // degrade: the refutable predicate plans the FULL file on v2 stats
    assert(graft.sources.FramedFilters.keptBlocks(
      v2, Seq(LessThanOrEqual("event_id", 199L))).forall(identity))
    val prunedV2 = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "4096").load(dir)
      .where(col("event_id") <= 199L)
    val scanV2 = prunedV2.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.asInstanceOf[graft.sources.FramedScan]
    val splitsV2 = scanV2.planInputPartitions()
      .flatMap(_.asInstanceOf[graft.sources.FramedPartition].splits)
    assert(splitsV2.map(_.length).sum == dataLen,
      "stats-less sidecar must keep full-range planning")
    assert(prunedV2.count() == 200L)
    // backfilled v3 (bodies never decoded → zero stat keys) degrades too
    assert(sidecar.delete())
    new java.io.File(sidecar.getParentFile, s".${sidecar.getName}.crc").delete()
    assert(graft.sources.FrameIndex.backfill(file, conf, blockBytes = 4096L))
    val bf = graft.sources.FrameIndex.read(file, dataLen, conf).get
    assert(bf.stats.isEmpty, "backfill walks headers only — no stats")
    assert(graft.sources.FramedFilters.keptBlocks(
      bf, Seq(LessThanOrEqual("event_id", 199L))).forall(identity))
  }

  test("stats-skip: an all-refuted file plans ZERO ranges") {
    import org.apache.spark.sql.sources._
    val (dir, file, dataLen, _) = sortedStatsFixture()
    val conf = spark.sparkContext.hadoopConfiguration
    val info = graft.sources.FrameIndex.read(file, dataLen, conf).get
    val keep = graft.sources.FramedFilters.keptBlocks(
      info, Seq(GreaterThan("event_id", 1000000L)))
    assert(keep.forall(!_))
    assert(graft.sources.FrameIndex.rangesKept(info, dataLen, 4096L, keep).isEmpty)
    val none = spark.read.format("graft.sources.FramedSource")
      .option("targetSplitBytes", "4096").load(dir)
      .where(col("event_id") > 1000000L)
    val scan = none.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.asInstanceOf[graft.sources.FramedScan]
    assert(scan.planInputPartitions().isEmpty, "no surviving block → no IO planned")
    assert(none.count() == 0L)
  }

  test("block refutation: refute/non-refute per filter; partial or non-finite stats never skip") {
    import org.apache.spark.sql.sources._
    import graft.sources.{FrameIndex, FramedFilters, FramedFormat}
    def infoOf(ks: FrameIndex.KeyStats) =
      FrameIndex.Info(blockCompressed = false, rawLength = 100L,
        disk = Array(0L), raw = Array(0L), stats = Seq(ks))
    def longKey(mn: Long, mx: Long, present: Boolean = true) =
      FrameIndex.KeyStats("k", FramedFormat.TagLong,
        Array(present), Array(mn), Array(mx))
    def dblKey(mn: Double, mx: Double) =
      FrameIndex.KeyStats("d", FramedFormat.TagDouble, Array(true),
        Array(java.lang.Double.doubleToLongBits(mn)),
        Array(java.lang.Double.doubleToLongBits(mx)))
    def kept(f: Filter, ks: FrameIndex.KeyStats): Boolean =
      FramedFilters.keptBlocks(infoOf(ks), Seq(f))(0)
    // long key, block range [10, 20] — each operator's refute edge
    assert(!kept(EqualTo("k", 25L), longKey(10, 20)))
    assert(!kept(EqualTo("k", 9L), longKey(10, 20)))
    assert(kept(EqualTo("k", 10L), longKey(10, 20)))
    assert(kept(EqualTo("k", 20L), longKey(10, 20)))
    assert(!kept(GreaterThan("k", 20L), longKey(10, 20)))
    assert(kept(GreaterThan("k", 19L), longKey(10, 20)))
    assert(!kept(GreaterThanOrEqual("k", 21L), longKey(10, 20)))
    assert(kept(GreaterThanOrEqual("k", 20L), longKey(10, 20)))
    assert(!kept(LessThan("k", 10L), longKey(10, 20)))
    assert(kept(LessThan("k", 11L), longKey(10, 20)))
    assert(!kept(LessThanOrEqual("k", 9L), longKey(10, 20)))
    assert(kept(LessThanOrEqual("k", 10L), longKey(10, 20)))
    // In refutes only when EVERY member misses the block
    assert(!kept(In("k", Array[Any](25L, 30L)), longKey(10, 20)))
    assert(kept(In("k", Array[Any](25L, 15L)), longKey(10, 20)))
    // a block whose present flag is FALSE is NEVER skipped: a frame
    // missing the key passes every pushed filter by contract
    assert(kept(EqualTo("k", 25L), longKey(10, 20, present = false)))
    assert(kept(GreaterThan("k", 1000L), longKey(10, 20, present = false)))
    // double key, block range [1.0, 4.5]
    assert(!kept(GreaterThan("d", 4.5), dblKey(1.0, 4.5)))
    assert(kept(GreaterThan("d", 4.0), dblKey(1.0, 4.5)))
    assert(!kept(EqualTo("d", 0.5), dblKey(1.0, 4.5)))
    assert(kept(EqualTo("d", 1.0), dblKey(1.0, 4.5)))
    // non-finite bounds REFUSE to refute (NaN/Inf break the finite
    // BigDecimal ordering the comparison relies on)
    assert(kept(EqualTo("d", 99.0), dblKey(1.0, Double.NaN)))
    assert(kept(EqualTo("d", 99.0), dblKey(Double.NegativeInfinity, 4.5)))
    assert(kept(GreaterThan("d", 1e308), dblKey(1.0, Double.PositiveInfinity)))
    assert(kept(LessThan("d", -1e308), dblKey(Double.NegativeInfinity, 4.5)))
  }
}
