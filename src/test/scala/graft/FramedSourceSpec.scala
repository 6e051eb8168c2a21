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

  test("parallelism is per file: one input partition per .frames file") {
    val n = FramedSource.frameFiles(fixtureDir).size
    assert(n > 1, s"fixture should span multiple files, got $n")
    val scanned = spark.read.format("graft.sources.FramedSource").load(fixtureDir)
    assert(scanned.rdd.getNumPartitions == n)
  }
}
