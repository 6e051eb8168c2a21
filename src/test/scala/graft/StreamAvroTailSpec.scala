package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** stream_avro_tail: the REAL binaryFile file-source job — whole Avro
  * containers arriving as micro-batches (maxFilesPerTrigger=1 →
  * AvailableNow → foreachBatch decode+append) — must land the exact
  * rows of the batch declaration, with per-file batch attribution
  * following the staged mtime order. */
class StreamAvroTailSpec extends SparkSpec {

  test("the real container stream lands the batch declaration's totals, " +
       "one container per micro-batch in mtime order") {
    val src = Streams.stageAvroTail(spark, sf001)
    val root = Files.createTempDirectory("graft_avrotail")
    val ckpt = root.resolve("ckpt").toString
    val sink = root.resolve("decoded").toString

    val q = spark.readStream
      .format("binaryFile")
      // file streaming sources demand an explicit schema; binaryFile's
      // is fixed by the format
      .schema("path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")
      .option("pathGlobFilter", "*.avro")
      .option("maxFilesPerTrigger", "1")
      .load(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(Streams.avroTailStep(spark, sink) _)
      .start()
    q.awaitTermination()

    val landed = spark.read.parquet(sink)
    // one container per micro-batch, attributed in staged mtime order:
    // batch id b carried exactly the residue-b container's keys
    val attribution = landed
      .select(col("batch_id"), (col("o_orderkey") % Streams.AvroTailBatches).as("residue"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(attribution == (0L until Streams.AvroTailBatches.toLong).map(b => (b, b)).toSet,
      s"batch attribution: $attribution")
    // stream ≡ batch: the landed rows aggregate to the declared grid
    val streamed = landed
      .groupBy((col("o_orderkey") % Streams.AvroTailBatches).as("batch"))
      .agg(Tables.big(count(lit(1))).as("n"),
           Tables.big(sum("o_orderkey")).as("key_sig"),
           Tables.dsum(col("o_totalprice")).as("total"))
      .orderBy("batch").collect().toSeq
    val declared = SparkEntry.queries("stream_avro_tail")(spark, sf001)
      .collect().toSeq
    assert(streamed == declared,
      s"stream != batch: ${streamed.diff(declared).take(2)}")
  }

  test("the DEFLATE-coded container stream drains through the same job " +
       "to the identical totals — the codec is invisible to streaming") {
    val src = Streams.stageAvroTailDeflate(spark, sf001)
    val root = Files.createTempDirectory("graft_avrotailz")
    val ckpt = root.resolve("ckpt").toString
    val sink = root.resolve("decoded").toString
    val q = spark.readStream
      .format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")
      .option("pathGlobFilter", "*.avro")
      .option("maxFilesPerTrigger", "1")
      .load(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(Streams.avroTailStep(spark, sink) _)
      .start()
    q.awaitTermination()
    val streamed = spark.read.parquet(sink)
      .groupBy((col("o_orderkey") % Streams.AvroTailBatches).as("batch"))
      .agg(Tables.big(count(lit(1))).as("n"),
           Tables.big(sum("o_orderkey")).as("key_sig"),
           Tables.dsum(col("o_totalprice")).as("total"))
      .orderBy("batch").collect().toSeq
    // the deflate stream must equal the UNCOMPRESSED batch declaration
    val declared = SparkEntry.queries("stream_avro_tail")(spark, sf001)
      .collect().toSeq
    assert(streamed == declared,
      s"deflate stream != batch: ${streamed.diff(declared).take(2)}")
    // and the staged containers are genuinely compressed (smaller than
    // their uncompressed twins)
    val rawDir = Streams.stageAvroTail(spark, sf001)
    def dirBytes(d: String): Long =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".avro"))
        .map(_.length).sum
    assert(dirBytes(src) < dirBytes(rawDir),
      s"deflate ${dirBytes(src)} !< raw ${dirBytes(rawDir)}")
  }
}
