package graft

import graft.streaming.Streams
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The REAL streaming dead-letter lane: [[Streams.quarantineStep]]
  * driven by an actual Structured Streaming query — text file source,
  * maxFilesPerTrigger = 1 (one micro-batch per staged chunk),
  * Trigger.AvailableNow, checkpointed — then a REPLAYED batch:
  * re-running the step for an already-committed batchId must leave
  * both sinks byte-for-byte unchanged (the batch_id-partitioned
  * dynamic overwrite is the idempotence mechanism, exactly the
  * incrementalDedupStep discipline). Membership must equal the
  * planted truth: every malformed line in the quarantine sink with
  * its raw payload intact, every clean line parsed in the clean sink,
  * each attributed to the micro-batch that carried it. */
class StreamQuarantineSpec extends SparkSpec {

  private val Ddl = "k BIGINT, v STRING"

  /** Three staged chunks with strictly increasing mtimes; chunk i
    * carries one malformed line (distinct corruption shapes) among
    * clean ones. */
  private def stageChunks(watched: Path): Seq[(Seq[String], Seq[String])] = {
    val chunks = Seq(
      (Seq("""{"k": 1, "v": "a"}""", """{"k": 2, "v": "b"}"""),
       Seq("""{"k": 3, "v": """)),
      (Seq("""{"k": 4, "v": "d"}"""),
       Seq("""garbage line""")),
      (Seq("""{"k": 6, "v": "f"}""", """{"k": 7, "v": "g"}"""),
       Seq("""[8, 9]""")))
    chunks.zipWithIndex.foreach { case ((clean, bad), i) =>
      val f = watched.resolve(f"chunk$i%d.json")
      Files.write(f, (clean ++ bad).mkString("\n").getBytes("UTF-8"))
      f.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    chunks
  }

  test("file-source quarantine stream routes per batch; a replayed batch is idempotent") {
    val root = Files.createTempDirectory("graft_squarantine")
    val watched = Files.createDirectory(root.resolve("watched"))
    val ckpt = root.resolve("ckpt").toString
    val cleanSink = root.resolve("clean").toString
    val qSink = root.resolve("quarantine").toString
    val chunks = stageChunks(watched)

    val q = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(watched.toString)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(Streams.quarantineStep(spark, Ddl, cleanSink, qSink) _)
      .start()
    q.awaitTermination()

    def sinkState(path: String): Array[org.apache.spark.sql.Row] =
      spark.read.parquet(path).collect().sortBy(_.toString)
    val qRows = spark.read.parquet(qSink)
      .select("batch_id", "value").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    // file mtime order → chunk i IS batch i; every malformed payload
    // lands raw, attributed to its batch
    val expectedBad = chunks.zipWithIndex
      .flatMap { case ((_, bad), i) => bad.map(b => (i, b)) }.toSet
    assert(qRows == expectedBad, s"dead letters: $qRows")
    val cleanRows = spark.read.parquet(cleanSink)
      .select("batch_id", "k", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    val expectedClean = Set((0, 1L, "a"), (0, 2L, "b"), (1, 4L, "d"),
                            (2, 6L, "f"), (2, 7L, "g"))
    assert(cleanRows == expectedClean, s"clean lane: $cleanRows")

    // replay batch 0 (crash-window semantics: the step re-runs under
    // the same batchId) — both sinks must not change
    val preQ = sinkState(qSink).mkString("|")
    val preClean = sinkState(cleanSink).mkString("|")
    val batch0 = spark.read.text(watched.resolve("chunk0.json").toString)
    Streams.quarantineStep(spark, Ddl, cleanSink, qSink)(batch0, 0L)
    assert(sinkState(qSink).mkString("|") == preQ, "replay changed the quarantine sink")
    assert(sinkState(cleanSink).mkString("|") == preClean, "replay changed the clean sink")
  }
}
