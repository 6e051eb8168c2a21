package graft

import graft.streaming.Streams
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The REAL streaming CDC apply: [[Streams.cdcApplyStep]] driven by an
  * actual Structured Streaming query — file source, maxFilesPerTrigger
  * = 1, Trigger.AvailableNow, checkpointed — including a RESTART with
  * a REPLAYED batch (the step's writes land, the checkpoint commit is
  * lost, the restarted stream re-delivers the batch). Exactly-once on
  * the snapshot must hold with NO transaction log, by algebra alone:
  * latest-wins over a total version order absorbs a replayed delta
  * (tombstones retained as soft deletes make the absorption hold even
  * when a delete wins), and dynamic partition overwrite replaces the
  * affected buckets byte-for-byte. The final live view must equal the
  * oracle-checked `stream_cdc_apply` batch declaration under ANY
  * chunking — pinned here with chunks cut across the version order,
  * so later batches carry both newer and older versions of keys
  * already in the snapshot. */
class StreamCdcApplySpec extends SparkSpec {

  /** Orders cut into 3 chunks BY o_orderkey — deliberately not by
    * version order: a customer's orders scatter across chunks, so
    * batches genuinely update, supersede, and tombstone keys merged by
    * earlier batches. */
  private lazy val chunkFiles: Seq[Path] = {
    val stage = Files.createTempDirectory("graft_cdc_chunks")
    val o = Tables.orders(spark, sf001)
    val keys = o.select("o_orderkey").orderBy("o_orderkey")
      .collect().map(_.getLong(0))
    val cuts = Seq(keys(keys.length / 3), keys(2 * keys.length / 3))
    val ranges = Seq((keys.head, cuts(0)), (cuts(0), cuts(1)), (cuts(1), keys.last + 1))
    ranges.zipWithIndex.map { case ((lo, hi), i) =>
      val tmp = Files.createTempDirectory(s"graft_cdc_w$i")
      o.where(col("o_orderkey") >= lo && col("o_orderkey") < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = stage.resolve(f"chunk$i%d.parquet")
      Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
      dst
    }
  }

  private def freshDirs(tag: String): (String, String, String) = {
    val root = Files.createTempDirectory(s"graft_cdc_$tag")
    (root.resolve("watched").toString, root.resolve("ckpt").toString,
     root.resolve("snap").toString)
  }

  private def stage(watched: String, upTo: Int): Unit = {
    val dir = Paths.get(watched)
    Files.createDirectories(dir)
    val t0 = 1700000000000L
    chunkFiles.take(upTo).zipWithIndex.foreach { case (src, i) =>
      val dst = dir.resolve(src.getFileName)
      if (!Files.exists(dst)) Files.copy(src, dst)
      dst.toFile.setLastModified(t0 + i * 60000L)
    }
  }

  private def runStream(watched: String, ckpt: String, snap: String): Unit = {
    val schema = spark.read.parquet(chunkFiles.head.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watched)
      .writeStream
      .foreachBatch(Streams.cdcApplyStep(spark, snap) _)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(120000))
      throw new IllegalStateException("CDC apply stream did not drain in 120s")
  }

  private def checkFinalState(snap: String, hint: String): Unit = {
    val snapDf = spark.read.parquet(snap)
    // snapshot integrity: exactly one surviving change row per key
    // (tombstones included — they are soft deletes, not absences)
    assert(snapDf.count() == snapDf.select("o_custkey").distinct().count(),
      s"$hint: snapshot must hold exactly one row per key")
    // the live view equals the oracle-checked batch declaration
    val live = snapDf.where(col("op") =!= "d")
      .select(col("o_custkey").cast("long"), col("o_orderkey"), col("o_totalprice"))
    val decl = SparkEntry.queries("stream_cdc_apply")(spark, sf001)
    assertSameRows(live, decl, s"$hint vs batch declaration")
  }

  test("straight-through: 3 real micro-batches land the global latest-wins snapshot") {
    val (watched, ckpt, snap) = freshDirs("straight")
    stage(watched, 3)
    runStream(watched, ckpt, snap)
    assert(Files.exists(Paths.get(ckpt, "commits", "2")),
      "stream must actually commit 3 micro-batches")
    checkFinalState(snap, "straight-through")
  }

  test("restart + replayed batch: the merge absorbs the replay, buckets overwritten not appended") {
    val (watched, ckpt, snap) = freshDirs("replay")
    stage(watched, 2)
    runStream(watched, ckpt, snap)
    assert(Files.exists(Paths.get(ckpt, "commits", "1")) &&
           !Files.exists(Paths.get(ckpt, "commits", "2")),
      "run 1 must commit exactly batches 0 and 1")
    // crash window: batch 2's step executes fully but the commit is lost
    stage(watched, 3)
    Streams.cdcApplyStep(spark, snap)(
      spark.read.parquet(chunkFiles(2).toString), 2L)
    val afterCrash = spark.read.parquet(snap).count()
    // restart replays batch 2 against the ALREADY-applied snapshot:
    // latest-wins absorption must make it byte-identical, not doubled
    runStream(watched, ckpt, snap)
    assert(Files.exists(Paths.get(ckpt, "commits", "2")),
      "run 2 must actually process batch 2")
    assert(spark.read.parquet(snap).count() == afterCrash,
      "replay must be absorbed, not appended")
    checkFinalState(snap, "restart+replay")
  }

  test("arrival-order independence: reversed chunk order lands the identical live view") {
    val (watched, ckpt, snap) = freshDirs("reversed")
    val dir = Paths.get(watched)
    Files.createDirectories(dir)
    val t0 = 1700000000000L
    // stage chunks with REVERSED mtimes → file source delivers 2,1,0
    chunkFiles.zipWithIndex.foreach { case (src, i) =>
      val dst = dir.resolve(src.getFileName)
      Files.copy(src, dst)
      dst.toFile.setLastModified(t0 + (chunkFiles.size - i) * 60000L)
    }
    runStream(watched, ckpt, snap)
    checkFinalState(snap, "reversed arrival")
  }
}
