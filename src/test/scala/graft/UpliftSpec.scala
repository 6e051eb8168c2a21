package graft

import graft.operators.Aggregations
import org.apache.spark.sql.functions._

/** Uplift bands + Qini (events_uplift_qini): the oracle replays the
  * fixture; these plant cohorts with hand-computable band uplifts and
  * walk the cumulative Qini chain by hand. */
class UpliftSpec extends SparkSpec {
  import spark.implicits._

  // users 0-3: 8 pre events (band 1); users 4-9: 16 pre events
  // (band 2). Every user logs ONE post purchase: treated (odd) worth
  // 2·band dollars, control worth 1·band — so per-band uplift = band.
  private def planted() = {
    val pre = (0L to 9L).flatMap { u =>
      val n = if (u < 4) 8 else 16
      (0 until n).map(i => (u, "view", 0.0, 1000L + i))
    }
    val post = (0L to 9L).map { u =>
      val band = if (u < 4) 1 else 2
      val v = if (u % 2 == 1) 2.0 * band else 1.0 * band
      (u, "purchase", v, 3000L)
    }
    (pre ++ post).toDF("user_id", "event_type", "value", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
  }

  test("hand-computed band uplifts and the cumulative Qini walk") {
    val out = Aggregations.upliftQini(planted()).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 1L)) // band desc
    val top = out(0)
    // band 2: treated {5,7,9} mean 4.00, control {4,6,8} mean 2.00
    assert(top.getLong(1) == 3L && top.getLong(2) == 3L)
    assert(top.getDouble(3) == 4.0 && top.getDouble(4) == 2.0)
    assert(top.getDouble(5) == 2.0)
    // Qini(band≥2) = (1200 − 600·3/3)/100 = 6.0
    assert(top.getDouble(6) == 6.0, s"qini=${top.getDouble(6)}")
    val lo = out(1)
    assert(lo.getDouble(5) == 1.0)
    // Qini(all) = (1600 − 800·5/5)/100 = 8.0
    assert(lo.getDouble(6) == 8.0, s"qini=${lo.getDouble(6)}")
  }

  test("an empty arm NULLs its ratios instead of dividing by zero") {
    // only treated users: control columns must be NULL, not Inf/NaN
    val ev = Seq((1L, "purchase", 2.0, 3000L), (1L, "view", 0.0, 1000L),
                 (3L, "purchase", 2.0, 3000L), (3L, "view", 0.0, 1000L))
      .toDF("user_id", "event_type", "value", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Aggregations.upliftQini(ev).collect()
    out.foreach { r =>
      assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
      assert(!r.isNullAt(3))
    }
  }

  test("fixture query: bands cover both arms and Qini is finite") {
    val out = SparkEntry.queries("events_uplift_qini")(spark, sf001).collect()
    assert(out.nonEmpty)
    val bands = out.map(_.getLong(0))
    assert(bands.toSeq == bands.sorted.reverse.toSeq)
    assert(bands.forall(b => b >= 0 && b <= 6))
  }
}
