package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Freshness/volume SLA monitor (dq_freshness): the oracle replays the
  * fixture; these plant a stale lane and a volume-dropped lane. */
class DqFreshnessSpec extends SparkSpec {
  import spark.implicits._

  test("a lane past the SLA flags stale; a fresh-but-quiet lane keeps its volume signal") {
    // corpus head at t=100000s. 'live' events every minute over the
    // last hour (fresh, n_last_hour = 60); 'stale' lane last seen 2h
    // behind (minutes_behind = 120 > 60 → not fresh); 'quiet' lane
    // fresh on ONE straggler but silent for the rest of the hour.
    val head = 100000L * 60
    val live = (0 until 60).map(i => ("live", head - i * 60L))
    val stale = Seq(("stale", head - 7200L), ("stale", head - 7260L))
    val quiet = Seq(("quiet", head - 30L)) ++
      (0 until 59).map(i => ("quiet", head - 3601L - i * 60L))
    val ev = (live ++ stale ++ quiet).toDF("event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = Relational.freshnessOf(ev).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getBoolean(4), r.getLong(5))).toMap
    assert(out("live") == ((0L, true, 60L)))
    assert(out("stale")._1 == 120L && !out("stale")._2)
    // fresh by lag, but only the straggler arrived in the last hour —
    // the volume column is what catches it
    assert(out("quiet")._2 && out("quiet")._3 == 1L,
      s"quiet lane: ${out("quiet")}")
  }

  test("fixture query: five lanes, lags non-negative, volume positive") {
    val out = SparkEntry.queries("dq_freshness")(spark, sf001).collect()
    assert(out.length == 5)
    assert(out.exists(_.getLong(3) == 0L)) // some lane IS the head
    out.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getDouble(6) > 0.0)
    }
  }
}
