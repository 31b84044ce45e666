package graft.timeseries

import graft.SparkSpec

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, uid: Long, t: String, v: Double) =
    (id, java.sql.Timestamp.valueOf(t), uid, v)

  test("resampleHourlyFfill: grid, latest-in-hour pick, gap fill") {
    val events = Seq(
      // hour 10: two events — later ts wins
      ev(1, 7, "2024-01-01 10:05:00", 1.0),
      ev(2, 7, "2024-01-01 10:40:00", 2.0),
      // hour 11: silent (gap, carries 2.0)
      // hour 12: tie on ts — higher event_id wins
      ev(3, 7, "2024-01-01 12:00:00", 3.0),
      ev(4, 7, "2024-01-01 12:00:00", 4.0),
      // second user, single hour: no gaps
      ev(5, 9, "2024-01-01 00:59:00", 9.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = TimeSeriesOps.resampleHourlyFfill(events)
      .as[(Long, java.sql.Timestamp, Double, Boolean)].collect()
      .map(r => (r._1, r._2.toString, r._3, r._4)).toSet
    assert(got == Set(
      (7L, "2024-01-01 10:00:00.0", 2.0, false),
      (7L, "2024-01-01 11:00:00.0", 2.0, true),
      (7L, "2024-01-01 12:00:00.0", 4.0, false),
      (9L, "2024-01-01 00:00:00.0", 9.0, false)))
  }
}
