package graft

import java.sql.Timestamp
import graft.operators.TemporalOps

/** As-of join semantics: greatest right time <= left time per key,
  * equal-time inclusion, missing-match NULL payload, NULL-key rules.
  */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def left = Seq(
    (1L, Some(100L), t("2024-01-01 10:00:00")),
    (2L, Some(100L), t("2024-01-01 12:00:00")),
    (3L, Some(200L), t("2024-01-01 09:00:00")), // before any right row
    (4L, Option.empty[Long], t("2024-01-01 10:00:00")) // NULL key
  ).toDF("event_id", "user_id", "ts")

  private def right = Seq(
    (Some(100L), t("2024-01-01 09:30:00"), 11L),
    (Some(100L), t("2024-01-01 10:00:00"), 12L), // equal-time: matches >= at 10:00
    (Some(100L), t("2024-01-01 11:00:00"), 13L),
    (Some(200L), t("2024-01-01 23:00:00"), 21L),
    (Option.empty[Long], t("2024-01-01 00:00:00"), 99L) // NULL key: never matches
  ).toDF("k", "rt", "order_id")

  test("asofJoin picks the greatest right time <= left time, per key") {
    val got = TemporalOps.asofJoin(left, "user_id", "ts",
        right, "k", "rt", Seq("order_id"))
      .select("event_id", "order_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L) === Some(12L)) // equal time included
    assert(got(2L) === Some(13L)) // latest of three
    assert(got(3L) === None)      // key 200's only order is later
    assert(got(4L) === None)      // NULL key never matches (not even the NULL right row)
  }

  test("asofJoin preserves every left row and column") {
    val out = TemporalOps.asofJoin(left, "user_id", "ts",
      right, "k", "rt", Seq("order_id", "rt"))
    assert(out.count() === 4)
    assert(out.columns.toSeq === Seq("event_id", "user_id", "ts", "order_id", "rt"))
  }

  test("asofJoin rejects payload/left column collisions") {
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(left, "user_id", "ts",
        right.withColumnRenamed("order_id", "event_id"), "k", "rt", Seq("event_id"))
    }
  }
}
