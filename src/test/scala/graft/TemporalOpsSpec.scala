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

  test("asofJoin tieBreak picks the max tie-break row at equal right time") {
    val dupRight = Seq(
      (Some(100L), t("2024-01-01 10:00:00"), 12L),
      (Some(100L), t("2024-01-01 10:00:00"), 15L), // same (key, time): tie
      (Some(100L), t("2024-01-01 10:00:00"), 14L),
      (Some(100L), t("2024-01-01 09:00:00"), 99L)  // earlier time never wins
    ).toDF("k", "rt", "order_id")
    val got = TemporalOps.asofJoin(left, "user_id", "ts",
        dupRight, "k", "rt", Seq("order_id"), tieBreak = Seq("order_id"))
      .select("event_id", "order_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L) === Some(15L)) // max order_id among the 10:00 ties
    assert(got(2L) === Some(15L))
    assert(got(4L) === None)
  }

  test("asofJoin rejects a tieBreak column that is not in the payload") {
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(left, "user_id", "ts",
        right, "k", "rt", Seq("order_id"), tieBreak = Seq("rt"))
    }
  }

  test("rangeJoin broadcastIntervals plans a broadcast hash join") {
    val points = Seq((1L, t("2024-01-01 10:00:00"))).toDF("pid", "ts")
    val intervals = Seq((10L, t("2024-01-01 09:00:00"), t("2024-01-01 11:00:00")))
      .toDF("iid", "lo", "hi")
    val df = TemporalOps.rangeJoin(points, "ts", intervals, "lo", "hi",
      broadcastIntervals = true)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"interval side should broadcast:\n$p")
  }

  test("asofJoin preserves every left row and column") {
    val out = TemporalOps.asofJoin(left, "user_id", "ts",
      right, "k", "rt", Seq("order_id", "rt"))
    assert(out.count() === 4)
    assert(out.columns.toSeq === Seq("event_id", "user_id", "ts", "order_id", "rt"))
  }

  test("rangeJoin matches inclusive bounds across bucket boundaries") {
    val points = Seq(
      (1L, t("2024-01-01 10:00:00")), // == lo of A: inclusive
      (2L, t("2024-01-01 11:30:00")), // inside A, crosses an hour bucket
      (3L, t("2024-01-01 12:00:00")), // == hi of A: inclusive
      (4L, t("2024-01-01 12:00:01")), // just past hi
      (5L, t("2024-01-01 03:00:00"))  // matches nothing
    ).toDF("pid", "ts")
    val intervals = Seq(
      ("A", t("2024-01-01 10:00:00"), t("2024-01-01 12:00:00")),
      ("B", t("2024-01-01 11:00:00"), t("2024-01-01 11:59:59"))
    ).toDF("iid", "lo", "hi")
    val got = TemporalOps.rangeJoin(points, "ts", intervals, "lo", "hi")
      .select("pid", "iid").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "A"), (2L, "A"), (3L, "A"), (2L, "B")))
  }

  test("rangeJoin emits each matching pair exactly once (no bucket dups)") {
    // interval spans 3 hourly buckets; the midpoint point must appear once
    val points = Seq((1L, t("2024-01-01 11:00:00"))).toDF("pid", "ts")
    val intervals = Seq(("A", t("2024-01-01 10:30:00"), t("2024-01-01 12:30:00")))
      .toDF("iid", "lo", "hi")
    assert(TemporalOps.rangeJoin(points, "ts", intervals, "lo", "hi").count() === 1)
  }

  // deterministic pseudo-random stream (no RNG: reproducible failures)
  private def mix(i: Long, salt: Long): Long =
    math.abs(i * 6364136223846793005L + salt * 1442695040888963407L) % 100000L

  test("asofJoin matches a naive per-row reference on pseudo-random data") {
    val base = 86400000L
    // keys 1..5, minute-grained times with deliberate collisions
    val leftRows = (1L to 200L).map(i =>
      (i, mix(i, 1) % 5 + 1, new Timestamp(base + (mix(i, 2) % 500) * 60000L)))
    // unique per (key, time): keep max payload id — the operator's
    // documented pre-aggregation contract
    val rightRows = (1L to 150L)
      .map(i => ((mix(i, 3) % 6 + 1, new Timestamp(base + (mix(i, 4) % 500) * 60000L)), i))
      .groupBy(_._1).map { case ((k, t), vs) => (k, t, vs.map(_._2).max) }.toSeq
    val left = leftRows.toDF("event_id", "user_id", "ts")
    val right = rightRows.toDF("k", "rt", "order_id")
    val got = TemporalOps.asofJoin(left, "user_id", "ts", right, "k", "rt", Seq("order_id"))
      .select("event_id", "order_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    leftRows.foreach { case (id, key, lt) =>
      val candidates = rightRows.filter { case (k, rt, _) =>
        k == key && !rt.after(lt)
      }
      val expected =
        if (candidates.isEmpty) -1L
        else candidates.maxBy { case (_, rt, _) => rt.getTime }._3
      assert(got(id) === expected, s"left row $id key $key at $lt")
    }
  }

  test("rangeJoin matches a naive double loop, including sub-second edges") {
    val base = 86400000L
    // half-second offsets stress the second-truncated bucket math
    val points = (1L to 300L).map(i =>
      (i, new Timestamp(base + (mix(i, 5) % 20000) * 500L)))
    val intervals = (1L to 50L).map { i =>
      val lo = base + (mix(i, 6) % 18000) * 500L
      (s"i$i", new Timestamp(lo), new Timestamp(lo + (mix(i, 7) % 40000) * 500L))
    }
    val got = TemporalOps.rangeJoin(points.toDF("pid", "ts"),
        "ts", intervals.toDF("iid", "lo", "hi"), "lo", "hi", bucketSeconds = 601L)
      .select("pid", "iid").as[(Long, String)].collect().toSet
    val expected = (for {
      (pid, t) <- points
      (iid, lo, hi) <- intervals
      if !t.before(lo) && !t.after(hi)
    } yield (pid, iid)).toSet
    assert(got === expected)
  }

  test("asofJoin rejects payload/left column collisions") {
    intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(left, "user_id", "ts",
        right.withColumnRenamed("order_id", "event_id"), "k", "rt", Seq("event_id"))
    }
  }
}
