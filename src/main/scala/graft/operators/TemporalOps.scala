package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal (as-of) join — an operator Spark has no native form of
  * (DuckDB: `ASOF JOIN`; also kdb's `aj`, Flink's temporal join). For
  * each left row, attach the single right row with the greatest
  * rightTime <= leftTime within the same key.
  *
  * Built by COMPOSING existing operators (the preference order for
  * custom semantics — no custom physical plan needed here): tag and
  * union both inputs, run ONE window over (key ORDER BY time) that
  * forward-fills the latest right payload, keep the left rows. Cost is
  * a single hash shuffle of both inputs on the key plus a
  * within-partition sort — exactly what a sort-merge join would pay —
  * with no range-condition row explosion (a naive `l.key = r.key AND
  * l.t >= r.t` join materializes every earlier right row per left row
  * before aggregating them back down).
  *
  * Scale notes (100 TB):
  *  - state per window partition is one payload struct (last seen),
  *    so memory is O(1) per key regardless of row count;
  *  - a pathologically hot key serializes its own partition (window
  *    partitions cannot be split by AQE). The scale path is
  *    time-bucketing: window over (key, month) with a per-bucket
  *    boundary carry — same shape, two passes;
  *  - right rows are dropped after the fill, so only the left side's
  *    row count survives the shuffle.
  *
  * Preconditions (enforced by construction or documented):
  *  - right must be unique per (key, time), OR `tieBreak` names
  *    payload columns whose ascending order picks the winner (last
  *    wins — `Seq("id")` keeps the max-id row at equal time). With
  *    neither, the equal-time winner is unspecified (SQL engines
  *    leave it unspecified too, so the operator refuses to guess).
  *    Passing `tieBreak` is the scale path: it folds the
  *    deduplication into the window's own sort, where pre-aggregating
  *    costs a SECOND full shuffle of the right side just to remove
  *    ties the window sort already orders;
  *  - NULL right keys never match (filtered, matching SQL equality);
  *    NULL-key left rows get a NULL payload;
  *  - payload column names must not collide with left column names.
  */
object TemporalOps {

  /** As-of join `left` to `right`: every left row + `payload` columns
    * of the latest right row with rightTime <= leftTime, same key
    * (NULL payload when no such row — LEFT OUTER as-of semantics).
    */
  def asofJoin(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"payload collides with left columns: $collisions")
    require(tieBreak.forall(payload.contains),
      s"tieBreak columns must be payload columns: $tieBreak")

    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(payload.map(col): _*)
    val rType = StructType(payload.map(p => right.schema(p)))
    val lType = StructType(left.schema.fields)

    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__left"), lStruct.as("__lrow"),
      lit(null).cast(rType).as("__rrow"))
    // NULL right keys can never equality-match a left key
    val r = right.filter(col(rightKey).isNotNull).select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__left"), lit(null).cast(lType).as("__lrow"),
      rStruct.as("__rrow"))

    // right rows order BEFORE left rows at equal time (0 < 1), so a
    // right row at exactly leftTime matches the >= contract; the
    // tie-break keys order right rows among themselves (ascending,
    // last wins) and are constant-null on left rows, so they never
    // reorder a left row relative to the rights it must see
    val orderKeys = col("__t") +: col("__left") +:
      tieBreak.map(c => col(s"__rrow.$c"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Explicit-width hash exchange on the window key: the window's own
    // ENSURE_REQUIREMENTS exchange is subject to AQE's 1 MiB
    // coalescing floor, which serialized the fill to ~5 tasks on the
    // local test SF (the union rows are wide: both payload structs
    // ride them). An explicit repartition satisfies the window's
    // clustering requirement — same single shuffle, full width — and
    // hashFanout returns the union untouched when the sources are
    // already core-count wide (production scale).
    graft.Q.hashFanout(l.unionByName(r), "__k")
      .withColumn("__fill", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__left") === 1)
      .select(col("__lrow.*") +: payload.map(p => col(s"__fill.$p").as(p)): _*)
  }

  /** Keyless point-in-interval range join: every (point, interval)
    * pair with lo <= pointTime <= hi — WITHOUT the cartesian product a
    * naive `ON t BETWEEN lo AND hi` theta-join costs in Spark
    * (BroadcastNestedLoopJoin: every point against every interval).
    * DuckDB runs this shape natively via IEJoin; this is the
    * equivalent scale shape for Spark's hash-join machinery.
    *
    * Shape: time is chunked into fixed buckets; each interval explodes
    * into the buckets it covers (fan-out bounded by
    * duration/bucketSeconds + 1), each point maps to exactly ONE
    * bucket, and the equi-join on bucket carries the pair — so a
    * matching pair meets in exactly one bucket and needs no dedup.
    * The exact containment predicate then filters bucket-mates.
    *
    * Scale notes:
    *  - pick bucketSeconds near the median interval length: too small
    *    multiplies interval fan-out, too large multiplies
    *    false bucket-mates the filter must discard;
    *  - work is hash-partitioned by bucket — a hot time window (flash
    *    event) concentrates in its bucket's task; salt the bucket id
    *    with a point-side hash suffix if one wall-clock hour dominates;
    *  - both sides shuffle once, on the bucket id — UNLESS
    *    `broadcastIntervals` is set, which broadcasts the exploded
    *    interval side and leaves the (big) point side entirely
    *    unshuffled. Set it when the intervals are a dimension-sized
    *    set (alert windows, campaign periods, a sampled slice);
    *    Catalyst can't see that through the explode's unknown
    *    cardinality, and AQE's runtime conversion still pays the
    *    point-side shuffle write.
    */
  def rangeJoin(points: DataFrame, ptTime: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketSeconds: Long = 3600L,
      broadcastIntervals: Boolean = false): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must not share column names: $shared")
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "column name __b is reserved by rangeJoin")
    val pb = points.withColumn("__b",
      floor(unix_timestamp(col(ptTime)) / bucketSeconds).cast("long"))
    val exploded = intervals.withColumn("__b", explode(sequence(
      floor(unix_timestamp(col(loCol)) / bucketSeconds).cast("long"),
      floor(unix_timestamp(col(hiCol)) / bucketSeconds).cast("long"))))
    val ib = if (broadcastIntervals) broadcast(exploded) else exploded
    pb.join(ib, Seq("__b"))
      .filter(col(ptTime) >= col(loCol) && col(ptTime) <= col(hiCol))
      .drop("__b")
  }
}
