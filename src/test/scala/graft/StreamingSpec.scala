package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Structured Streaming semantics through MemoryStream: watermarked
  * window finalization, within-watermark dedup, and gap sessionization
  * via flatMapGroupsWithState event-time timeouts.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private def startQuery(df: org.apache.spark.sql.DataFrame, table: String): StreamingQuery =
    df.writeStream.format("memory").queryName(table).outputMode("append").start()

  test("hourlyEventCounts finalizes a window once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = startQuery(
      StreamOps.hourlyEventCounts(input.toDF(), watermark = "30 minutes"),
      "hourly_out")
    try {
      input.addData(
        Event(1, ts(0), "view", 1.0),
        Event(2, ts(10), "view", 2.0),
        Event(3, ts(20), "click", 4.0))
      q.processAllAvailable()
      // nothing final yet: watermark has not passed the 10:00 window end
      assert(spark.table("hourly_out").count() === 0)
      // event 100 min later pushes the watermark past 11:00
      input.addData(Event(4, ts(120), "view", 8.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .select("event_type", "n", "sum_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows === Set(("view", 2L, 3.0), ("click", 1L, 4.0)))
    } finally q.stop()
  }

  test("enrichedHourlyByDim joins stream to broadcast dim, window finalizes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val dim = Seq((1L, "ALPHA"), (2L, "BETA")).toDF("c_custkey", "n_name")
    val df = StreamOps.enrichedHourlyByDim(input.toDF(), dim,
      "user_id", "c_custkey", "n_name", watermark = "30 minutes")
    val q = startQuery(df, "enriched_out")
    try {
      input.addData(
        Event(1, ts(0), "view", 1.0),  // dim ALPHA
        Event(1, ts(10), "view", 1.0), // dim ALPHA
        Event(2, ts(20), "click", 1.0), // dim BETA
        Event(9, ts(25), "view", 1.0)) // no dim row: dropped by inner join
      q.processAllAvailable()
      assert(spark.table("enriched_out").count() === 0) // window still open
      input.addData(Event(1, ts(120), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("enriched_out").select("n_name", "n").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows === Set(("ALPHA", 2L), ("BETA", 1L)))
      // (the broadcast-join plan contract is asserted on the batch
      // twin of this operator in PlanSpec "q94")
    } finally q.stop()
  }

  test("attributionJoin pairs views with purchases inside the window, both streaming") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    // Event has no event_id field; derive one from `value`
    def withId(d: org.apache.spark.sql.DataFrame) =
      d.withColumn("event_id", org.apache.spark.sql.functions.col("value").cast("long"))
    val df = StreamOps.attributionJoin(withId(views.toDF()), withId(purchases.toDF()),
      window = "1 hour", watermark = "30 minutes")
    val q = startQuery(df, "attr_out")
    try {
      // Event(user_id, ts, type, value); event ids come from value here
      views.addData(Event(1, ts(0), "view", 100.0))
      purchases.addData(
        Event(1, ts(30), "purchase", 200.0),  // same user, inside window
        Event(1, ts(150), "purchase", 201.0), // same user, outside window
        Event(2, ts(10), "purchase", 202.0))  // other user
      q.processAllAvailable()
      val got = spark.table("attr_out").count()
      assert(got === 1L) // only the in-window same-user purchase matches
    } finally q.stop()
  }

  test("streamingDedup keeps the first doc per digest within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = startQuery(StreamOps.streamingDedup(docs), "dedup_out")
    try {
      input.addData((1L, ts(0), "same text"), (2L, ts(1), "same text"),
        (3L, ts(2), "other text"))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted
      assert(kept === Array(1L, 3L))
    } finally q.stop()
  }

  test("nearDupCandidates: bucket state keeps min doc, displaced rep emits, set is batch-invariant") {
    implicit val sqlCtx = spark.sqlContext
    def run(batches: Seq[Seq[(Long, String)]]): Set[(Long, Int, Long)] = {
      val input = MemoryStream[(Long, String)]
      val docs = input.toDF().toDF("doc_id", "text")
      val name = s"ndc_out_${batches.hashCode.abs}"
      val q = StreamOps.nearDupCandidates(docs, "doc_id", "text")
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      } finally q.stop()
    }
    // identical 3-shingle docs share every band; the unrelated doc
    // shares none; the SMALLER id arriving LAST displaces the old rep
    val d5 = (5L, "alpha beta gamma delta")
    val d7 = (7L, "alpha beta gamma delta")
    val d2 = (2L, "alpha beta gamma delta")
    val dx = (9L, "wholly unrelated content here")
    val oneBatch = run(Seq(Seq(d5, d7, d2, dx)))
    val split = run(Seq(Seq(d5, dx), Seq(d7), Seq(d2)))
    val reversed = run(Seq(Seq(d2), Seq(d7, dx), Seq(d5)))
    // 4 bands × the two non-minimum ids of the shared buckets
    assert(oneBatch.map(_._1) === Set(5L, 7L))
    assert(oneBatch.size === 8)
    assert(split === oneBatch, "batch boundaries changed the emitted set")
    assert(reversed === oneBatch, "arrival order changed the emitted set")
  }

  test("confirmedNearDups: stream-static verify emits each pair once, batch-invariant (r17)") {
    implicit val sqlCtx = spark.sqlContext
    // static representative index: two retained docs
    val index = graft.operators.DedupOps.portableSignatureRows(
      Seq((100L, "alpha beta gamma delta"), (200L, "totally different words entirely"))
        .toDF("doc_id", "text"),
      "doc_id", "text", 3, 8)
    def run(batches: Seq[Seq[(Long, String)]]): Set[(Long, Long, Double)] = {
      val input = MemoryStream[(Long, String)]
      val docs = input.toDF().toDF("doc_id", "text")
      val name = s"ndv_out_${batches.hashCode.abs}"
      val q = StreamOps.confirmedNearDups(docs, index, "doc_id", "text",
          minJaccard = 0.5)
        .toDF().writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      } finally q.stop()
    }
    val dMatch = (5L, "alpha beta gamma delta")      // exact match of rep 100
    val dNear = (7L, "alpha beta gamma delta extra") // near 100 (shares shingles)
    val dFar = (9L, "wholly unrelated content here") // matches nothing
    val dup = (5L, "alpha beta gamma delta")         // re-arrival of doc 5
    val oneBatch = run(Seq(Seq(dMatch, dNear, dFar)))
    val split = run(Seq(Seq(dNear), Seq(dMatch, dFar)))
    val withDup = run(Seq(Seq(dMatch), Seq(dup, dNear, dFar)))
    assert(oneBatch.map(t => (t._1, t._2)) === Set((5L, 100L), (7L, 100L)))
    assert(oneBatch.forall(_._3 >= 0.5))
    assert(split === oneBatch, "batch boundaries changed the confirmed set")
    assert(withDup === oneBatch, "a re-arriving doc re-emitted its pair")
  }

  test("parquet file sink with checkpoint: the production write path") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = StreamOps.streamingDedup(docs)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), "alpha"), (2L, ts(1), "alpha"), (3L, ts(2), "beta"))
      q.processAllAvailable()
      val kept = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(kept === Array(1L, 3L))
    } finally q.stop()
  }

  test("foreachBatch sink: per-batch dedup-merge, the upsert escape hatch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val q = docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // merge: first doc_id per content digest wins across batches
        batch.select(org.apache.spark.sql.functions.md5(
            org.apache.spark.sql.functions.col("text")).as("fp"),
            org.apache.spark.sql.functions.col("doc_id"))
          .collect().foreach(r => seen.putIfAbsent(r.getString(0), r.getLong(1)))
      }
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), "same")); q.processAllAvailable()
      input.addData((2L, ts(1), "same"), (3L, ts(2), "other")); q.processAllAvailable()
      assert(seen.size() === 2)
      assert(seen.values().contains(1L) && seen.values().contains(3L))
      assert(!seen.values().contains(2L)) // later dup lost the merge
    } finally q.stop()
  }

  test("sessionize closes a session after the event-time gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = startQuery(
      StreamOps.sessionize(input.toDS(), gapMs = 5 * 60 * 1000, watermark = "1 minute").toDF(),
      "session_out")
    try {
      input.addData(
        Event(7, ts(0), "view", 1.0),
        Event(7, ts(2), "click", 2.0),
        Event(7, ts(4), "view", 3.0))
      q.processAllAvailable()
      assert(spark.table("session_out").count() === 0) // still open
      // 30 minutes later: watermark passes last+gap, session times out
      input.addData(Event(8, ts(30), "view", 0.5))
      q.processAllAvailable()
      val s = spark.table("session_out")
        .select("user_id", "n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      assert(s.toSeq === Seq((7L, 3, 6.0)))
    } finally q.stop()
  }

  test("the same hourly transform runs in batch mode (watermark eliminated)") {
    val batch = Seq(
      Event(1, ts(0), "view", 1.0), Event(2, ts(10), "view", 2.0)).toDF()
    val out = StreamOps.hourlyEventCounts(batch)
      .select("event_type", "n", "sum_value").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq(("view", 2L, 3.0)))
  }
}
