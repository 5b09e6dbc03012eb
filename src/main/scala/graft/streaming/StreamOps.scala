package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators for the event/document pipelines
  * (SURVEY §0: no counterpart in the reference — this is the
  * LLM-pipeline extension's streaming path; the reference's closest
  * construct is the forward-only cursor).
  *
  * Every transform is expressed on the unified Dataset API, so the
  * SAME function runs in batch (watermarks are eliminated by Catalyst
  * on non-streaming plans — used by the DuckDB-oracle queries) and in
  * `readStream` mode (used by StreamingSpec through MemoryStream).
  *
  * Scale notes (100 TB/day streams):
  *  - all aggregations are keyed by (window, type) or user_id, so
  *    state is hash-partitioned across executors and bounded by the
  *    watermark horizon — no unbounded state;
  *  - dedup state holds only the content digest within the watermark,
  *    never the document body;
  *  - sessionization state is one fixed-width struct per active user.
  */
object StreamOps {

  /** Hourly windowed event metrics with a late-data watermark:
    * the streaming analogue of the q20 hourly rollup. In append mode a
    * window finalizes (emits) once the watermark passes its end.
    */
  def hourlyEventCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,10)")).cast("double").as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Stream-static enrichment: join the event stream against a static
    * dimension and aggregate per (window, dim value). Stream-static
    * joins carry NO streaming state — the dim side is broadcast to
    * every executor once per micro-batch plan, and each batch joins
    * map-side; only the windowed agg keeps (bounded, watermarked)
    * state. At 100 TB/day this is the canonical enrichment shape: the
    * dim must stay broadcast-sized (dims beyond that become a
    * stream-stream join or a state-store lookup, different operator).
    */
  def enrichedHourlyByDim(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String, dimVal: String,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim), col(eventKey) === col(dimKey))
      .groupBy(window(col("ts"), "1 hour").as("w"), col(dimVal))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour_start"), col(dimVal), col("n"))

  /** Stream-stream attribution join: (view, purchase) pairs of the
    * same user where the purchase lands within `window` AFTER the
    * view. Both inputs carry watermarks and the join condition carries
    * the time-range bound — that is what makes streaming state FINITE:
    * a buffered view is evicted once the watermark passes
    * view_ts + window, a purchase once it passes its own timestamp; an
    * unconstrained stream-stream equi-join would buffer both streams
    * forever. State is hash-partitioned by user, so it scales out with
    * executors like every other keyed operator here.
    *
    * Inputs are event-shaped (event_id, user_id, ts); in batch mode
    * the watermarks are eliminated and this is a plain self-join —
    * which is how the DuckDB oracle (q95) verifies it.
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      window: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val v = views.select(col("event_id").as("view_id"),
        col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    v.join(p, expr(
        s"v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval $window"))
      .select(col("view_id"), col("purchase_id"))
  }

  /** Streaming exact dedup: keep the first document per content digest
    * within the watermark horizon. State stores only (digest) — the
    * bounded-state streaming analogue of DedupOps.dedupKeepFirst.
    */
  def streamingDedup(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text", watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  // ---- streaming MinHash near-dup candidate feed -----------------------

  final case class BandRec(doc_id: Long, band: Int, band_hash: Long)
  final case class NearDupCand(doc_id: Long, band: Int, band_hash: Long)

  /** Streaming MinHash near-dup CANDIDATE feed — the production
    * "daily crawl vs accumulated index" shape as a continuous query:
    * incoming documents hash to banded MinHash buckets map-side (the
    * q45 portable signature — streams untouched, no shuffle before
    * the keyed state), and per bucket the MINIMUM doc_id is the
    * retained representative held in [[GroupState]]; every other
    * document in the bucket emits one candidate row, INCLUDING a
    * previously-retained representative the moment a smaller id
    * displaces it. The emitted SET is therefore an arrival-order /
    * batch-boundary INVARIANT: exactly {(d, band, hash) : d ≠
    * min(bucket)} — which is what makes the operator batch-oracle
    * verifiable (q149 runs the same code in batch mode) and re-run
    * idempotent at the set level.
    *
    * Scale: state is ONE long per distinct non-empty bucket — the
    * classic streaming-LSH footprint; a production deployment bounds
    * it with a state TTL (timeout) at the cost of cross-epoch recall,
    * exactly the batch skew cap's trade. Downstream verification
    * (shingle Jaccard on candidate pairs) composes as a stream-static
    * join against the retained index.
    */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, k: Int = 8,
      bands: Int = 4): Dataset[NearDupCand] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = graft.operators.DedupOps
      .portableSignatureRows(docs, idCol, textCol, shingleWords, k)
    graft.operators.DedupOps.portableBandRecordsRaw(base, bands)
      .as[BandRec]
      .groupByKey(r => (r.band, r.band_hash))
      .flatMapGroupsWithState[Long, NearDupCand](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, hash), rows, state: GroupState[Long]) =>
          val ids = rows.map(_.doc_id).toVector.distinct
          val prior = state.getOption
          val mn = (ids ++ prior).min
          state.update(mn)
          val emit = prior match {
            case Some(p) if p == mn => ids.filter(_ != mn)
            case Some(p) => (ids :+ p).distinct.filter(_ != mn)
            case None => ids.filter(_ != mn)
          }
          emit.map(d => NearDupCand(d, band, hash)).iterator
      }
  }

  final case class ConfirmedPair(doc_id: Long, index_id: Long, jaccard: Double)

  /** Stage 2 of the streaming near-dup pipeline (r17, completes q149):
    * incoming docs sign and band MAP-SIDE (shingles ride along), join
    * a STATIC signature index — the retained representatives, or a
    * decontamination corpus written by
    * [[graft.operators.DedupOps.writeSignatureIndex]] — on the band
    * buckets, and CONFIRM with exact shingle Jaccard ≥ `minJaccard`.
    *
    * State model: the stream-static join itself carries NO streaming
    * state (the index side re-plans per micro-batch, broadcast when
    * small); the only state is one boolean per emitted (doc, index)
    * pair — the same emit-once contract as [[nearDupCandidates]], so
    * the confirmed SET is provably batch- and arrival-order-invariant
    * (StreamingSpec drives multiple batchings; q150 is the batch-twin
    * oracle). Production bounds the pair state with a TTL; the index
    * side caps its skewed buckets (`maxBucket`) exactly like the
    * batch path — the stream side needs no cap because each incoming
    * doc probes at most `bands` buckets. */
  def confirmedNearDups(docs: DataFrame, index: DataFrame, idCol: String,
      textCol: String, minJaccard: Double = 0.25, shingleWords: Int = 3,
      k: Int = 8, bands: Int = 4, maxBucket: Int = 64): Dataset[ConfirmedPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nBase = graft.operators.DedupOps
      .portableSignatureRows(docs, idCol, textCol, shingleWords, k)
    // band-explode with the shingles riding along (NOT a join back to
    // nBase — that would be a stream-stream self-join with unbounded
    // state; this stays one map-side projection)
    val M = 1000000007L
    val nRecs = nBase.select(col("doc_id"), col("sh"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            (element_at(col("sig"), b * 2 + 1) * M +
              element_at(col("sig"), b * 2 + 2)).as("band_hash")))).as("r"))
      .select(col("doc_id"), col("sh"),
        col("r.band").as("band"), col("r.band_hash").as("band_hash"))
    val iRecs = graft.operators.DedupOps
      .portableBandRecords(index.select(col("doc_id"), col("sig")),
        bands, maxBucket)
      .withColumnRenamed("doc_id", "index_id")
      .join(index.select(col("doc_id").as("index_id"), col("sh").as("sh_i")),
        "index_id")
    nRecs.join(iRecs, Seq("band", "band_hash"))
      .select(col("doc_id"), col("index_id"),
        (size(array_intersect(col("sh"), col("sh_i"))).cast("double") /
          size(array_union(col("sh"), col("sh_i"))).cast("double")).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
      .as[ConfirmedPair]
      .groupByKey(p => (p.doc_id, p.index_id))
      .flatMapGroupsWithState[Boolean, ConfirmedPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((doc, idx), rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty // pair already confirmed
          else {
            state.update(true)
            // same pair ⇒ same shingles ⇒ same jaccard in every band
            Iterator.single(rows.next())
          }
      }
  }

  // ---- gap-based sessionization (flatMapGroupsWithState) ---------------

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, sum_value: Double)

  /** Per-user session assembly with an inactivity gap: a session
    * closes when no event arrives for `gapMs` of EVENT time (enforced
    * via event-time timeout against the watermark). Custom state via
    * flatMapGroupsWithState — the KeyValueGroupedDataset path the
    * builder brief calls out.
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the gap deadline: close the session
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.sum))
          } else {
            val events = it.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            events.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
                case Some(s) => // gap exceeded within the batch
                  closed ::= SessionOut(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when the watermark passes last-event + gap
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
