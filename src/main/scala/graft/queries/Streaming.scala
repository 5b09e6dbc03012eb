package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, QueryDef, Tables}
import graft.streaming.StreamOps

/** Batch-mode oracle coverage for the streaming transforms: the SAME
  * function used by `readStream` pipelines (StreamingSpec) runs here
  * on the batch events table — Catalyst eliminates the watermark on
  * non-streaming plans, so one implementation serves both modes.
  */
object Streaming {

  def queries: Seq[QueryDef] = Seq(

    Q.df("q93_stream_hourly",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr,
        |  event_type, count(*) AS n,
        |  cast(sum(cast(value AS decimal(30,10))) AS double) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin) { (s, dir) =>
      StreamOps.hourlyEventCounts(Tables.t(s, dir, "events"))
        .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hr"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hr", "event_type")
    },

    // stream-static broadcast enrichment: events joined to the
    // customer→nation dim, counted per (hour, nation)
    Q.df("q94_stream_enriched",
      """SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS hr,
        |  n.n_name, count(*) AS n
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1, 2 ORDER BY hr, n_name""".stripMargin) { (s, dir) =>
      val dim = Tables.t(s, dir, "customer")
        .join(Tables.t(s, dir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      StreamOps.enrichedHourlyByDim(
        Tables.t(s, dir, "events"), dim, "user_id", "c_custkey", "n_name")
        .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hr"),
          col("n_name"), col("n"))
        .orderBy("hr", "n_name")
    },

    // stream-stream attribution join (batch twin): purchases within
    // one hour after a view by the same user
    Q.df("q95_stream_attribution",
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        | AND v.event_type = 'view' AND p.event_type = 'purchase'
        | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
        |ORDER BY view_id, purchase_id""".stripMargin) { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      StreamOps.attributionJoin(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"))
        .orderBy("view_id", "purchase_id")
    })
}
