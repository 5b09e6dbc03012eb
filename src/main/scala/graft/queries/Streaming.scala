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
    })
}
