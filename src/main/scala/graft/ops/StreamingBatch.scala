package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.io.Tables.t
import graft.util.Det._

/** SURVEY.md §2.9 (oracle-able rows) — event-time windows in batch
  * mode. The same `window()`/`session_window()` expressions run
  * unchanged under `readStream` (see `graft.stream.Streams`); batch
  * mode pins their semantics against DuckDB. Tumbling/sliding windows
  * are stateless bucket assignments (scale = plain hash agg); session
  * windows need a per-key sort, sharded by user_id.
  */
object StreamingBatch extends QueryPack {

  /** 5-minute tumbling windows: count + exact value sum per type. */
  def streamTumble(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sumMoney($"value").as("val_sum"))
      .select($"window.start".as("w_start"), $"event_type", $"n", $"val_sum")
      .orderBy($"w_start", $"event_type")
  }

  /** 10-minute windows sliding by 5: each event lands in 2 windows. */
  def streamSlide(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(window($"ts", "10 minutes", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sumMoney($"value").as("val_sum"))
      .select($"window.start".as("w_start"), $"event_type", $"n", $"val_sum")
      .orderBy($"w_start", $"event_type")
  }

  /** Per-user session windows, 30-minute inactivity gap. */
  def streamSession(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"), sumMoney($"value").as("val_sum"))
      .select($"user_id", $"session_window.start".as("sess_start"),
              $"n", $"val_sum")
      .orderBy($"user_id", $"sess_start")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumble" -> (streamTumble _),
    "stream_slide" -> (streamSlide _),
    "stream_session" -> (streamSession _))

  def oracle: Map[String, String] = Map(
    "stream_tumble" ->
      s"""SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, event_type,
        |  count(*) AS n, ${sqlSumMoney("value")} AS val_sum
        |FROM events GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,
    "stream_slide" ->
      s"""WITH shifted AS (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) - k.k * INTERVAL '5 minutes' AS w_start,
        |         event_type, value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k)
        |SELECT w_start, event_type, count(*) AS n, ${sqlSumMoney("value")} AS val_sum
        |FROM shifted GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,
    // Gaps-and-islands replica of Spark's session merge: an event lands
    // in the open session while ts <= last+gap (boundary INCLUSIVE —
    // verified in OperatorSpec), so only a gap STRICTLY greater than
    // 30 min starts a new session (>, not >=).
    "stream_session" ->
      s"""WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS sess_start, count(*) AS n,
        |  ${sqlSumMoney("value")} AS val_sum
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin)
}
