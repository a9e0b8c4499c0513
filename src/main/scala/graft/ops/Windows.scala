package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryPack
import graft.io.Tables.t
import graft.util.Det._

/** SURVEY.md §2.5 — window functions.
  *
  * Every window ORDER BY carries a unique tie-break column so ranks,
  * frames, and cume_dist peer groups are engine-independent. Frame
  * sums use the exact-cents pattern (`Det`): Spark evaluates sliding
  * frames incrementally (add/remove), which reorders float adds vs
  * DuckDB's evaluation — integers make that difference vanish.
  * Scale: windows shuffle once on partitionBy keys; the per-brand /
  * per-user / per-customer partitions here stay small at any SF, so
  * no single partition ever concentrates (no skew risk).
  */
object Windows extends QueryPack {

  /** Top-3 parts per brand by retail price: row_number/rank/dense_rank. */
  def winRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"p_brand")
      .orderBy($"p_retailprice".desc, $"p_partkey".asc)
    t(s, dir, "part")
      .select($"p_brand", $"p_partkey", $"p_retailprice",
              row_number().over(w).as("rn"),
              rank().over(w).as("rnk"),
              dense_rank().over(w).as("drnk"))
      .where($"rn" <= 3)
      .orderBy($"p_brand", $"rn")
  }

  /** Per-user inter-event gap (µs) via lag over the event timeline. */
  def winLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    t(s, dir, "events")
      .withColumn("us", unix_micros($"ts".cast("timestamp")))
      .select($"user_id", $"event_id", $"event_type",
              ($"us" - lag($"us", 1).over(w)).as("gap_us"),
              lead($"event_type", 1).over(w).as("next_type"))
      .orderBy($"user_id", $"event_id")
  }

  /** SCD2 interval-ization of the event log: per user, collapse
    * consecutive same-state events into validity intervals
    * [valid_from, valid_to) with the open interval marked current —
    * the gaps-and-islands + lead() shape every warehouse dimension
    * load runs. Two windows, both partitioned on user_id, so the
    * second reuses the first's exchange; timestamps surface as epoch
    * µs (engine-neutral — DuckDB reads events.ts at ns precision). */
  def winScd2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us".asc, $"event_id".asc)
    val starts = t(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type".as("state"),
              unix_micros($"ts".cast("timestamp")).as("us"))
      .withColumn("prev", lag($"state", 1).over(w))
      .where($"prev".isNull || $"prev" =!= $"state")
    starts
      .withColumn("valid_to_us", lead($"us", 1).over(w))
      .select($"user_id", $"state", $"us".as("valid_from_us"),
              $"valid_to_us", $"valid_to_us".isNull.as("is_current"))
      .orderBy($"user_id", $"valid_from_us", $"state")
  }

  /** 7-row moving sum/avg of order totals per customer (ROWS frame). */
  def winFrameRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(-6, Window.currentRow)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
              (sum(cents($"o_totalprice")).over(w).cast("double") / 100).as("mov_sum"),
              (sum(cents($"o_totalprice")).over(w).cast("double") / 100 /
                count(lit(1)).over(w)).as("mov_avg"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Running revenue by order date (RANGE frame: ties all included).
    *
    * A bare `Window.orderBy` plans a SINGLE-partition window — every
    * row through one task, a scale-killer. Instead: two-pass prefix
    * sum. Pass 1 windows WITHIN a coarse partition (month — dates
    * never straddle it); pass 2 adds each month's running offset,
    * computed by a global window over the 12-row month AGGREGATE
    * (bounded by the calendar, not the data) and broadcast back.
    * Cents are integers, so partition sum + offset is bit-identical
    * to the global sum. */
  def winFrameRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "orders")
      .where(year($"o_orderdate") === 1997)
      .withColumn("mo", month($"o_orderdate"))
      .withColumn("c", cents($"o_totalprice"))
    val offs = base.groupBy($"mo")
      .agg(sum($"c").as("mtot"))
      .withColumn("off",
        coalesce(sum($"mtot").over(
          Window.orderBy($"mo")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"mo", $"off")
    val wIn = Window.partitionBy($"mo").orderBy($"o_orderdate")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("in_sum", sum($"c").over(wIn))
      .join(broadcast(offs), "mo")
      .select($"o_orderkey", $"o_orderdate",
              (($"in_sum" + $"off").cast("double") / 100).as("run_sum"))
      .orderBy($"o_orderdate", $"o_orderkey")
  }

  /** Quartiles + cumulative distribution of customer balances.
    *
    * Same single-partition-window hazard as winFrameRange, same cure:
    * the ORDER BY carries a unique tie-break, so every rank function
    * here is a pure function of the global row number and N —
    * cume_dist = rn/N, percent_rank = (rn-1)/(N-1), ntile(4) =
    * bucket-of(rn, N). The global rn comes from a two-pass prefix
    * count: row_number within a coarse balance range, plus the
    * broadcast count of all lower ranges. The range-bucket aggregate
    * (bounded by the value domain, not the data) is the only global
    * window. Both engines then divide the SAME integers → identical
    * doubles. */
  def winNtileCumdist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "customer")
      .withColumn("bkt", floor($"c_acctbal" / 1000.0))
    val counts = base.groupBy($"bkt").agg(count(lit(1)).as("cnt"))
    val offs = counts
      .withColumn("off",
        coalesce(sum($"cnt").over(
          Window.orderBy($"bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"bkt", $"off")
    val total = counts.agg(sum($"cnt").as("n_total"))
    val wIn = Window.partitionBy($"bkt")
      .orderBy($"c_acctbal".asc, $"c_custkey".asc)
    base
      .withColumn("rn_in", row_number().over(wIn).cast("long"))
      .join(broadcast(offs), "bkt")
      .crossJoin(broadcast(total))
      .withColumn("rn", $"rn_in" + $"off")
      // ntile(4): first N%4 buckets hold N div 4 + 1 rows, the rest
      // N div 4 — the standard SQL ntile definition, reproduced from
      // (rn, N) with integer `div` (Column `/` is double division)
      .withColumn("q_small", expr("n_total div 4"))
      .withColumn("q_rem", $"n_total" % 4)
      .withColumn("q_cut", $"q_rem" * ($"q_small" + 1))
      .select($"c_custkey", $"c_acctbal",
              when($"rn" <= $"q_cut",
                   expr("(rn - 1) div (q_small + 1) + 1"))
                .otherwise(expr("q_rem + (rn - q_cut - 1) div q_small + 1"))
                .cast("int").as("quartile"),
              ($"rn".cast("double") / $"n_total").as("cd"),
              (($"rn" - 1).cast("double") / ($"n_total" - 1)).as("pr"))
      .orderBy($"c_custkey")
  }

  /** Gap-based batch sessionization (the batch twin of
    * stream_session): per user, a new session starts when the gap to
    * the previous event exceeds 30 minutes; the session id is the
    * running count of session starts — lag and the running sum share
    * one window, so the whole query is a single exchange on user_id
    * followed by a partial-then-final aggregate on (user_id,
    * session_no). No global window anywhere, so the shape is flat at
    * any scale. */
  def sessionizeBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gapUs = 30L * 60 * 1000 * 1000
    val w = Window.partitionBy($"user_id").orderBy($"us".asc, $"event_id".asc)
    t(s, dir, "events")
      .select($"user_id", $"event_id",
              unix_micros($"ts".cast("timestamp")).as("us"))
      .withColumn("gap", $"us" - lag($"us", 1).over(w))
      .withColumn("is_start",
        when($"gap".isNull || $"gap" > gapUs, 1L).otherwise(0L))
      .withColumn("session_no", sum($"is_start").over(w).cast("int"))
      .groupBy($"user_id", $"session_no")
      .agg(count(lit(1)).as("n_events"),
           min($"us").as("start_us"),
           max($"us").as("end_us"))
      .withColumn("dur_us", $"end_us" - $"start_us")
      .orderBy($"user_id", $"session_no")
  }

  /** Month-over-month revenue growth per market segment — the
    * aggregate-then-window pattern: the window runs over the MONTHLY
    * AGGREGATE (segments × months rows, bounded by the calendar at
    * any SF), never the raw orders, so the lag is effectively free at
    * 100 TB. The change ratio divides two exact integer cent sums as
    * one double op — deterministic in both engines. */
  def winPctChange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val monthly = t(s, dir, "orders")
      .join(t(s, dir, "customer").select($"c_custkey", $"c_mktsegment"),
            $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment",
               (year($"o_orderdate") * 100 + month($"o_orderdate"))
                 .cast("long").as("ym"))
      .agg(sum(cents($"o_totalprice")).as("rev_cents"))
    val w = Window.partitionBy($"c_mktsegment").orderBy($"ym")
    monthly
      .withColumn("prev", lag($"rev_cents", 1).over(w))
      .select($"c_mktsegment", $"ym",
              ($"rev_cents".cast("double") / 100).as("revenue"),
              (($"rev_cents" - $"prev").cast("double") /
                 $"prev".cast("double")).as("mom_change"))
      .orderBy($"c_mktsegment", $"ym")
  }

  /** Running VWAP + drawdown per series — the rolling indicators a
    * trading ETL (the reference's domain) computes over every tick
    * stream. VWAP accumulates integer cents × integer volume in one
    * running window sum and divides ONCE per row (long/long → double,
    * engine-exact); drawdown is running-peak minus current, pure
    * integer max. One window, partitioned on the series key with a
    * unique (ts, event_id) tie-break — ticks per series per horizon
    * are bounded, no single-partition hazard. */
  def winVwap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"sym").orderBy($"us".asc, $"event_id".asc)
    t(s, dir, "events")
      .select($"event_type".as("sym"), $"event_id",
              unix_micros($"ts".cast("timestamp")).as("us"),
              cents($"value").as("pc"),
              get_json_object($"props", "$.k").cast("long").as("vol"))
      .where($"vol".isNotNull && $"vol" > 0L)
      .withColumn("vwap",
        (sum($"pc" * $"vol").over(w).cast("double") /
          sum($"vol").over(w).cast("double")) / 100)
      .withColumn("drawdown",
        (max($"pc").over(w) - $"pc").cast("double") / 100)
      .select($"sym", $"event_id", $"us", $"vwap", $"drawdown")
      .orderBy($"sym", $"event_id")
  }

  /** 20-tick rolling mean/std per series — agg_stats' exact-integer
    * moment discipline moved into a sliding frame: the frame sums
    * (Σx, Σx², n) accumulate INTEGER cents, so Spark's incremental
    * add/remove frame evaluation is exact and order-independent, and
    * the variance formula runs on identical doubles in both engines.
    * The squares widen to decimal(38,0) (HUGEINT in the oracle)
    * BEFORE multiplying — a long pc² overflows at |cents| > ~3e9,
    * which the numerics world's 1e6-scaled values actually reach —
    * so the discipline holds over the full double-representable cents
    * domain. One keyed window, unique tie-break, bounded partitions. */
  def winRollingStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"sym").orderBy($"us".asc, $"event_id".asc)
      .rowsBetween(-19, Window.currentRow)
    val dec = "decimal(38,0)"
    val n = count(lit(1)).over(w)
    val s1 = sum($"pc").over(w)
    val s2 = sum($"pc".cast(dec) * $"pc").over(w)
    // variance numerator n·Σx² − (Σx)² stays EXACT (ts_anomaly's
    // discipline): the float formulation s2 − s1²/n cancels two
    // ~1e22 doubles and diverged from DuckDB by 1 ulp at the
    // numerics world's magnitudes — here both engines convert the
    // SAME exact integer once, then run one identical IEEE tree
    val varnum = n.cast(dec) * s2 - s1.cast(dec) * s1
    t(s, dir, "events")
      .select($"event_type".as("sym"), $"event_id",
              unix_micros($"ts".cast("timestamp")).as("us"),
              cents($"value").as("pc"))
      .select($"sym", $"event_id", $"us",
              ($"pc".cast("double") / 100).as("v"),
              (s1.cast("double") / n.cast("double") / 100).as("roll_mean"),
              when(n > 1L,
                   sqrt(varnum.cast("double") /
                        (n.cast("double") * (n.cast("double") - 1.0))) / 100)
                .as("roll_sd"))
      .orderBy($"sym", $"event_id")
  }

  /** Navigation functions: lead, first/last value over a running
    * frame, and nth_value — per-customer order timelines. */
  def winNav(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
              lead($"o_orderkey", 1).over(w).as("next_order"),
              first($"o_orderkey").over(wAll).as("first_order"),
              last($"o_orderkey").over(wAll).as("last_order"),
              nth_value($"o_orderkey", 2).over(wAll).as("second_order"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    * user (streaks) via the row_number-difference trick — day−rn is
    * constant exactly within a consecutive run, so one window plus one
    * grouped agg finds every island with no self-join and no
    * iteration. All-integer (epoch days), so run boundaries are
    * engine-exact. Shape at scale: distinct (user, day) first — the
    * log shrinks to user-days before any window — then both the
    * window and the agg key on user_id: one shuffle, reused. */
  def winIslands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ud = t(s, dir, "events")
      .select($"user_id",
              expr("CAST(unix_date(to_date(ts)) AS BIGINT)").as("d"))
      .distinct()
    val rn = row_number().over(Window.partitionBy($"user_id").orderBy($"d"))
    ud.withColumn("grp", $"d" - rn)
      .groupBy($"user_id", $"grp")
      .agg(min($"d").as("start_d"), max($"d").as("end_d"),
           count(lit(1)).as("len"))
      .select($"user_id", $"start_d", $"end_d", $"len")
      .orderBy($"user_id", $"start_d")
  }

  /** Exact running median of each customer's order totals — an
    * order-statistic over a growing frame, where mean-based rollups
    * mislead on skewed spend. The percentile evaluates on exact
    * integer CENTS and divides once at the end: the only non-integer
    * op either engine performs is the midpoint (a+b)/2 on
    * exactly-representable doubles, so Spark's percentile and
    * DuckDB's quantile_cont land bit-equal. Frames are per-customer
    * (10-15 rows) — the window never sees an unpartitioned sort, and
    * the shuffle keys on o_custkey like every other per-customer op. */
  def winRunningMedian(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("pc", cents($"o_totalprice"))
      .select($"o_custkey", $"o_orderkey",
              ($"pc".cast("double") / 100).as("price"),
              (expr("percentile(pc, 0.5)").over(w) / 100).as("run_median"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Truncated EWMA (α = 0.2, 20-lag) of each customer's order totals
    * over the (date, key)-ordered series — the recency-weighted
    * baseline trading/monitoring rollups use where a plain rolling
    * mean lags regime changes. EWMA is inherently recursive, which SQL
    * windows can't express directly, and the closed form Σ α(1−α)^k·x
    * needs pow(1−α, −j) factors that overflow at corpus row counts —
    * so the frame's values are collected (bounded: 20 longs) and the
    * recursion runs as a per-row HOF fold. Float discipline: both
    * engines fold the SAME 20 values in the SAME order with the same
    * three IEEE ops per step (seed = oldest/100, acc·0.8 + 0.2·(x/100))
    * — bit-identical without rounding, the same local-fold determinism
    * doc_fingerprint relies on. The frame list is an attribute (window
    * output), so the fold can't be CollapseProject-inlined into
    * anything (the dedup_winnow lesson). One customer-keyed shuffle,
    * frames never exceed 20 rows. */
  def winEwma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
              cents($"o_totalprice").as("pc"))
      .withColumn("xs", collect_list($"pc").over(w.rowsBetween(-19, 0)))
      .withColumn("ewma", expr(
        """aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)),
          |  cast(element_at(xs, 1) as double) / 100,
          |  (acc, x) -> acc * 0.8 + 0.2 * (cast(x as double) / 100))""".stripMargin))
      .select($"o_custkey", $"o_orderkey", $"ewma")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Time-series gap fill + linear interpolation — the resampling
    * primitive (pandas `asfreq` + `interpolate`, Timescale
    * `time_bucket_gapfill`) feature pipelines run before any
    * fixed-step model sees the data: per user, an hourly spine from
    * that user's first to last observed hour, observed hours carry
    * the exact hourly mean, missing hours interpolate linearly
    * between the nearest observed neighbors (edges clamp to the
    * nearest observation).
    *
    * Determinism: hourly means are integer-exact (cents sum / count —
    * the Det pattern), and the interpolation weight is a ratio of
    * exact microsecond epochs, so both engines evaluate the SAME IEEE
    * expression tree on the SAME exact inputs; the round(…, 6) is
    * belt-and-braces, not a mask. The four neighbor columns
    * (prev/next value and epoch) come from last/first IGNORE NULLS
    * over mirrored frames of ONE (user_id, hu) sort — Spark plans a
    * single window shuffle+sort, two frame passes (same plan shape as
    * win_rolling_stats).
    *
    * Scale shape: the spine is generated per user (sequence() — an
    * O(span) Generate, no join against a calendar table), and the
    * window partitions by user; at 100 TB the same query partitions
    * by (user, day-bucket) with boundary rows replicated one bucket
    * over — the standard streaming-friendly decomposition — but the
    * per-key window IS the semantics, so user-keyed is the honest
    * default. Restricted to user_id < 8 to keep the oracle compare
    * model-sized. */
  def tsInterpolate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").where($"user_id" < 8)
      .withColumn("h", date_trunc("hour", $"ts"))
    val known = ev.groupBy($"user_id", $"h")
      .agg((sum(cents($"value")).cast("double") / 100.0 /
            count(lit(1)).cast("double")).as("v"))
    val spine = ev.groupBy($"user_id")
      .agg(min($"h").as("h0"), max($"h").as("h1"))
      .select($"user_id",
              explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val wPrev = Window.partitionBy($"user_id").orderBy($"hu".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy($"user_id").orderBy($"hu".asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(known, Seq("user_id", "h"), "left")
      .withColumn("hu", unix_micros($"h".cast("timestamp")))
      .withColumn("vp", last($"v", ignoreNulls = true).over(wPrev))
      .withColumn("hp",
        last(when($"v".isNotNull, $"hu"), ignoreNulls = true).over(wPrev))
      .withColumn("vn", first($"v", ignoreNulls = true).over(wNext))
      .withColumn("hn",
        first(when($"v".isNotNull, $"hu"), ignoreNulls = true).over(wNext))
      .select($"user_id", $"h",
        when($"v".isNotNull, lit("obs")).otherwise(lit("interp")).as("kind"),
        // emitted UNROUNDED: vp/vn are exact-cents quotients and the
        // lerp is one identical IEEE tree in both engines, so the raw
        // doubles are bit-equal — whereas round(x, 6) on a value that
        // lands exactly on the half-way point at 6 dp diverges between
        // engines (Spark rounds the double's exact decimal expansion,
        // DuckDB scales by 1e6 first; seen live at sf0.001:
        // 65.404688 vs 65.404687)
        when($"v".isNotNull, $"v")
          .when($"hp".isNull, $"vn")
          .when($"hn".isNull, $"vp")
          .otherwise($"vp" + ($"vn" - $"vp") *
            (($"hu" - $"hp").cast("double") /
             ($"hn" - $"hp").cast("double"))).as("val"))
      .orderBy($"user_id", $"h")
  }

  /** Rolling z-score anomaly flags — the monitoring primitive: each
    * event's value is judged against the PRECEDING 20 events of the
    * same user (frame excludes the current row: an outlier must not
    * inflate the baseline it is judged against); flagged when
    * |x − mean| > 3σ, suppressed until 10 observations exist.
    *
    * Determinism is the interesting part: 3σ thresholds are usually
    * float soup, but here the flag is an ALL-INTEGER inequality —
    * |x−μ| > 3σ  ⇔  (n−1)·(n·x−Σx)² > 9·n·(n·Σx²−(Σx)²) — over exact
    * cents sums widened to decimal(38,0) (HUGEINT in the oracle), so
    * both engines compare identical integers and no boundary can flip
    * (the agg_moments discipline applied to a window). The reported
    * z-score is derived from the same integers by one identical IEEE
    * expression tree (NULL when the window variance is exactly zero —
    * both engines test the integer, not a float).
    *
    * Scale shape: one user-keyed shuffle + sort shared by all three
    * frame aggregates; 20-row frames evaluate incrementally. At 100 TB
    * the window partitions by (user, day-bucket) with a 20-row
    * boundary overlap — the ts_interpolate decomposition. */
  def tsAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(-20, -1)
    val dec = "decimal(38,0)"
    t(s, dir, "events")
      .withColumn("x", cents($"value"))
      .withColumn("n", count($"x").over(w))
      .withColumn("sx", sum($"x".cast(dec)).over(w))
      // widen BEFORE the square: x*x in the long domain overflows at
      // |cents| > ~3e9 (observed on the numerics world's 1e6-scaled
      // values under ANSI); decimal(38,0) squares are exact to 1e38
      .withColumn("sxx", sum($"x".cast(dec) * $"x").over(w))
      .where($"n" >= 10)
      .withColumn("dev", $"n".cast(dec) * $"x" - $"sx")
      .withColumn("varnum", $"n".cast(dec) * $"sxx" - $"sx" * $"sx")
      .select($"user_id", $"event_id", $"ts", $"n",
        (($"n" - 1).cast(dec) * $"dev" * $"dev" >
           lit(9).cast(dec) * $"n".cast(dec) * $"varnum").as("flag"),
        when($"varnum" === 0, lit(null).cast("double"))
          .otherwise(round(
            ($"dev".cast("double") / $"n".cast("double")) /
              sqrt($"varnum".cast("double") /
                   ($"n".cast("double") * ($"n" - 1).cast("double"))), 6))
          .as("z"))
      .orderBy($"user_id", $"event_id")
  }

  /** Per-customer price drawdown over the order timeline: running
    * peak of o_totalprice and the gap to it — the equity-curve /
    * KPI-regression shape monitoring dashboards compute per entity
    * (how far below its historical best is this series NOW, and what
    * was the worst excursion). Two window passes — the running-peak
    * frame and the whole-partition max-drawdown — share ONE
    * o_custkey-keyed sort+shuffle (Spark plans a single WindowExec
    * input exchange for both, same reuse as win_rolling_stats), so
    * the cost at any scale is one shuffle of the orders table keyed
    * on the entity. All comparisons run on exact integer cents; the
    * /100 happens once per output column. */
  def winDrawdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val run = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy($"o_custkey")
    t(s, dir, "orders")
      .withColumn("pc", cents($"o_totalprice"))
      .withColumn("peak", max($"pc").over(run))
      .withColumn("dd", $"peak" - $"pc")
      .select($"o_custkey", $"o_orderkey",
        ($"pc".cast("double") / 100).as("price"),
        ($"peak".cast("double") / 100).as("peak"),
        ($"dd".cast("double") / 100).as("drawdown"),
        (max($"dd").over(whole).cast("double") / 100).as("max_drawdown"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_drawdown" -> (winDrawdown _),
    "ts_anomaly" -> (tsAnomaly _),
    "ts_interpolate" -> (tsInterpolate _),
    "win_ewma" -> (winEwma _),
    "win_running_median" -> (winRunningMedian _),
    "win_islands" -> (winIslands _),
    "win_nav" -> (winNav _),
    "win_scd2" -> (winScd2 _),
    "sessionize_batch" -> (sessionizeBatch _),
    "win_pct_change" -> (winPctChange _),
    "win_vwap" -> (winVwap _),
    "win_rolling_stats" -> (winRollingStats _),
    "win_rank" -> (winRank _),
    "win_lag" -> (winLag _),
    "win_frame_rows" -> (winFrameRows _),
    "win_frame_range" -> (winFrameRange _),
    "win_ntile_cumdist" -> (winNtileCumdist _))

  def oracle: Map[String, String] = Map(
    "win_drawdown" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS pc
        |  FROM orders),
        |w AS (
        |  SELECT o_custkey, o_orderkey, pc,
        |    max(pc) OVER (PARTITION BY o_custkey
        |                  ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS peak
        |  FROM o)
        |SELECT o_custkey, o_orderkey,
        |  CAST(pc AS DOUBLE)/100 AS price,
        |  CAST(peak AS DOUBLE)/100 AS peak,
        |  CAST(peak - pc AS DOUBLE)/100 AS drawdown,
        |  CAST(max(peak - pc) OVER (PARTITION BY o_custkey) AS DOUBLE)/100
        |    AS max_drawdown
        |FROM w ORDER BY o_custkey, o_orderkey""".stripMargin,
    "ts_anomaly" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(round(value*100) AS BIGINT) AS x
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id, ts, x,
        |    count(x) OVER win AS n,
        |    CAST(sum(x) OVER win AS HUGEINT) AS sx,
        |    sum(CAST(x AS HUGEINT) * x) OVER win AS sxx
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |d AS (
        |  SELECT user_id, event_id, ts, n,
        |    CAST(n AS HUGEINT) * x - sx AS dev,
        |    CAST(n AS HUGEINT) * sxx - sx * sx AS varnum
        |  FROM w WHERE n >= 10)
        |SELECT user_id, event_id, ts, n,
        |  CAST(n - 1 AS HUGEINT) * dev * dev
        |    > CAST(9 AS HUGEINT) * CAST(n AS HUGEINT) * varnum AS flag,
        |  CASE WHEN varnum = 0 THEN NULL
        |       ELSE round((CAST(dev AS DOUBLE) / CAST(n AS DOUBLE))
        |                  / sqrt(CAST(CAST(varnum AS VARCHAR) AS DOUBLE)
        |                         / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 6)
        |  END AS z
        |FROM d ORDER BY user_id, event_id""".stripMargin,
    "ts_interpolate" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |    CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 8),
        |k AS (SELECT user_id, h,
        |        CAST(sum(cents) AS DOUBLE) / 100.0
        |          / CAST(count(*) AS DOUBLE) AS v
        |      FROM e GROUP BY 1, 2),
        |b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY 1),
        |sp AS (SELECT user_id,
        |         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |       FROM b),
        |j AS (SELECT sp.user_id, sp.h, k.v, epoch_us(sp.h) AS hu
        |      FROM sp LEFT JOIN k ON sp.user_id = k.user_id AND sp.h = k.h),
        |f AS (SELECT user_id, h, v, hu,
        |        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hu
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
        |        last_value(CASE WHEN v IS NOT NULL THEN hu END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY hu
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hp,
        |        first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hu
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
        |        first_value(CASE WHEN v IS NOT NULL THEN hu END IGNORE NULLS)
        |          OVER (PARTITION BY user_id ORDER BY hu
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS hn
        |      FROM j)
        |SELECT user_id, h,
        |  CASE WHEN v IS NOT NULL THEN 'obs' ELSE 'interp' END AS kind,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN hp IS NULL THEN vn
        |       WHEN hn IS NULL THEN vp
        |       ELSE vp + (vn - vp) * (CAST(hu - hp AS DOUBLE)
        |                              / CAST(hn - hp AS DOUBLE))
        |  END AS val
        |FROM f ORDER BY user_id, h""".stripMargin,
    "win_ewma" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS pc
        |  FROM orders),
        |f AS (
        |  SELECT o_custkey, o_orderkey,
        |    list(pc) OVER (PARTITION BY o_custkey
        |                   ORDER BY o_orderdate, o_orderkey
        |                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
        |  FROM o)
        |SELECT o_custkey, o_orderkey,
        |  list_reduce(list_transform(xs, x -> CAST(x AS DOUBLE)/100),
        |              (acc, x) -> acc * 0.8 + 0.2 * x) AS ewma
        |FROM f ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_running_median" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS pc
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(pc AS DOUBLE)/100 AS price,
        |  quantile_cont(pc, 0.5) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100
        |    AS run_median
        |FROM o ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_islands" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY d) AS rn FROM ud)
        |SELECT user_id, min(d) AS start_d, max(d) AS end_d,
        |  count(*) AS len
        |FROM r GROUP BY user_id, d - rn
        |ORDER BY user_id, start_d""".stripMargin,
    "win_rolling_stats" ->
      """WITH e AS (
        |  SELECT event_type AS sym, event_id, epoch_us(ts) AS us,
        |    CAST(round(value*100) AS BIGINT) AS pc
        |  FROM events)
        |SELECT sym, event_id, us,
        |  CAST(pc AS DOUBLE)/100 AS v,
        |  CAST(sum(pc) OVER w AS DOUBLE)
        |    / CAST(count(*) OVER w AS DOUBLE) / 100 AS roll_mean,
        |  CASE WHEN count(*) OVER w > 1 THEN
        |    -- HUGEINT -> VARCHAR -> DOUBLE: DuckDB 1.0's direct int128->double
        |    -- cast is double-rounding (upper*2^64 + lower, ~1% of >2^53
        |    -- values off by 1 ulp); the string parse is correctly rounded,
        |    -- matching Spark's BigDecimal.doubleValue exactly
        |    sqrt(CAST(CAST(CAST(count(*) OVER w AS HUGEINT)
        |                * sum(CAST(pc AS HUGEINT) * pc) OVER w
        |              - CAST(sum(pc) OVER w AS HUGEINT)
        |                * CAST(sum(pc) OVER w AS HUGEINT) AS VARCHAR) AS DOUBLE)
        |         / (CAST(count(*) OVER w AS DOUBLE)
        |            * (CAST(count(*) OVER w AS DOUBLE) - 1.0))) / 100
        |  END AS roll_sd
        |FROM e
        |WINDOW w AS (PARTITION BY sym ORDER BY us ASC, event_id ASC
        |             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |ORDER BY sym, event_id""".stripMargin,
    "win_vwap" ->
      """WITH e AS (
        |  SELECT event_type AS sym, event_id, epoch_us(ts) AS us,
        |    CAST(round(value*100) AS BIGINT) AS pc,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS vol
        |  FROM events)
        |SELECT sym, event_id, us,
        |  (CAST(sum(pc * vol) OVER w AS DOUBLE)
        |     / CAST(sum(vol) OVER w AS DOUBLE)) / 100 AS vwap,
        |  CAST(max(pc) OVER w - pc AS DOUBLE) / 100 AS drawdown
        |FROM e WHERE vol IS NOT NULL AND vol > 0
        |WINDOW w AS (PARTITION BY sym ORDER BY us ASC, event_id ASC)
        |ORDER BY sym, event_id""".stripMargin,
    "win_pct_change" ->
      s"""WITH m AS (
        |  SELECT c_mktsegment,
        |    CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS ym,
        |    sum(${sqlCents("o_totalprice")}) AS rev_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, ym)
        |SELECT c_mktsegment, ym,
        |  CAST(rev_cents AS DOUBLE)/100 AS revenue,
        |  CAST(rev_cents - lag(rev_cents) OVER w AS DOUBLE)
        |    / CAST(lag(rev_cents) OVER w AS DOUBLE) AS mom_change
        |FROM m WINDOW w AS (PARTITION BY c_mktsegment ORDER BY ym)
        |ORDER BY c_mktsegment, ym""".stripMargin,
    "sessionize_batch" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |g AS (
        |  SELECT *, us - lag(us) OVER w AS gap FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (
        |  SELECT *, CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000
        |                          THEN 1 ELSE 0 END) OVER w AS INTEGER) AS session_no
        |  FROM g
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, session_no, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us,
        |  max(us) - min(us) AS dur_us
        |FROM s GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin,
    "win_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type AS state, epoch_us(ts) AS us
        |  FROM events),
        |i AS (
        |  SELECT *, lag(state) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM e),
        |s AS (
        |  SELECT user_id, event_id, state, us
        |  FROM i WHERE prev IS NULL OR prev <> state),
        |o AS (
        |  SELECT user_id, state, us AS valid_from_us,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us
        |  FROM s)
        |SELECT user_id, state, valid_from_us, valid_to_us,
        |  valid_to_us IS NULL AS is_current
        |FROM o ORDER BY user_id, valid_from_us, state""".stripMargin,
    "win_nav" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  lead(o_orderkey, 1) OVER w AS next_order,
        |  first_value(o_orderkey) OVER wall AS first_order,
        |  last_value(o_orderkey) OVER wall AS last_order,
        |  nth_value(o_orderkey, 2) OVER wall AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wall AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_rank" ->
      """WITH r AS (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    CAST(row_number() OVER w AS INTEGER) AS rn,
        |    CAST(rank() OVER w AS INTEGER) AS rnk,
        |    CAST(dense_rank() OVER w AS INTEGER) AS drnk
        |  FROM part
        |  WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC))
        |SELECT * FROM r WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,
    "win_lag" ->
      """SELECT user_id, event_id, event_type,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin,
    "win_frame_rows" ->
      s"""SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(${sqlCents("o_totalprice")}) OVER w AS DOUBLE)/100 AS mov_sum,
        |  CAST(sum(${sqlCents("o_totalprice")}) OVER w AS DOUBLE)/100
        |    / count(*) OVER w AS mov_avg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_frame_range" ->
      s"""SELECT o_orderkey, o_orderdate,
        |  CAST(sum(${sqlCents("o_totalprice")}) OVER w AS DOUBLE)/100 AS run_sum
        |FROM orders WHERE year(o_orderdate) = 1997
        |WINDOW w AS (ORDER BY o_orderdate
        |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderdate, o_orderkey""".stripMargin,
    "win_ntile_cumdist" ->
      """SELECT c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  cume_dist() OVER w AS cd,
        |  percent_rank() OVER w AS pr
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey""".stripMargin)
}
