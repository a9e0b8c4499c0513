package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.QueryPack
import graft.io.Tables.t
import graft.util.Det._

/** Composition layer — the Spark-native answer to the reference's
  * planned `pipelines/` + `dags/` + `processor/` packages (SURVEY.md
  * §0.2: scaffolded, never implemented).
  *
  * A `Pipeline` is an ordered list of named stages, each a
  * `DataFrame => DataFrame`. Crucially it composes LAZILY: applying
  * the pipeline folds the stage functions over one logical plan, so
  * Catalyst optimizes ACROSS stage boundaries — a filter declared in
  * stage 3 pushes below a join declared in stage 1, column pruning
  * reaches the scan through every stage. This is the opposite of the
  * materialize-each-step Airflow-style ETL the reference sketched:
  * there, each stage boundary is a serialization wall; here a stage
  * boundary costs nothing at all.
  */
final case class Stage(name: String, f: DataFrame => DataFrame)

final class Pipeline private (val stages: Vector[Stage]) {
  def andThen(name: String)(f: DataFrame => DataFrame): Pipeline =
    new Pipeline(stages :+ Stage(name, f))

  /** Compose all stages over `input` — builds ONE logical plan. */
  def apply(input: DataFrame): DataFrame =
    stages.foldLeft(input)((df, st) => st.f(df))

  def names: Seq[String] = stages.map(_.name)
}

object Pipeline {
  def start: Pipeline = new Pipeline(Vector.empty)

  def apply(stages: (String, DataFrame => DataFrame)*): Pipeline =
    new Pipeline(stages.map((Stage.apply _).tupled).toVector)
}

/** Demo pipeline over `events`: parse → filter → enrich → rollup,
  * declared as four independent stages, executed as one optimized
  * plan (the filter and the json projection both reach the scan;
  * the dim join broadcasts). */
object Pipelines extends QueryPack {

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  def eventsEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = t(s, dir, "customer").select($"c_custkey", $"c_mktsegment")
    val pipe = Pipeline(
      "parse"  -> (_.withColumn("k", from_json($"props", propsSchema).getField("k"))),
      "filter" -> (_.where($"event_type" === "purchase" && $"k" >= 10)),
      "enrich" -> (_.join(broadcast(dim), $"user_id" === $"c_custkey")),
      // to_date, not date_trunc: Spark date_trunc yields TIMESTAMP while
      // DuckDB's yields DATE — to_date/CAST(AS DATE) agree in both.
      "rollup" -> (_.groupBy($"c_mktsegment", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"), sumMoney($"value").as("val_sum"),
             sum($"k".cast("long")).as("k_sum"))))
    pipe(t(s, dir, "events")).orderBy($"c_mktsegment", $"day")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_events_enrich" -> (eventsEnrich _))

  def oracle: Map[String, String] = Map(
    "pipeline_events_enrich" ->
      s"""WITH parsed AS (
        |  SELECT *, CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k
        |  FROM events)
        |SELECT c_mktsegment, CAST(ts AS DATE) AS day,
        |  count(*) AS n, ${sqlSumMoney("value")} AS val_sum,
        |  CAST(sum(k) AS BIGINT) AS k_sum
        |FROM parsed JOIN customer ON user_id = c_custkey
        |WHERE event_type = 'purchase' AND k >= 10
        |GROUP BY c_mktsegment, day
        |ORDER BY c_mktsegment, day""".stripMargin)
}
