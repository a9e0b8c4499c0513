package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryPack
import graft.io.Tables.t

/** SURVEY.md §2.8 — scalar function surface: string, date, math, array
  * (incl. higher-order), map, JSON, conditional.
  *
  * Everything here is a built-in `functions._` call → whole-stage
  * codegen, no UDFs, fully pushdown/prune friendly. Dialect notes for
  * the DuckDB mirrors are inline (ln vs log, BIGINT vs INT returns,
  * floor type). `round(x, s)` below data precision is banned: Spark
  * rounds the shortest decimal repr (HALF_UP on BigDecimal.valueOf)
  * while DuckDB rounds the scaled binary double — they disagree on
  * half-way inputs. floor/ceil/exact folds are used instead.
  */
object Scalars extends QueryPack {

  def fnString(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part").select(
        $"p_partkey",
        lower($"p_type").as("lo"),
        upper($"p_name").as("up"),
        length($"p_name").as("len"),
        substring($"p_name", 1, 4).as("sub"),
        concat_ws("|", $"p_brand", $"p_type").as("cw"),
        regexp_extract($"p_name", "^([a-z]+) ", 1).as("color"),
        regexp_replace($"p_name", " ", "_").as("snake"),
        // split result serialized: nested cells don't sort/hash
        // portably across engines, so arrays leave the query joined
        array_join(split($"p_name", " "), ",").as("words"),
        trim(lit("  pad  ")).as("trimmed"),
        lpad($"p_brand", 10, "0").as("padded"),
        instr($"p_name", "e").cast("long").as("pos_e"),
        ($"p_name".contains("red")).as("has_red"),
        ($"p_name".startsWith("blue")).as("is_blue"),
        reverse($"p_brand").as("rev"))
      .orderBy($"p_partkey")
  }

  def fnDate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders").select(
        $"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        quarter($"o_orderdate").as("qtr"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        datediff($"o_orderdate", lit("1995-01-01").cast("timestamp")).as("days_since"),
        date_add($"o_orderdate", 30).as("plus30"),
        last_day($"o_orderdate").as("eom"),
        unix_micros($"o_orderdate".cast("timestamp")).as("us"),
        date_format($"o_orderdate", "yyyy-MM").as("ym"))
      .where(year($"o_orderdate") === 1996)
      .orderBy($"o_orderkey")
  }

  def fnMath(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer").select(
        $"c_custkey",
        abs($"c_acctbal").as("ab"),
        floor($"c_acctbal").as("fl"),
        ceil($"c_acctbal").as("ce"),
        pow($"c_nationkey", 2).as("sq"),
        sqrt(abs($"c_acctbal")).as("rt"),
        // ln/exp are not IEEE correctly-rounded; Java and libm differ
        // by 1 ulp on some inputs — round to 6dp for oracle parity.
        round(log(abs($"c_acctbal") + lit(1.0)), 6).as("ln1p"),
        round(exp($"c_nationkey" / lit(100.0)), 6).as("ex"),
        ($"c_custkey" % 7).as("mod7"),
        expr("c_custkey div 7").as("idiv7"),
        ($"c_acctbal" % 10.0).as("dmod"),
        signum($"c_acctbal").as("sgn"))
      .orderBy($"c_custkey")
  }

  /** Bitwise surface: and/or/xor/not, shifts, bit_count — flag-mask
    * arithmetic for packed columns. */
  def fnBitwise(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer").select(
        $"c_custkey",
        ($"c_custkey".bitwiseAND(255L)).as("lo8"),
        ($"c_custkey".bitwiseOR(4096L)).as("or12"),
        ($"c_custkey".bitwiseXOR($"c_nationkey".cast("long"))).as("xr"),
        bitwise_not($"c_custkey").as("inv"),
        shiftleft($"c_custkey", 3).as("shl3"),
        shiftright($"c_custkey", 2).as("shr2"),
        bit_count($"c_custkey").as("pop"))
      .orderBy($"c_custkey")
  }

  /** Higher-order array functions over the 64-dim embeddings. Reads
    * through the vec family's front door (null / non-finite vectors
    * excluded): the demo is the array-function surface, and a NaN or
    * Inf component drags every column into cross-engine non-finite
    * semantics (floor(Inf)::BIGINT even ERRORS on both engines under
    * ANSI-style casts — the round-13 non-finite-world catch). */
  def fnArray(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = graft.vec.VectorOps.emb(s, dir)
    e.select(
        $"vec_id",
        size($"embedding").as("dim"),
        element_at($"embedding", 1).as("first"),
        array_max($"embedding").as("mx"),
        array_min($"embedding").as("mn"),
        // top-3 as scalar columns, not an array: floats stay compared
        // as floats (stringifying doubles is engine-divergent)
        element_at(sort_array($"embedding", asc = false), 1).as("top1"),
        element_at(sort_array($"embedding", asc = false), 2).as("top2"),
        element_at(sort_array($"embedding", asc = false), 3).as("top3"),
        size(filter($"emb", x => x > 0.5)).as("n_gt_half"),
        round(aggregate($"emb", lit(0.0), (acc, x) => acc + x * x), 4).as("sumsq"),
        round(aggregate(zip_with($"emb", $"emb", (a, b) => a * b),
                        lit(0.0), (acc, x) => acc + x), 4).as("self_dot"),
        // long buckets serialize losslessly — integer text is identical
        // in both engines
        array_join(transform($"emb", x => floor(x * 10).cast("long")), ",").as("buckets"))
      .where($"vec_id" < 100)
      .orderBy($"vec_id")
  }

  def fnMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .withColumn("m", map(lit("k"), $"k", lit("twice"), $"k" * 2))
    e.select(
        $"event_id",
        element_at($"m", "k").as("k_val"),
        element_at($"m", "twice").as("k2_val"),
        array_join(map_keys($"m"), ",").as("keys"),
        size($"m").as("n_entries"))
      .where($"event_id" < 1000)
      .orderBy($"event_id")
  }

  def fnJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = StructType(Seq(StructField("k", IntegerType)))
    t(s, dir, "events").select(
        $"event_id",
        get_json_object($"props", "$.k").cast("int").as("k_path"),
        from_json($"props", schema).getField("k").as("k_struct"))
      .orderBy($"event_id")
  }

  def fnCond(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer").select(
        $"c_custkey",
        when($"c_acctbal" < 0, "debt")
          .when($"c_acctbal" < 5000, "mid")
          .otherwise("rich").as("tier"),
        coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("(other)")).as("seg"),
        least($"c_acctbal", lit(1000.0)).as("capped"),
        greatest($"c_nationkey", lit(10)).as("at_least_10"))
      .orderBy($"c_custkey")
  }

  /** Regex function family — extract / count / global replace /
    * anchored match / trailing-number parse, the text-wrangling
    * quintet ETL string cleanup leans on. Patterns stay in the
    * POSIX-compatible intersection of Java regex (Spark) and RE2-ish
    * DuckDB — char classes, anchors, alternation, no lookaround — so
    * both engines read them identically; DuckDB's regexp_replace
    * needs the explicit 'g' flag to match Spark's replace-all
    * default (a classic cross-dialect trap the oracle pins). All
    * codegen'd built-ins, map-only. */
  def fnRegex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select($"p_partkey",
        regexp_extract($"p_name", "^([a-z]+)", 1).as("first_word"),
        expr("CAST(regexp_count(p_name, '[aeiou]') AS INT)").as("n_vowels"),
        regexp_replace($"p_name", "[aeiou]", "*").as("scrubbed"),
        regexp_extract($"p_brand", "([0-9]+)$", 1).cast("int").as("brand_no"),
        expr("regexp_like(p_type, '^(ECONOMY|SMALL)$')").as("is_cheap_class"))
      .orderBy($"p_partkey")
  }

  /** URL parsing + canonicalization — the web-corpus intake scalars:
    * host / path / single-query-param extraction via parse_url
    * (Catalyst's native ParseUrl expression) and tracking-parameter
    * stripping (utm_*) in one regexp pass — the canonical-URL key
    * every crawl pipeline computes before exact dedup. URLs are
    * synthesized deterministically from documents so both engines see
    * identical inputs; the oracle mirrors parse_url with anchored
    * regexps (DuckDB has no URL parser). Rolled up per (host, lang
    * param): row count plus the exact total length of the canonical
    * forms — a corpus-wide canonicalization checksum any single-row
    * divergence flips. Map-only until the (sources × langs)-sized
    * rollup; at 100 TB the parse/strip work rides whole-stage
    * codegen with zero shuffle before the model-sized agg. */
  def fnUrl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(concat(lit("https://"), $"source", lit(".example.org/d/"),
                     $"doc_id".cast("string"), lit("?utm_source=feed&lang="),
                     $"lang", lit("&p="), ($"doc_id" % 7).cast("string"))
                .as("url"))
      .select(
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'lang')").as("lang_q"),
        regexp_replace(regexp_replace($"url", "utm_[a-z]+=[^&#]*&?", ""),
                       "[?&]$", "").as("canonical"))
      .groupBy($"host", $"lang_q")
      .agg(count(lit(1)).as("n"),
           sum(length($"canonical")).cast("long").as("canon_chars"),
           min($"path").as("sample_path"))
      .orderBy($"host", $"lang_q")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_url" -> (fnUrl _),
    "fn_regex" -> (fnRegex _),
    "fn_string" -> (fnString _),
    "fn_date" -> (fnDate _),
    "fn_math" -> (fnMath _),
    "fn_bitwise" -> (fnBitwise _),
    "fn_array" -> (fnArray _),
    "fn_map" -> (fnMap _),
    "fn_json" -> (fnJson _),
    "fn_cond" -> (fnCond _))

  def oracle: Map[String, String] = Map(
    "fn_url" ->
      """WITH u AS (SELECT doc_id,
        |    'https://' || source || '.example.org/d/' || doc_id ||
        |    '?utm_source=feed&lang=' || lang || '&p=' || (doc_id % 7) AS url
        |  FROM documents),
        |x AS (SELECT
        |    -- Spark's parse_url(HOST) rides java.net.URI: the URI
        |    -- parses, but a host outside the RFC 2396 server-authority
        |    -- hostname grammar (alphanumeric, '-', '.') yields NULL
        |    -- while PATH/QUERY still extract. Mirror the validity
        |    -- gate; no-op on the ASCII clean-world sources. Caught by
        |    -- the unicode world's non-ASCII source group key.
        |    CASE WHEN regexp_matches(
        |           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
        |           '^[A-Za-z0-9.-]+$')
        |         THEN regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)
        |         ELSE NULL END AS host,
        |    regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |    regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_q,
        |    regexp_replace(regexp_replace(url, 'utm_[a-z]+=[^&#]*&?', '', 'g'),
        |                   '[?&]$', '') AS canonical
        |  FROM u)
        |SELECT host, lang_q, count(*) AS n,
        |  CAST(sum(length(canonical)) AS BIGINT) AS canon_chars,
        |  min(path) AS sample_path
        |FROM x GROUP BY host, lang_q
        |ORDER BY host, lang_q""".stripMargin,
    "fn_regex" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER)
        |    AS n_vowels,
        |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS scrubbed,
        |  CAST(regexp_extract(p_brand, '([0-9]+)$', 1) AS INTEGER)
        |    AS brand_no,
        |  regexp_matches(p_type, '^(ECONOMY|SMALL)$') AS is_cheap_class
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        |  lower(p_type) AS lo, upper(p_name) AS up,
        |  CAST(length(p_name) AS INTEGER) AS len,
        |  substring(p_name, 1, 4) AS sub,
        |  concat_ws('|', p_brand, p_type) AS cw,
        |  regexp_extract(p_name, '^([a-z]+) ', 1) AS color,
        |  regexp_replace(p_name, ' ', '_', 'g') AS snake,
        |  array_to_string(string_split(p_name, ' '), ',') AS words,
        |  trim('  pad  ') AS trimmed,
        |  lpad(p_brand, 10, '0') AS padded,
        |  CAST(instr(p_name, 'e') AS BIGINT) AS pos_e,
        |  contains(p_name, 'red') AS has_red,
        |  starts_with(p_name, 'blue') AS is_blue,
        |  reverse(p_brand) AS rev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  last_day(o_orderdate) AS eom,
        |  epoch_us(o_orderdate) AS us,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_orderkey""".stripMargin,
    "fn_bitwise" ->
      """SELECT c_custkey,
        |  c_custkey & 255 AS lo8,
        |  c_custkey | 4096 AS or12,
        |  xor(c_custkey, CAST(c_nationkey AS BIGINT)) AS xr,
        |  ~c_custkey AS inv,
        |  c_custkey << 3 AS shl3,
        |  c_custkey >> 2 AS shr2,
        |  CAST(bit_count(c_custkey) AS INTEGER) AS pop
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_math" ->
      """SELECT c_custkey,
        |  abs(c_acctbal) AS ab,
        |  CAST(floor(c_acctbal) AS BIGINT) AS fl,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS ce,
        |  pow(c_nationkey, 2) AS sq,
        |  sqrt(abs(c_acctbal)) AS rt,
        |  round(ln(abs(c_acctbal) + 1.0), 6) AS ln1p,
        |  round(exp(c_nationkey / 100.0), 6) AS ex,
        |  c_custkey % 7 AS mod7,
        |  c_custkey // 7 AS idiv7,
        |  c_acctbal % 10.0 AS dmod,
        |  CAST(CASE WHEN c_acctbal > 0 THEN 1.0 WHEN c_acctbal < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS sgn
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_array" ->
      // WHERE mirrors the vec front door (see VectorOps.aliveSql)
      s"""SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS dim,
        |  embedding[1] AS first,
        |  list_max(embedding) AS mx,
        |  list_min(embedding) AS mn,
        |  (list_sort(embedding, 'DESC'))[1] AS top1,
        |  (list_sort(embedding, 'DESC'))[2] AS top2,
        |  (list_sort(embedding, 'DESC'))[3] AS top3,
        |  CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0.5)) AS INTEGER) AS n_gt_half,
        |  -- no null guard needed on the fold seeds: the front-door
        |  -- WHERE below already excludes null (and non-finite) vectors
        |  round(list_reduce(list_prepend(0.0::DOUBLE, embedding::DOUBLE[]), (acc, x) -> acc + x*x), 4) AS sumsq,
        |  round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(embedding::DOUBLE[], x -> x*x)), (acc, x) -> acc + x), 4) AS self_dot,
        |  array_to_string(list_transform(embedding::DOUBLE[], x -> CAST(floor(x*10) AS BIGINT)), ',') AS buckets
        |FROM embeddings WHERE vec_id < 100
        |  AND ${graft.vec.VectorOps.aliveSql("embedding")}
        |ORDER BY vec_id""".stripMargin,
    "fn_map" ->
      """WITH e AS (
        |  SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |  FROM events)
        |SELECT event_id, k AS k_val, k*2 AS k2_val,
        |  'k,twice' AS keys, 2 AS n_entries
        |FROM e WHERE event_id < 1000 ORDER BY event_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_path,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_cond" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debt'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'rich' END AS tier,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(other)') AS seg,
        |  least(c_acctbal, 1000.0) AS capped,
        |  greatest(c_nationkey, 10) AS at_least_10
        |FROM customer ORDER BY c_custkey""".stripMargin)
}
