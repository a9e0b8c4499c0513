package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for the DuckDB differential oracle.
  *
  * Floating-point sums are order-sensitive: Spark folds partition-local
  * partial sums in a nondeterministic order, DuckDB folds sequentially,
  * so `sum(double)` can differ in the last ulps and a final `round()`
  * can then land on different sides of a bucket boundary. The fix used
  * everywhere in this library: round each ELEMENT to cents (exact,
  * per-row deterministic), sum as integers (exact, order-independent),
  * and divide once at the end (one deterministic double op). The oracle
  * SQL mirrors the same expression, so both engines compute bit-equal
  * doubles regardless of partitioning — this property survives any
  * scale-up, unlike "round the float sum" which gets WORSE with more
  * rows/partitions.
  */
object Det {
  /** Per-element exact cents: round(x*100) as BIGINT.
    * DuckDB mirror: `CAST(round(x*100) AS BIGINT)`. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Order-independent money sum, emitted as DOUBLE.
    * DuckDB mirror: `CAST(sum(CAST(round(x*100) AS BIGINT)) AS DOUBLE)/100`. */
  def sumMoney(c: Column): Column = sum(cents(c)).cast("double") / 100

  /** Order-independent money mean, emitted as DOUBLE.
    * DuckDB mirror: `.../100/count(*)`. */
  def avgMoney(c: Column): Column =
    sum(cents(c)).cast("double") / 100 / count(lit(1))

  /** Deterministic per-row sampling hash (Knuth multiplicative,
    * uniform in [0, 2³²)): the rand()-free coin behind the weighted /
    * per-group / mix samplers. The id is pre-reduced mod 2³¹ BEFORE
    * the multiply: id·2654435761 silently wraps Int64 in Spark for
    * id ≳ 3.5e9 while DuckDB raises out-of-range — engine divergence
    * exactly in the 100 TB id regime. (2³¹−1)·2654435761 ≈ 5.7e18
    * stays inside Int64 in BOTH engines, and ids < 2³¹ hash
    * identically to the unreduced form. */
  def knuthHash(id: Column): Column =
    pmod(pmod(id, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))

  /** SQL-side mirrors (DuckDB dialect), kept next to the Scala forms so
    * the two can be reviewed for equivalence in one place. The inner
    * reduction is written `((x % m) + m) % m` because DuckDB's `%`
    * follows the dividend's sign while Spark's `pmod` is always
    * non-negative — without the `+ m` re-fold a NEGATIVE id would hash
    * differently in the two engines (round-7 advice). The re-fold stays
    * in range (max intermediate (2³¹−1)+2³¹ < 2³²) and is an identity
    * for id ≥ 0; the outer `%` sees a non-negative dividend, where `%`
    * and pmod already agree. */
  def sqlKnuthHash(id: String): String =
    s"((((($id) % 2147483648) + 2147483648) % 2147483648) * 2654435761) % 4294967296"

  def sqlCents(x: String): String = s"CAST(round(($x)*100) AS BIGINT)"
  def sqlSumMoney(x: String): String =
    s"CAST(sum(${sqlCents(x)}) AS DOUBLE)/100"
  def sqlAvgMoney(x: String): String =
    s"CAST(sum(${sqlCents(x)}) AS DOUBLE)/100/count(*)"
}
