package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent, cross-engine-reproducible aggregates.
  *
  * Double sums depend on partial-aggregation order, so the same query can
  * produce last-bit differences between runs (and between Spark and the
  * DuckDB oracle), which flip values sitting on a rounding boundary. Summing
  * an exact DECIMAL(38,10) image of the value instead makes the aggregate a
  * single well-defined number: the per-row double→decimal rounding is
  * deterministic (half-away-from-zero in both engines), and decimal addition
  * is exact and commutative. Cast back to double afterwards so downstream
  * arithmetic stays identical on both sides.
  *
  * DuckDB mirror: CAST(sum(CAST(x AS DECIMAL(38,10))) AS DOUBLE).
  * Still fully codegen-friendly; decimal aggregation is Tungsten-native.
  */
object Exact {
  private val Dec = "decimal(38,10)"

  /** Exact sum, returned as double. */
  def esum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact mean (non-null count denominator, like avg). */
  def eavg(c: Column): Column = esum(c) / count(c)

  /** Window variant: `.over` must wrap the aggregate itself, not the cast. */
  def esumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(Dec)).over(w).cast("double")

  /** Deterministic 4-decimal rounding: floor(x·10⁴ + 0.5)/10⁴.
    *
    * Spark's `round` (BigDecimal HALF_UP on the exact binary expansion) and
    * DuckDB's `round` (multiply, C round, divide) disagree on doubles that
    * land near a half boundary. This formula is pure IEEE arithmetic, so
    * Spark and the oracle compute bit-identical results.
    * DuckDB mirror: floor((x) * 10000 + 0.5) / 10000.0.
    */
  def rnd4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** Epoch microseconds tolerant of both TIMESTAMP and TIMESTAMP_NTZ inputs.
    *
    * Parquet written without isAdjustedToUTC reads back as TIMESTAMP_NTZ,
    * which `unix_micros` rejects at analysis time. Casting to TIMESTAMP
    * first is a no-op for LTZ inputs and interprets NTZ wall-clock in the
    * session time zone (pinned to UTC by every entry point), which is
    * exactly how the DuckDB oracle's `epoch_us` reads a naive timestamp.
    */
  def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))
}
