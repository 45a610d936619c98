package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object queries {

  /** A declared query: Spark implementation + (optionally) the equivalent
    * ANSI SQL the driver runs in DuckDB as the correctness oracle.
    * Queries without an oracle get the driver's weaker rows-only check and
    * are covered by ScalaTest instead. */
  final case class Query(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  object Query {
    def apply(sql: String)(fn: (SparkSession, String) => DataFrame): Query =
      Query(fn, Some(sql.stripMargin.trim))
    def noOracle(fn: (SparkSession, String) => DataFrame): Query = Query(fn, None)
  }

  /** Exact-sum trick for float columns whose values carry <= `scale`
    * decimal digits (prices, quantities): cast each value to DECIMAL
    * before summing so the sum is exact and therefore identical across
    * engines and partition orders — then surface a DOUBLE. The matching
    * oracle fragment is [[dsumSql]]. At 100 TB this also makes partial
    * (map-side) aggregation bit-stable across any shuffle layout. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE)"

  /** Canonical float rounding: floor(x·10^d + 0.5)/10^d in pure double
    * arithmetic. Spark's round() (BigDecimal HALF_UP over the shortest
    * decimal repr) and DuckDB's round() disagree at exact .xxxx5
    * boundaries; this formula is the same IEEE operations in both
    * engines, hence bitwise-identical on identical inputs.
    *
    * Domain: |x| < 2^51 / 10^digits (≈ 2.2e11 at digits=4). Inside it the
    * divide-then-multiply round-trip error on floor(x·10^d+0.5) stays
    * below n·2^-52 < 0.5 of an integer step, so the formula is provably
    * idempotent. Beyond ≈ 2^52/10^d a double's ulp exceeds 10^-d and
    * re-rounding can move the value. Every query that calls cround rounds
    * ratios, averages, or similarity scores — all far inside the domain —
    * and the LawsCheck idempotence property generates inside it. */
  def cround(c: Column, digits: Int = 4): Column = {
    val f = math.pow(10, digits)
    floor(c * f + 0.5) / f
  }

  def croundSql(expr: String, digits: Int = 4): String = {
    val f = math.pow(10, digits).toLong
    s"floor(($expr) * $f + 0.5e0) / $f"
  }

  /** Deterministic mean: exact decimal sum / count, canonically rounded. */
  def davg(c: Column, scale: Int = 2): Column =
    cround(sum(c.cast(DecimalType(30, scale))).cast("double") / count(lit(1)))

  def davgSql(expr: String, scale: Int = 2): String =
    croundSql(s"CAST(sum(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE) / count(*)")
}
