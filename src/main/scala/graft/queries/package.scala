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

  /** Deterministic mean: exact decimal sum / count, rounded to 4. */
  def davg(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(DecimalType(30, scale))).cast("double") / count(lit(1)), 4)

  def davgSql(expr: String, scale: Int = 2): String =
    s"round(CAST(sum(CAST($expr AS DECIMAL(30,$scale))) AS DOUBLE) / count(*), 4)"

  /** Canonical float output: ROUND(x, 4) per SURVEY.md §5.3. */
  def r4(c: Column): Column = round(c, 4)
}
