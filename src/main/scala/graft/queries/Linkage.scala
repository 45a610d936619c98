package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Record-linkage + data-profiling surface: the entity-resolution and
  * corpus-inventory operators a curation pipeline runs before/after the
  * dedup family (cf. reference exercise_2's keyed joins — here the join
  * key is fuzzy, so the equi-join is on a BLOCKING key and the string
  * metric runs only inside blocks).
  */
object Linkage {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)

  /** Q81 — fuzzy entity matching (record linkage) over part names:
    * distinct names are blocked on their head noun (second token), and
    * candidate pairs within a block match when edit distance <= 2. Each
    * matched name carries its support (how many part rows bear it), the
    * quantity a resolution step would merge.
    *
    * Scale posture: the blocking key turns an O(n^2) string-metric scan
    * into one equi-join whose candidate volume is sum(block^2) over
    * block sizes — the classic blocking design from the record-linkage
    * literature. Distinct+support is one map-side-combinable groupBy;
    * the edit distance is Spark's codegen'd levenshtein with the
    * threshold argument, which abandons a row at cost O(k*n) instead of
    * O(n^2) once the distance provably exceeds 2. A hot block (common
    * noun) is ordinary join skew — AQE skew-split or Skew.saltedJoin
    * applies unchanged because the candidate generator is a plain
    * equi-join. */
  val q81_fuzzy_match: Query = Query(
    """WITH names AS (SELECT p_name, count(*) AS support FROM part GROUP BY p_name),
      |     b AS (SELECT p_name, support, split_part(p_name, ' ', 2) AS blk FROM names)
      |SELECT a.p_name AS name_a, x.p_name AS name_b,
      |       CAST(levenshtein(a.p_name, x.p_name) AS INTEGER) AS dist,
      |       a.support AS support_a, x.support AS support_b
      |FROM b a JOIN b x ON a.blk = x.blk AND a.p_name < x.p_name
      |WHERE levenshtein(a.p_name, x.p_name) <= 2
      |ORDER BY name_a, name_b""") { (s, dir) =>
    val names = t(s, dir, "part")
      .groupBy("p_name").agg(count(lit(1)).as("support"))
      .withColumn("blk", split_part(col("p_name"), lit(" "), lit(2)))
    val a = names.select(col("p_name").as("name_a"), col("support").as("support_a"), col("blk"))
    val x = names.select(col("p_name").as("name_b"), col("support").as("support_b"), col("blk"))
    a.join(x, "blk")
      .where(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
      .where(col("dist") =!= -1)
      .select("name_a", "name_b", "dist", "support_a", "support_b")
      .orderBy("name_a", "name_b")
  }

  /** Q82 — single-pass column profiling over lineitem: per profiled
    * column, row count, non-null count, exact distinct count, min, max
    * and exact (decimal-summed) total. `tax_nz` derives NULLs via
    * NULLIF so the null-accounting path is exercised for real.
    *
    * Scale posture: ONE aggregation job — the four exact distinct
    * counts make Catalyst plan a 5-way Expand (4 distinct groups + the
    * plain aggregates), i.e. a 5x read amplification of the projected
    * columns but still a single scan of the table and one partial+final
    * exchange keyed by the expand gid. At 100 TB you would swap the
    * exact distincts for approx_count_distinct (HLL partials, q06b) and
    * keep everything else identical; the exact form here is the
    * semantics that sketch approximates. */
  val q82_profile: Query = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "tax_nz")
    def perColSql(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_val,
         |       count(DISTINCT $c) AS n_distinct,
         |       CAST(min($c) AS DOUBLE) AS min_val, CAST(max($c) AS DOUBLE) AS max_val,
         |       ${dsumSql(c)} AS sum_val
         |FROM li""".stripMargin
    Query(
      s"""WITH li AS (SELECT l_quantity, l_extendedprice, l_discount,
         |                   NULLIF(l_tax, 0.0e0) AS tax_nz
         |            FROM lineitem)
         |${cols.map(perColSql).mkString("\nUNION ALL\n")}
         |ORDER BY col_name""") { (s, dir) =>
      val li = t(s, dir, "lineitem").select(
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        nullif(col("l_tax"), lit(0.0)).as("tax_nz"))
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"nv_$c"), countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("double").as(s"mn_$c"), max(col(c)).cast("double").as(s"mx_$c"),
          dsum(col(c)).as(s"sm_$c"))
      }
      val one = li.agg(aggs.head, aggs.tail: _*)
      val stacked = cols.map(c => s"'$c', n_rows, nv_$c, nd_$c, mn_$c, mx_$c, sm_$c").mkString(", ")
      one.select(expr(
        s"stack(${cols.size}, $stacked) AS (col_name, n_rows, n_val, n_distinct, min_val, max_val, sum_val)"))
        .orderBy("col_name")
    }
  }

  val all: Map[String, Query] = Map(
    "q81_fuzzy_match" -> q81_fuzzy_match,
    "q82_profile" -> q82_profile)
}
