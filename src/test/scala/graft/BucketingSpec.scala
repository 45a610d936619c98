package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Bucketed co-located join (SURVEY.md §4.2 / builder-prompt partitioning
  * story): writing both join sides bucketed by the join key lets Spark
  * plan the join with NO shuffle exchange — the technique that amortizes
  * one shuffle across every future join at 100 TB. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.table(spark, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.table(spark, dir, "lineitem").select("l_orderkey", "l_quantity")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // managed-table locations survive a dropped catalog (fresh derby per
    // JVM) - clear them so saveAsTable can recreate
    import scala.reflect.io.Directory
    Seq("orders_b", "lineitem_b").foreach { t =>
      new Directory(new java.io.File(s"spark-warehouse/$t")).deleteRecursively()
    }
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum(col("l_quantity")).as("q"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must not introduce an exchange on either side
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"), plan)
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey")
      && !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle the join keys:\n$plan")

    // and the result equals the unbucketed join
    val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum(col("l_quantity")).as("q"))
    assert(joined.exceptAll(plain).count() == 0 && plain.exceptAll(joined).count() == 0)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
  }
}
