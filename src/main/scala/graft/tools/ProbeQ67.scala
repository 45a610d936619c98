package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{cround, dsum}

/** Phase decomposition + A/B for q67's LM-scoring pipeline: the current
  * shape tokenizes the corpus 4x (bg-for-join, bg->c1, bg->c2, vocab).
  * c1 is algebraically derivable from c2 — c(w1,.) = sum_w2 c(w1,w2) —
  * which drops one full tokenize+explode+shuffle pass. Alternates
  * baseline vs rollup variant in one JVM, min-of-N, CPU-accounted. */
object ProbeQ67 {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpu = new java.util.concurrent.atomic.AtomicLong(0)
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach(m => cpu.addAndGet(m.executorCpuTime))
    })
    def time(tag: String)(mk: => DataFrame): Unit = {
      s.sparkContext.setJobDescription(s"q67 $tag")
      val c0 = cpu.get; val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[q67] $tag%-14s wall $dt%6.2f s cpu ${(cpu.get - c0) / 1e9}%6.2f s")
    }
    val norm = expr(graft.queries.Pipeline.normExprStr)
    def docs = graft.engine.Tables.table(s, dir, "documents")
    def tok = docs.select(col("doc_id"), split(norm, " ").as("a")).filter(size(col("a")) >= 2)
    def bg = tok.select(col("doc_id"),
        explode(expr("transform(sequence(0, size(a) - 2), i -> struct(a[i] AS w1, a[i + 1] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    def vdf = docs.select(explode(split(norm, " ")).as("w")).agg(count_distinct(col("w")).as("v"))
    def score(c1: DataFrame): DataFrame = {
      val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val model = c2.join(c1, col("w1") === col("w")).crossJoin(broadcast(vdf))
        .select(col("w1"), col("w2"),
          cround(-log((col("c2") + 1) * lit(1.0) / (col("c1") + col("v"))), 6).as("nll"))
      bg.join(model, Seq("w1", "w2")).groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), dsum(col("nll"), 6).as("s"))
        .select(col("doc_id"), col("n_bigrams").cast("long").as("n_bigrams"),
          cround(col("s") / col("n_bigrams")).as("avg_nll"))
    }
    def scoreRollup: DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("w1")
      val model = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        .withColumn("c1", sum(col("c2")).over(w))
        .crossJoin(broadcast(vdf))
        .select(col("w1"), col("w2"),
          cround(-log((col("c2") + 1) * lit(1.0) / (col("c1") + col("v"))), 6).as("nll"))
      bg.join(model, Seq("w1", "w2")).groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), dsum(col("nll"), 6).as("s"))
        .select(col("doc_id"), col("n_bigrams").cast("long").as("n_bigrams"),
          cround(col("s") / col("n_bigrams")).as("avg_nll"))
    }
    // phases once
    time("tok")(tok)
    time("bg")(bg)
    time("c2")(bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2")))
    time("c1-corpus")(bg.groupBy(col("w1").as("w")).agg(count(lit(1)).as("c1")))
    time("vocab")(vdf)
    (1 to 3).foreach { i =>
      time(s"base$i")(score(bg.groupBy(col("w1").as("w")).agg(count(lit(1)).as("c1"))).orderBy("doc_id"))
      time(s"rollup$i")(scoreRollup.orderBy("doc_id"))
    }
    s.stop()
  }
}
