package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.{GraftSession, Tables}

/** Empty-input battery (VERDICT r9 item 4): runs every declared query
  * against a SCHEMA-ONLY dataset (each table 0 rows, exact production
  * schema) and reports, per query, either `OK rows=N nulls=M` or the
  * exception. The round-9 advisor found a real NULL-on-empty-aggregate
  * bug (q88's sum over an empty edge set) by READING — this probe and
  * the [[graft.EmptyInputSpec]] it feeds make the whole class
  * mechanical: a query that NPEs on a 0-row fixture here would NPE on a
  * 100 TB pipeline's first empty partition-day, and a NULL that leaks
  * from an empty aggregate poisons every downstream consumer.
  */
object ProbeEmpty {

  /** Writes the schema-only fixture (idempotent): each table is the
    * sf0.001 table's NORMALIZED frame (Tables.table applies the
    * ts/date/embedding type folds) limited to 0 rows, so the empty dir
    * exercises exactly the schemas production queries bind to. */
  def ensureFixture(spark: SparkSession, out: String,
      src: String = "/root/testdata/sf0.001"): Unit = {
    val done = new java.io.File(out, "_FIXTURE_OK")
    if (done.isFile) return
    Tables.names.foreach { n =>
      Tables.table(spark, src, n).limit(0)
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    java.nio.file.Files.write(done.toPath, Array.empty[Byte])
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft_empty"
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    ensureFixture(spark, out)
    val selected =
      if (args.length > 1) graft.SparkEntry.queries.view.filterKeys(args.drop(1).toSet).toMap
      else graft.SparkEntry.queries
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val line = try {
        val df = fn(spark, out)
        val rows = df.collect()
        val nullCols = rows.iterator.flatMap(r =>
          (0 until r.length).filter(r.isNullAt).map(df.columns)).toSet
        s"OK rows=${rows.length} nulls=${nullCols.toSeq.sorted.mkString(",")}"
      } catch {
        case e: Throwable =>
          s"FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).replace('\n', ' ').take(160)}"
      }
      println(s"$name\t$line")
    }
    spark.stop()
  }
}
