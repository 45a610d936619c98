package graft.tools

import graft.engine.{GraftSession, Tables}

/** Throwaway smoke probe: confirm every testdata table loads and events'
  * nanosecond timestamps normalize. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    Tables.names.foreach { n =>
      val df = Tables.table(spark, dir, n)
      println(s"== $n rows=${df.count()}")
      df.printSchema()
    }
    Tables.table(spark, dir, "events").show(3, false)
    spark.stop()
  }
}
