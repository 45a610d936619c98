package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.queries.Layout

/** Gates for the corpus-layout surface (q74/q75/q76): plan-shape pins
  * for the scale claims the scaladocs make, plus brute-force semantic
  * recomputations of each operator's contract. */
class LayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def plan(q: graft.queries.Query): String =
    q.fn(spark, dir).queryExecution.explainString(ExplainMode.fromString("formatted"))

  // ---- q74 priority sampling -------------------------------------------

  test("q74 plans a map-side WindowGroupLimit and a single data exchange") {
    val p = plan(Layout.q74_priority_sample)
    val tree = p.split("\n\n").head
    // partial (pre-shuffle) group limit: a WindowGroupLimit must appear
    // BELOW the first Exchange in the tree (tree prints top-down, so the
    // map-side copy is the LAST WindowGroupLimit line)
    val lines = tree.linesIterator.toSeq
    val lastLimit = lines.lastIndexWhere(_.contains("WindowGroupLimit"))
    val lastExchange = lines.lastIndexWhere(l => l.contains("Exchange") && !l.contains("Broadcast"))
    assert(lastLimit >= 0, s"no WindowGroupLimit in plan:\n$tree")
    assert(lastLimit > lastExchange, s"group limit is not map-side:\n$tree")
    // single-pass tau: one corpus scan, and the only exchanges are the
    // rank shuffle + the output orderBy
    assert("Scan parquet".r.findAllIn(tree).length == 1, s"expected one scan:\n$tree")
    assert("Exchange".r.findAllIn(tree).length == 2, s"expected 2 exchanges:\n$tree")
  }

  test("q74 sample equals the brute-force priority top-k and the estimator is max(w, tau)") {
    val K = 40
    val out = Layout.q74_priority_sample.fn(spark, dir).collect()
    // brute-force recomputation, per group, straight from the definition
    val docs = graft.engine.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr(s"CAST(2 * n_chars AS DOUBLE) / (2 * ${graft.queries.Pipeline.mixExpr("doc_id")} + 1)").as("pri"))
      .collect().map { r => (r.getString(1), r.getLong(0), r.getLong(2), r.getDouble(3)) }
    val byLang = docs.groupBy(_._1)
    val expected = byLang.toSeq.flatMap { case (lang, ds) =>
      val sorted = ds.sortBy { case (_, id, _, pri) => (-pri, id) }
      val tau = sorted.drop(K).headOption.map(_._4)
      sorted.take(K).zipWithIndex.map { case ((_, id, w, _), i) =>
        val est = math.floor(math.max(w.toDouble, tau.getOrElse(w.toDouble)) * 10000 + 0.5) / 10000
        (lang, i + 1, id, w, est)
      }
    }.toSet
    val got = out.map { r: Row =>
      (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)) }.toSet
    assert(got == expected)
    // every lang group is present and ranks are contiguous from 1
    byLang.foreach { case (lang, ds) =>
      val ranks = out.filter(_.getString(0) == lang).map(_.getInt(1)).sorted
      assert(ranks.sameElements(1 to math.min(K, ds.length)), s"$lang ranks: ${ranks.mkString(",")}")
    }
  }

  // ---- q75 z-order layout ----------------------------------------------

  test("q75 z-range buckets bound BOTH dimensions; the single-column control does not") {
    val rows = Layout.q75_zorder_layout.fn(spark, dir).collect()
    val (z, s1) = rows.partition(_.getString(0) == "zorder")
    assert(z.nonEmpty && s1.nonEmpty)
    // the 2^8 z-range fixes the top two bits of each 6-bit dim:
    // p_size confined to a 16-wide range, price to a 32-unit range
    z.foreach { r =>
      assert(r.getInt(5) <= 15, s"size_span ${r.getInt(5)} in z-bucket ${r.getInt(1)}")
      assert(r.getLong(8) <= 31, s"price_span ${r.getLong(8)} in z-bucket ${r.getInt(1)}")
    }
    // control: single-column sort bounds p_size but NOT price
    assert(s1.forall(_.getInt(5) <= 3), "size_only buckets must bound p_size")
    assert(s1.exists(_.getLong(8) > 31), "size_only control should span the price range")
    // both layouts partition the table: per-layout counts sum to |part|
    val n = graft.engine.Tables.table(spark, dir, "part").count()
    assert(z.map(_.getLong(2)).sum == n && s1.map(_.getLong(2)).sum == n)
  }

  test("q75 z-value is a pure per-row map: no exchange below the bucket aggregation") {
    val p = plan(Layout.q75_zorder_layout).split("\n\n").head
    // partial+final hash agg per layout leg, one shuffle each (+1 for the
    // output orderBy): any more would mean the map stage itself shuffled
    assert("Exchange".r.findAllIn(p).length <= 3, s"unexpected shuffles:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  // ---- q76 vocab encode ------------------------------------------------

  test("q76 id sequences decode back to the corpus: lengths, OOV counts, and id range hold") {
    val out = Layout.q76_vocab_encode.fn(spark, dir).collect()
    val docs = graft.engine.Tables.table(spark, dir, "documents").count()
    assert(out.length == docs, "every document must be encoded")
    out.foreach { r =>
      val nTok = r.getLong(1)
      val nOov = r.getLong(2)
      val ids = r.getString(3).split(",").map(_.toInt)
      assert(ids.length == nTok, s"doc ${r.getLong(0)}: ${ids.length} ids vs n_tok $nTok")
      assert(ids.count(_ == 0) == nOov, s"doc ${r.getLong(0)}: OOV accounting")
      assert(ids.forall(id => id >= 0 && id <= 24), s"doc ${r.getLong(0)}: id out of range")
    }
    // the cutoff is live at test scale: both vocab hits and OOV occur
    assert(out.map(_.getLong(2)).sum > 0, "no OOV tokens — V cutoff not exercised")
    assert(out.exists(r => r.getLong(2) < r.getLong(1)), "no in-vocab tokens")
  }

  // ---- q77 robust clipping ---------------------------------------------

  test("q77 matches a brute-force median/MAD/winsorize recomputation") {
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val rp = 0.5 * (s.length - 1)
      val lo = s(rp.toInt); val hi = s(math.ceil(rp).toInt)
      lo + (hi - lo) * (rp - rp.toInt)
    }
    val byLang = graft.engine.Tables.table(spark, dir, "documents")
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble)).groupBy(_._1)
    val out = Layout.q77_robust_clip.fn(spark, dir).collect()
    assert(out.map(_.getString(0)).toSet == byLang.keySet)
    out.foreach { r =>
      val xs = byLang(r.getString(0)).map(_._2).toSeq
      val med = median(xs); val mad = median(xs.map(x => math.abs(x - med)))
      val (lo1, hi1) = (med - mad * 1.4826, med + mad * 1.4826)
      val (lo3, hi3) = (med - mad * 4.4478, med + mad * 4.4478)
      assert(r.getLong(1) == xs.length)
      assert(math.abs(r.getDouble(2) - med) < 1e-9, s"${r.getString(0)} med")
      assert(math.abs(r.getDouble(3) - mad) < 1e-9, s"${r.getString(0)} mad")
      assert(r.getLong(4) == xs.count(_ < lo3), s"${r.getString(0)} n_low")
      assert(r.getLong(5) == xs.count(_ > hi3), s"${r.getString(0)} n_high")
      assert(r.getLong(6) == xs.count(x => x < lo1 || x > hi1), s"${r.getString(0)} n_winsorized")
      val wm = xs.map(x => math.max(lo1, math.min(hi1, x))).sum / xs.length
      assert(math.abs(r.getDouble(7) - wm) < 1e-3, s"${r.getString(0)} wins_mean")
      // the inner fence actually clips at test scale (else the winsorize
      // path is untested dead code)
      assert(r.getLong(6) > 0 || mad == 0, s"${r.getString(0)} inner fence never clips")
    }
  }

  test("q76 encode join broadcasts the bounded vocab") {
    val p = plan(Layout.q76_vocab_encode).split("\n\n").head
    assert(p.contains("BroadcastHashJoin"), s"vocab lookup must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"exploded corpus must not shuffle for the lookup:\n$p")
  }

  // ---- z-order WRITE path ----------------------------------------------

  test("z-order write: parquet footer stats prune files for a 2-D box; 1-D control cannot") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val nFiles = 16
    val ySql = "greatest(0, least(127, CAST(floor(p_retailprice) AS BIGINT) - 900))"
    val b = graft.engine.Tables.table(spark, dir, "part")
      .select(col("p_size").cast("long").as("x"), expr(ySql).as("y"))
    Layout.zorderWrite(b, expr(Layout.zVal("x", "y div 2", 6, "div")), nFiles, s"$tmp/z")
    // single-column control: same writer discipline, clustered on x only
    Layout.zorderWrite(b, col("x"), nFiles, s"$tmp/ctrl")

    /** Per-file (min,max) of columns x and y read from the REAL parquet
      * footers — exactly what a stats-pruning reader consults. */
    def footerBoxes(path: String): Seq[(Long, Long, Long, Long)] = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sessionState.newHadoopConf())
      fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .filter(_.getPath.getName.endsWith(".parquet")).toSeq.map { st =>
          val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
            st.getPath, spark.sessionState.newHadoopConf()))
          try {
            val cols = rd.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
            def mm(name: String): (Long, Long) = {
              val stats = cols.filter(_.getPath.toDotString == name).map(_.getStatistics)
              (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
               stats.map(_.genericGetMax.asInstanceOf[Long]).max)
            }
            val (x0, x1) = mm("x"); val (y0, y1) = mm("y")
            (x0, x1, y0, y1)
          } finally rd.close()
        }
    }
    // a box selective ONLY in the second dimension: every x, y <= 24
    def touched(boxes: Seq[(Long, Long, Long, Long)]): Int =
      boxes.count { case (_, _, y0, _) => y0 <= 24 }
    val zBoxes = footerBoxes(s"$tmp/z")
    val cBoxes = footerBoxes(s"$tmp/ctrl")
    assert(zBoxes.size == nFiles && cBoxes.size == nFiles)
    val (zt, ct) = (touched(zBoxes), touched(cBoxes))
    // 16 z-ranges fix the top two bits of each dim, so only the y-low
    // quadrant row of the curve can intersect y<=24 — at most half the
    // files; the x-clustered control bounds y nowhere, so ~all its files
    // intersect
    assert(zt <= nFiles / 2, s"z layout should prune, touched $zt of $nFiles")
    assert(ct >= nFiles - 2, s"control should NOT prune on y, touched $ct of $nFiles")
    assert(zt < ct, s"z layout must beat the 1-D control ($zt vs $ct)")
    // the layout is a reorganization, not a transformation: the box
    // query answers identically from both
    val full = b.filter(col("y") <= 24).count()
    assert(spark.read.parquet(s"$tmp/z").filter(col("y") <= 24).count() == full)
    assert(spark.read.parquet(s"$tmp/ctrl").filter(col("y") <= 24).count() == full)
  }
}
