package graft.tools

/** Throwaway: choose the md5 salt for the 16-bit-uniform LSH planes —
  * recall vs exact top-5 (the DedupSpec gate) and candidate volume,
  * computed driver-side over the tiny sf0.001 embeddings for a range of
  * salts. The salt plays the role the old Gaussian planes' seed 7
  * played: a documented, committed draw from the family. */
object ProbeSalt {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val rows = graft.engine.Tables.table(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    val n = rows.length
    val ids = rows.map(_._1)
    val vecs = rows.map(_._2)
    val vn = vecs.map(_.map(x =>
      graft.queries.VectorOps.rndAway(x.toDouble * 1e6)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // exact top-5 per probe (vec_id < 10)
    val probes = ids.zipWithIndex.filter(_._1 < 10)
    val exact = probes.flatMap { case (pid, pi) =>
      ids.indices.filter(ci => ids(ci) != pid)
        .map(ci => (ids(ci), cos(vecs(pi), vecs(ci))))
        .sortBy { case (cid, c) => (-c, cid) }.take(5)
        .map { case (cid, _) => (pid, cid) }
    }.toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    for (salt <- 0 until args.drop(1).headOption.map(_.toInt).getOrElse(24)) {
      val planes = Array.tabulate(64, 8, 64) { (t, b, i) =>
        val d = md.digest(s"$salt:${t}_${b}_$i".getBytes("UTF-8"))
        2 * (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)) - 65535
      }
      val buckets = vn.map { v =>
        planes.map { tbl =>
          var b = 0L; var j = 0
          while (j < 8) {
            var d = 0L; var k = 0
            while (k < 64) { d += tbl(j)(k) * v(k); k += 1 }
            if (d >= 0) b |= (1L << j); j += 1
          }
          b
        }
      }
      val cand = probes.map { case (pid, pi) =>
        val cs = ids.indices.filter(ci => ids(ci) != pid &&
          (0 until 64).exists(t => buckets(pi)(t) == buckets(ci)(t)))
        pid -> cs
      }
      val maxTouch = cand.map(_._2.size).max.toDouble / n
      val ann = cand.flatMap { case (pid, cs) =>
        val pi = ids.indexOf(pid)
        cs.map(ci => (ids(ci), cos(vecs(pi), vecs(ci))))
          .sortBy { case (cid, c) => (-c, cid) }.take(5)
          .map { case (cid, _) => (pid, cid) }
      }.toSet
      val recall = (exact & ann).size.toDouble / exact.size
      println(f"[salt] $salt%2d recall=$recall%.2f maxTouch=${maxTouch * 100}%.1f%%")
    }
    spark.stop()
  }
}
