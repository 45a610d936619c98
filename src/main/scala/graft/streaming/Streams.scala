package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

import graft.queries.dsum

/** Structured Streaming surface (SURVEY.md §2.9): the same declarative
  * expressions as the EventOps batch queries, applied to an unbounded
  * source. Each transform takes whatever DataFrame it is given — a
  * parquet batch or a readStream/MemoryStream — identically; the ScalaTest
  * suite asserts batch ≡ stream on the events fixture.
  *
  * Watermarks bound state: windows older than the watermark are finalized
  * and their state evicted, which is what makes these aggregations run
  * indefinitely on a cluster (state size ∝ active windows, not history).
  */
object Streams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Doc(doc_id: Long, text: String)

  /** Q19 streaming form — tumbling 1 h window per event type. */
  def tumblingHour(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Q20 streaming form — 30 min session windows per user. */
  def sessionize(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("sess_start_us"),
        col("n"), col("sum_value"))
  }

  /** Q19b streaming form — sliding window (1 h length, 15 min slide).
    * count(DISTINCT) is unsupported in streaming aggregations, so the
    * streaming twin carries count + exact decimal sum; the batch q19b
    * keeps its n_users column for the SQL oracle. For the user count see
    * [[slidingQuarterApprox]]. */
  def slidingQuarter(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_us"), col("n"), col("sum_value"))
  }

  /** Q19b streaming form WITH the per-window user count: exact
    * count(DISTINCT) cannot run incrementally (its state would be every
    * user id per open window), but HyperLogLog++ partials merge, so
    * `approx_count_distinct` streams fine with bounded state — the
    * standard scale trade for distinct counts over unbounded input.
    * rsd 2%; StreamsSpec asserts every window lands within 10% of the
    * batch-exact n_users. */
  def slidingQuarterApprox(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("n_users_approx"))
      .select(unix_micros(col("window.start")).as("win_us"), col("n"),
        col("sum_value"), col("n_users_approx"))
  }

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks within the preceding hour. Both sides carry
    * watermarks, so Spark evicts join state whose event time can no
    * longer match (state ∝ the 2-hour window, not history) — the
    * property that lets two unbounded streams join forever. The same
    * expression runs in batch (withWatermark is a no-op there);
    * StreamsSpec asserts batch ≡ stream. */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"),
        col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
  }

  /** Stateful streaming dedup on event_id; state for ids older than the
    * watermark is dropped (dropDuplicatesWithinWatermark). */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Streaming corpus decontamination (the streaming face of
    * Pipeline.q47b): drop incoming documents that share ANY word trigram
    * with the held-out eval set. The Bloom blob is computed once from the
    * static eval corpus (kilobytes of "model state") and applied as a
    * stateless per-row filter — the standard stream-vs-static-enrichment
    * pattern: no join, no state store, no watermark; each micro-batch
    * filters independently at full parallelism. Bloom false positives
    * only ever DROP extra docs (conservative for decontamination); false
    * negatives cannot occur. */
  /** Streaming MinHash-LSH near-dup dedup via foreachBatch — the
    * production pattern for cross-batch near-dup state: per micro-batch,
    * band the incoming docs with EXACTLY the q26 bucketing
    * (TextOps.bandedOf over TextOps.shinglesOf), drop any doc whose
    * bucket was occupied by an earlier doc — earlier batch, or a
    * lower-doc_id row of the same batch — then append the batch's
    * buckets to the parquet-backed seen-store and the survivors to the
    * output. Dropped docs' buckets are recorded too (the conservative
    * policy: a near-dup of a dropped doc is also a near-dup of what got
    * it dropped, transitively through the shared bucket).
    *
    * State lives in a parquet directory, not the state store: band
    * buckets are append-only long pairs, the per-batch check is one
    * left-anti-shaped join per batch at full parallelism, and the store
    * compacts/naturally partitions like any table — the same shape
    * scales to a 100 TB corpus where per-key state-store entries would
    * not. At-least-once on replay (idempotent store appends dedup via
    * the bucket join).
    *
    * Returns the started query; stop it via the handle. */
  def startNearDupDedup(docs: DataFrame, storeDir: String, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.queries.TextOps
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        val bands = TextOps.bandedOf(TextOps.shinglesOf(b)).persist()
        try {
          val storePath = new org.apache.hadoop.fs.Path(storeDir)
          val fs = storePath.getFileSystem(spark.sessionState.newHadoopConf())
          // explicit schema: a replay after a failed first append sees an
          // existing dir with zero committed files, where schema
          // inference would throw and crash-loop the stream; it also
          // skips per-batch footer inference
          val store = if (fs.exists(storePath))
            spark.read.schema("band INT, bh BIGINT").parquet(storeDir)
          else spark.emptyDataFrame
              .withColumn("band", lit(0)).withColumn("bh", lit(0L)).limit(0)
          // no distinct on the store: left_semi ignores duplicate build
          // keys, and a per-batch full-store dedup shuffle would grow
          // with the corpus
          val seenHit = bands.join(store.select("band", "bh"), Seq("band", "bh"), "left_semi")
          val intraFirst = bands.groupBy("band", "bh").agg(min(col("doc_id")).as("first_id"))
          val intraHit = bands.join(intraFirst, Seq("band", "bh"))
            .filter(col("doc_id") > col("first_id"))
          val droppedIds = seenHit.select("doc_id")
            .unionAll(intraHit.select("doc_id")).distinct()
          val survivors = b.join(droppedIds, Seq("doc_id"), "left_anti")
          survivors.write.mode("append").parquet(outDir)
          bands.select("band", "bh").write.mode("append").parquet(storeDir)
          ()
        } finally { bands.unpersist(); b.unpersist() }
      }
      .start()
  }

  def decontaminate(docs: DataFrame, evalBloom: Array[Byte]): DataFrame =
    // an empty eval set has nothing to contaminate: its bloom blob is NULL
    // (aggregate over zero rows), and filtering against it must keep every
    // doc, not silently drop the corpus
    if (evalBloom == null) docs
    else docs
      // norm + gram definitions are shared with batch q47/q47b
      // (Pipeline.normExprStr / trigramHashExpr) so the streaming filter
      // can't silently drift from the contamination check it mirrors
      .withColumn("a", split(expr(graft.queries.Pipeline.normExprStr), " "))
      .withColumn("gs", expr(graft.queries.Pipeline.trigramHashExpr))
      // coalesce keeps NULL-text rows: split/transform of NULL makes gs
      // NULL and !exists(NULL) is NULL — batch q47 treats gram-less docs
      // as uncontaminated, so the stream filter must too
      .filter(coalesce(
        !exists(col("gs"), g => call_function("graft_bloom_contains", lit(evalBloom), g)),
        lit(true)))
      .drop("a", "gs")

  final case class UserStats(user_id: Long, n: Long, total: Double, last_us: Long)

  final case class SessionState(start_us: Long, last_us: Long, n: Long)
  final case class Session(user_id: Long, sess_start_us: Long, n: Long, closed: Boolean)

  /** Custom sessionizer via flatMapGroupsWithState with event-time
    * timeout: sessions are held in keyed state and emitted once the
    * watermark passes their gap (closed = true), so state stays bounded
    * by *active* sessions — the property that lets this run forever on a
    * cluster. Gap semantics identical to session_window (merge iff
    * diff < gap). */
  def sessionizeWithState(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // watermark passed: every open session is final
            val out = state.getOption.getOrElse(Nil)
              .map(s => Session(uid, s.start_us, s.n, closed = true))
            state.remove()
            out.iterator
          } else {
            // merge the batch into the open session set (sorted replay)
            val sorted = batch.toSeq.map(e => e.ts.getTime * 1000L + (e.ts.getNanos % 1000000) / 1000L).sorted
            var sessions = state.getOption.getOrElse(Nil)
            sorted.foreach { us =>
              sessions.find(s => us > s.start_us - gapUs && us < s.last_us + gapUs) match {
                case Some(s) =>
                  sessions = SessionState(math.min(s.start_us, us),
                    math.max(s.last_us, us), s.n + 1) :: sessions.filterNot(_ == s)
                case None =>
                  sessions = SessionState(us, us, 1L) :: sessions
              }
            }
            // coalesce sessions that grew into each other
            val merged = sessions.sortBy(_.start_us).foldLeft(List.empty[SessionState]) {
              case (acc @ (h :: t), s) if s.start_us < h.last_us + gapUs =>
                SessionState(h.start_us, math.max(h.last_us, s.last_us), h.n + s.n) :: t
              case (acc, s) => s :: acc
            }.reverse
            // a group that keeps receiving data never times out, so closed
            // sessions are evicted here: anything whose gap window ended
            // before the current watermark is final
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (done, open) = merged.partition(s => s.last_us + gapUs < wmUs)
            if (open.isEmpty) state.remove()
            else {
              state.update(open)
              state.setTimeoutTimestamp(open.map(_.last_us / 1000L).max + gapMinutes * 60L * 1000L)
            }
            done.map(s => Session(uid, s.start_us, s.n, closed = true)).iterator
          }
      }
  }

  /** Custom keyed state via mapGroupsWithState: running per-user count /
    * sum / last-seen. Emits the updated state each micro-batch (Update
    * mode); the test asserts the final state equals the batch aggregate. */
  def userStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats] {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0, Long.MinValue))
          val upd = batch.foldLeft(prev) { (acc, e) =>
            UserStats(uid, acc.n + 1,
              // decimal-cents accumulation keeps the running sum exact
              (BigDecimal(acc.total) + BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP)).toDouble,
              math.max(acc.last_us,
              e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000L))
          }
          state.update(upd)
          upd
      }
  }
}
