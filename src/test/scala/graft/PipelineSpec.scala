package graft

import org.apache.spark.sql.functions._

import graft.queries.{Pipeline, TextOps}

/** Invariants for the training-data pipeline operators (SURVEY.md §2.12)
  * beyond their DuckDB oracles: the bloom prefilter's exactness, packing
  * accounting, split partitioning, and hash-arithmetic determinism. */
class PipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q47b bloom-prefiltered contamination equals exact q47") {
    val exact = Pipeline.q47_contamination.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Pipeline.q47b_contamination_bloom.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty, "fixture should contain contaminated pairs")
    // no false negatives in a bloom filter; false positives are dropped
    // by the exact join that follows — so equality, not containment
    assert(bloom == exact)
  }

  test("decontaminate drops every q47-contaminated train doc (gram parity)") {
    // pins the batch-vs-streaming gram definition: every train doc that
    // q47 reports as contaminated shares >= 3 rare eval grams, each of
    // which is in the bloom blob — so the decontamination filter MUST
    // drop it. A drift in either side's normalization or trigram
    // construction breaks this containment.
    val blob = Pipeline.evalBloomBlob(spark, dir)
    val kept = graft.streaming.Streams.decontaminate(
        engine.Tables.table(spark, dir, "documents").select("doc_id", "text"), blob)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = Pipeline.q47_contamination.fn(spark, dir)
      .select("train_id").collect().map(_.getLong(0)).toSet
    assert(contaminated.nonEmpty, "fixture should contain contaminated train docs")
    assert((contaminated & kept).isEmpty,
      s"contaminated train docs survived the filter: ${(contaminated & kept).toSeq.sorted}")
  }

  test("decontaminate keeps NULL-text docs and a NULL (empty-eval) blob keeps all") {
    import spark.implicits._
    val blob = Pipeline.evalBloomBlob(spark, dir)
    // NULL text => NULL gram array => the filter predicate is NULL; batch
    // q47 treats gram-less docs as uncontaminated, so the row must SURVIVE
    val weird = Seq((1L, null.asInstanceOf[String]), (2L, "xy"), (3L, ""))
      .toDF("doc_id", "text")
    val kept = graft.streaming.Streams.decontaminate(weird, blob)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L), s"gram-less docs must be kept, got $kept")
    // an empty eval set aggregates to a NULL bloom blob — that means
    // "nothing to decontaminate", never "drop everything"
    val docs = engine.Tables.table(spark, dir, "documents").select("doc_id", "text")
    assert(graft.streaming.Streams.decontaminate(docs, null).count() == docs.count())
  }

  test("q48 packing accounts for every document and token exactly once") {
    val docs = engine.Tables.table(spark, dir, "documents")
    val nDocs = docs.count()
    val nTokens = docs
      .select(size(split(expr(Pipeline.normExprStr), " ")).cast("long").as("ntok"))
      .agg(sum("ntok")).head().getLong(0)
    val packs = Pipeline.q48_chunk_pack.fn(spark, dir)
      .agg(sum("n_docs").as("d"), sum("n_tokens").as("t")).head()
    assert(packs.getLong(0) == nDocs, "every doc lands in exactly one pack")
    assert(packs.getLong(1) == nTokens, "every token is packed exactly once")
  }

  test("q48 pack ids start at zero and stay within the shard's token budget") {
    // NOT asserting density: a doc spanning multiple 256-token chunk
    // boundaries legitimately leaves pack-id gaps (it belongs to the
    // pack where it starts). The real invariants: ids start at 0, never
    // exceed the shard's total token count / capacity, and every pack
    // holds at least one doc and one token.
    val byShard = Pipeline.q48_chunk_pack.fn(spark, dir)
      .select("shard", "pack_id", "n_docs", "n_tokens").collect()
      .map(r => (r.getInt(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toList)
    byShard.foreach { case (shard, packs) =>
      val ids = packs.map(_._1)
      val shardTokens = packs.map(_._3).sum
      assert(ids.min == 0, s"shard $shard first pack must be 0")
      assert(ids.distinct.size == ids.size, s"shard $shard duplicate pack ids")
      assert(ids.max <= shardTokens / 256,
        s"shard $shard pack id ${ids.max} beyond token budget $shardTokens")
      packs.foreach { case (id, d, t) =>
        assert(d >= 1 && t >= 1, s"shard $shard pack $id empty")
      }
    }
  }

  test("q48b spans tile every pack exactly and account for every token") {
    val spans = Pipeline.q48b_pack_spans.fn(spark, dir)
      .select("shard", "pack_id", "doc_id", "off_tok", "len_tok").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.nonEmpty)
    // per-doc accounting: a doc's slices sum to its token count, so
    // splitting across chunk boundaries loses and invents nothing
    val docTokens = engine.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), size(split(expr(Pipeline.normExprStr), " ")).cast("long").as("ntok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perDoc = spans.groupBy(_._3).view.mapValues(_.map(_._5).sum)
    assert(perDoc.toMap == docTokens, "every token lands in exactly one span")
    assert(spans.exists(s => s._4 > 0),
      "fixture must contain docs split across a chunk boundary")
    // per-pack tiling: within each (shard, pack), slices start at 0,
    // are contiguous, and full packs (every pack but the shard's last)
    // hold exactly 256 tokens
    spans.groupBy(s => (s._1, s._2)).foreach { case ((shard, pack), ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._4 == 0, s"pack ($shard,$pack) must start at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 + a._5 == b._4, s"pack ($shard,$pack) has a gap or overlap")
        case _ =>
      }
    }
    val lastPackPerShard = spans.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    spans.groupBy(s => (s._1, s._2)).foreach { case ((shard, pack), ss) =>
      if (pack < lastPackPerShard(shard))
        assert(ss.map(_._5).sum == 256L, s"full pack ($shard,$pack) must hold exactly 256 tokens")
      else
        assert(ss.map(_._5).sum <= 256L, s"tail pack ($shard,$pack) must fit the chunk size")
    }
    // consistency with q48: per (shard, pack), the docs whose FIRST
    // slice lands there are exactly q48's n_docs (q48 assigns each doc
    // to the pack it starts in)
    val startCounts = spans.groupBy(_._3).values
      .map(_.minBy(_._2)).toSeq
      .groupBy(s => (s._1, s._2)).view.mapValues(_.size.toLong).toMap
    val q48Counts = Pipeline.q48_chunk_pack.fn(spark, dir)
      .select("shard", "pack_id", "n_docs").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(startCounts == q48Counts,
      "q48b first-slice packs must reproduce q48's start-pack accounting")
  }

  test("q49 splits partition the corpus near the 90/5/5 target") {
    val docs = engine.Tables.table(spark, dir, "documents")
    val total = docs.count()
    val bySplit = Pipeline.q49_split_assign.fn(spark, dir)
      .groupBy("split").agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == total, "splits must partition the corpus")
    // multiplicative-hash buckets are near-uniform; allow a wide margin
    // on a 500-doc fixture (binomial sd of train is ~6.7 docs)
    val train = bySplit("train").toDouble / total
    assert(train > 0.84 && train < 0.96, s"train share $train far from 0.90")
  }

  test("q49 split counts match a driver-side recomputation of the hash") {
    // the splitter is pure BIGINT arithmetic on doc_id — recompute it
    // independently in Scala and compare per-(split, lang) doc counts, so
    // an engine-side precedence or overflow slip can't pass unnoticed
    def split(docId: Long): String = {
      // same 16-bit-split modular multiply as Pipeline.mixExpr — the
      // direct product would overflow Long for keys >= ~3.47e9
      val a = docId % 65536L
      val b = (docId / 65536L) % 65536L
      val h = (a * 2654435761L + (b * 2654435761L % 65536L) * 65536L) % 4294967296L
      val bucket = (h / 65536L) % 100L
      if (bucket < 90) "train" else if (bucket < 95) "val" else "test"
    }
    val expected = engine.Tables.table(spark, dir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (split(r.getLong(0)), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Pipeline.q49_split_assign.fn(spark, dir)
      .select("split", "lang", "n_docs").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("q52 mixing weights are a valid sampling plan") {
    val rows = Pipeline.q52_mixture_weights.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-3, s"natural shares must sum to ~1: ${shares.sum}")
    rows.foreach { r =>
      val (nTokens, rate, expTokens) = (r.getLong(2), r.getDouble(4), r.getLong(5))
      assert(rate > 0.0 && rate <= 1.0, s"rate $rate out of (0, 1]")
      assert(expTokens <= nTokens, "a capped rate can never up-sample")
      assert(math.abs(expTokens - nTokens * rate) <= 1.0, "expected tokens = floor(tokens * rate)")
    }
  }

  test("q63 curation keeps exactly floor(cnt/4) per source and never keeps worse than it drops") {
    val all = TextOps.q22_quality_score.fn(spark, dir)
      .join(graft.engine.Tables.table(spark, dir, "documents").select("doc_id", "source"), "doc_id")
      .select("source", "doc_id", "quality").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val kept = TextOps.q63_quality_curation.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(kept.nonEmpty, "curation must keep something on a 500-doc fixture")
    // q63's quality must BE q22's quality (shared signal frame)
    val q22Of = all.map(t => (t._1, t._2) -> t._3).toMap
    kept.foreach { case (src, id, q, _) => assert(q22Of((src, id)) == q) }
    val bySource = all.groupBy(_._1)
    val keptBySource = kept.groupBy(_._1)
    bySource.foreach { case (src, docs) =>
      val k = keptBySource.getOrElse(src, Array.empty).toSeq
      assert(k.size == docs.length / 4, s"$src: kept ${k.size} of ${docs.length}")
      if (k.nonEmpty) {
        // top-quarter cut: the worst kept quality dominates every dropped one
        val keptIds = k.map(_._2).toSet
        val minKept = k.map(_._3).min
        val maxDropped = docs.filterNot(d => keptIds(d._2)).map(_._3).max
        assert(minKept >= maxDropped - 1e-12,
          s"$src: kept quality $minKept below dropped $maxDropped")
        // ranks are dense 1..k
        assert(k.map(_._4).sorted == (1 to k.size), s"$src: ranks not dense")
      }
    }
  }

  test("q55 shuffle-shard is a permutation: dense positions per shard, visibly not id-ordered") {
    val rows = Pipeline.q55_shuffle_shard.fn(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.engine.Tables.table(spark, dir, "documents").count()
    assert(rows.length == nDocs, "every doc appears exactly once")
    assert(rows.map(_._3).distinct.length == rows.length)
    // positions are 1..count(shard), dense, within each shard
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, s"shard $shard positions not dense")
    }
    // the visit order must actually shuffle: within some shard, doc_ids by
    // position are not monotone (a sorted-by-id "shuffle" is no shuffle)
    val shuffled = rows.groupBy(_._1).values.exists { rs =>
      val ids = rs.sortBy(_._2).map(_._3).toSeq
      ids != ids.sorted
    }
    assert(shuffled, "doc_ids follow id order inside every shard — hash is not mixing")
  }

  test("q50 masking accounting is internally consistent") {
    val r = Pipeline.q50_pii_mask.fn(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val nEvents = row.getLong(1)
      val nRuns = row.getLong(2)
      val nChars = row.getLong(3)
      val nDistinct = row.getLong(4)
      assert(nRuns >= nEvents, "props fixture has at least one digit run per event")
      assert(nChars >= nRuns, "each masked run is at least one char")
      assert(nDistinct >= 1L && nDistinct <= nEvents)
    }
  }

  test("q65 bucketed prefix sum equals the naive global-window cumsum") {
    import org.apache.spark.sql.expressions.Window
    val out = Pipeline.q65_token_shard.fn(spark, dir)
      .collect().map(r => (r.getLong(2), r.getInt(0), r.getLong(1))).toSet
    // the serial-order reference: one global window (fine on a 500-row
    // test fixture; the production path is exactly what it must avoid)
    val d = engine.Tables.table(spark, dir, "documents").select(col("doc_id"),
      expr(graft.queries.Pipeline.mixExpr("doc_id")).as("h"),
      size(split(expr(graft.queries.Pipeline.normExprStr), " ")).cast("long").as("ntok"))
    val w = Window.orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = d.withColumn("cum", coalesce(sum(col("ntok")).over(w), lit(0L)))
      .select(col("doc_id"), (col("cum") / 2048).cast("int").as("shard"),
        (col("cum") % 2048).as("off"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == naive)
  }

  test("q65 shards are contiguous, budget-bounded, and conserve tokens") {
    val rows = Pipeline.q65_token_shard.fn(spark, dir).collect()
    val total = engine.Tables.table(spark, dir, "documents")
      .select(size(split(expr(graft.queries.Pipeline.normExprStr), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(rows.map(_.getLong(3)).sum == total, "every token lands in exactly one shard")
    val shards = rows.map(_.getInt(0)).distinct.sorted
    assert(shards.toSeq == shards.indices.toSeq, "shard ids are dense from 0")
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 2048),
      "every start offset is inside the token budget")
  }

  test("q66 upsert actions partition the merged id space correctly") {
    val rows = Pipeline.q66_corpus_upsert.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ids = engine.Tables.table(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // merged output covers the snapshot ∪ batch id space exactly once
    assert(rows.map(_._1).toSet == ids && rows.length == ids.size)
    val byAction = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byAction.keySet == Set("insert", "update", "noop", "keep"),
      s"all four merge actions must occur on the fixture: ${byAction.keySet}")
    // inserts are EXACTLY the ids absent from the snapshot
    assert(byAction("insert") == ids.filter(_ % 10 == 9))
    // updates are exactly the revised re-crawls (even => text changed),
    // noops the byte-identical ones — both restricted to snapshot ids
    val recrawl = ids.filter(id => id % 3 == 0 && id % 10 != 9)
    assert(byAction("update") == recrawl.filter(_ % 2 == 0))
    assert(byAction("noop") == recrawl.filter(_ % 2 != 0))
    assert(byAction("keep") == ids -- byAction("insert") -- recrawl)
  }

  test("q67 LM scores are finite, positive, and count every bigram") {
    val rows = Pipeline.q67_lm_score.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ntok = engine.Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(expr(graft.queries.Pipeline.normExprStr), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.nonEmpty)
    // exactly the >=2-token docs are scored, each with n-1 bigrams: the
    // scoring join lost no bigram (the model covers every corpus bigram
    // by construction — it was trained on the same stream)
    assert(rows.map(_._1).toSet == ntok.filter(_._2 >= 2).keySet)
    assert(rows.forall { case (id, nb, _) => nb == ntok(id) - 1 })
    // add-one smoothing keeps every probability in (0, 1) strictly:
    // c2 + 1 < c1 + V always (V counts at least the two words of any
    // bigram), so nll > 0 and finite
    assert(rows.forall { case (_, _, s) => s > 0 && !s.isNaN && !s.isInfinite })
  }

  test("q64 DSIR top-20 is score-ordered and enriched in target-domain docs") {
    val rows = Pipeline.q64_dsir_score.fn(spark, dir).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "descending scores")
    val targets = Set("src0", "src1", "src2", "src3")
    val nTarget = rows.count(r => targets(r.getString(1)))
    // targets are 4/20 sources (= 4 expected at random in the top 20);
    // the importance score must visibly concentrate them
    assert(nTarget >= 6, s"only $nTarget/20 top docs from the target domain")
  }

  test("q71 curation assigns every planted disposition correctly") {
    import spark.implicits._
    // 26 docs, ids 0..25; cut = 26*96 div 100 = 24, so docs 24-25 are
    // eval. Every doc is built to PASS the q58 quality gate (20 distinct
    // ~4-letter words incl 'the') unless planted otherwise.
    def sentence(seed: Int): String = {
      val ws = (0 until 19).map(i => f"w$seed%02d${('a' + i % 26).toChar}")
      (ws.take(10) :+ "the").++(ws.drop(10)).mkString(" ")
    }
    val base = sentence(90)
    val contamRun = "zulu yank xray wolf vict"
    val contamDoc = (contamRun.split(" ") ++
      (0 until 14).map(i => f"c${('a' + i).toChar}ab") :+ "the").mkString(" ")
    val evalDoc = (contamRun.split(" ") ++
      (0 until 14).map(i => f"e${('a' + i).toChar}cd") :+ "the").mkString(" ")
    // substring-dup pair: a shared 20-token run R (one full window) plus
    // 5 unique tokens each — 20/25 = 0.8 >= tau duplicated-token
    // fraction, while char-5-gram jaccard stays well under 0.8 so the
    // pair is NOT a near-dup (the stage must fire on its own)
    val runR = ((0 until 19).map(i =>
      f"rr${('a' + i % 26).toChar}${('a' + (i * 7) % 26).toChar}") :+ "the").mkString(" ")
    val subA = (0 until 5).map(i => s"u22${('a' + i).toChar}").mkString(" ") + " " + runR
    val subB = runR + " " + (0 until 5).map(i => s"v23${('a' + i).toChar}").mkString(" ")
    val rows =
      Seq((0L, base), (1L, base), (2L, base.dropRight(1) + "z"), // exact dup + near dup of 0
        (3L, contamDoc), (4L, "aa aa aa")) ++                    // contaminated, too short
        (5L to 21L).map(i => (i, sentence(i.toInt))) ++
        Seq((22L, subA), (23L, subB), (24L, evalDoc), (25L, sentence(85)))
    val tmp = java.nio.file.Files.createTempDirectory("curate").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Pipeline.q71_curate_corpus.fn(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    assert(got(24L)._1 == "eval_holdout")
    assert(got(25L)._1 == "eval_holdout")
    assert(got(1L)._1 == "dup_exact", s"doc1: ${got(1L)}")
    assert(got(2L)._1 == "dup_near", s"doc2: ${got(2L)}")
    assert(got(22L)._1 == "dup_substring", s"doc22: ${got(22L)}")
    assert(got(23L)._1 == "dup_substring", s"doc23: ${got(23L)}")
    assert(got(3L)._1 == "contaminated", s"doc3: ${got(3L)}")
    assert(got(4L)._1 == "low_quality", s"doc4: ${got(4L)}")
    // doc0 stays kept: its dropped exact/near copies are OUT of the
    // substring-dup scope, so their shared window can't flag the keeper
    assert(got(0L)._1 == "kept", s"doc0 (the keeper): ${got(0L)}")
    (5L to 21L).foreach(i => assert(got(i)._1 == "kept", s"filler $i: ${got(i)}"))
    // split present exactly on kept docs
    got.foreach { case (id, (status, split)) =>
      assert(split.isDefined == (status == "kept"), s"$id: $status/$split")
    }
  }

  test("q68 chunks tile each doc: stride-24 offsets, full coverage, exact reassembly") {
    val chunks = Pipeline.q68_chunk_overlap.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val docs = engine.Tables.table(spark, dir, "documents")
      .select(col("doc_id"), expr(graft.queries.Pipeline.normExprStr).as("norm"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(chunks.nonEmpty && chunks.exists(_._2 > 0), "fixture must force multi-chunk docs")
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet, "every doc is chunked, even 1-token ones")
    byDoc.foreach { case (id, cs) =>
      val toks = docs(id).split(" ", -1)
      val sorted = cs.sortBy(_._2)
      // chunk_ids are dense from 0; offsets are exactly k*24; window is
      // min(32, remaining) — so consecutive chunks overlap by 8 tokens
      // and the last chunk ends exactly at the doc's end
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq)
      assert(sorted.forall { case (_, k, off, len, _) => off == k * 24L && len == math.min(32L, toks.length - off) })
      assert(sorted.last._3 + sorted.last._4 == toks.length, "coverage reaches the end")
      // each chunk's text IS the token slice it claims
      assert(sorted.forall { case (_, _, off, len, text) =>
        text == toks.slice(off.toInt, (off + len).toInt).mkString(" ") })
    }
  }

  test("q67b buckets are per-lang terciles ordered by score, covering every scored doc") {
    val scored = graft.queries.Pipeline.q67_lm_score.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val out = graft.queries.Pipeline.q67b_ppl_buckets.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(out.map(_._1).toSet == scored.keySet, "every q67-scored doc gets a bucket")
    assert(out.forall { case (id, _, nll, _) => nll == scored(id) }, "scores are q67's")
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val by = rows.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      assert(by.keySet == Set("head", "middle", "tail"), s"$lang: all three buckets present")
      assert(by("head").max <= by("middle").min, s"$lang: head scores below middle")
      assert(by("middle").max <= by("tail").min, s"$lang: middle scores below tail")
      // terciles: bucket sizes within ties' reach of n/3
      val n = rows.length
      assert(by.values.forall(b => b.size >= 1 && b.size <= n - 2), s"$lang: no empty tercile")
    }
  }

  test("q91 top collocations equal a brute-force lift ranking") {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(expr(graft.queries.Pipeline.normExprStr).as("n"))
      .collect().map(_.getString(0).split(" ", -1).toSeq).filter(_.length >= 2)
    val bgs = toks.flatMap(a => a.zip(a.drop(1)))
    val unis = toks.flatten
    val cu = unis.groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
    val cb = bgs.groupBy(x => x).map { case (k, v) => k -> v.size.toLong }
    val (nTok, nBg) = (unis.size.toLong, bgs.size.toLong)
    val brute = cb.toSeq.filter(_._2 >= 5).map { case ((a, b), c) =>
      val lift = c.toDouble * nTok * nTok / nBg / cu(a) / cu(b)
      (a, b, c, math.floor(lift * 1e4 + 0.5) / 1e4)
    }.sortBy { case (a, b, _, l) => (-l, a, b) }.take(50)
    val got = graft.queries.Pipeline.q91_collocations.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == brute, s"top-50 lift ranking must equal the replay")
    assert(got.nonEmpty && got.head._4 > 1.0, "top collocations co-occur above chance")
  }
}
