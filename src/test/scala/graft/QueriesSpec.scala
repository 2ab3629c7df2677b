package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator invariants over sf0.001 — fast semantic checks that don't
  * need the DuckDB oracle (which is the driver-side gate). */
class QueriesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("every declared query runs and every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("ivf_pq_residual (spec-only since r15) still answers its probes") {
    // demoted from the graded fleet in r15 (measured-worse tier on the
    // isotropic fixture: 23/30 vs plain ivf_pq's 25/30, r12+r14) but
    // kept implemented for real clustered embeddings — this spec keeps
    // the operator proven: every probe in [10,20) answers with <= 3
    // distinct non-self neighbors from the corpus
    val rows = AnnOps.qSimAnnIvfPqResidual(spark, sf)
      .select(col("probe_id"), col("neighbor_id")).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.keySet.subsetOf((10L until 20L).toSet))
    assert(byProbe.nonEmpty)
    byProbe.foreach { case (p, ns) =>
      val ids = ns.map(_.getLong(1))
      assert(ids.length <= 3 && ids.distinct.length == ids.length)
      assert(!ids.contains(p), s"self-match for probe $p")
    }
  }

  test("q_sort_topk returns exactly 100 rows in descending price order") {
    val rows = RelOps.qSortTopk(spark, sf).collect()
    assert(rows.length === 100)
    val prices = rows.map(_.getDouble(2))
    assert(prices.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("semi and anti joins partition customers against 'P'-order existence") {
    val semiP = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderstatus") === "P")
        .select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    val antiP = RelOps.qJoinAnti(spark, sf).count()
    assert(semiP + antiP === Tables.customer(spark, sf).count())
  }

  test("rollup row count = detail + region subtotals + grand total") {
    val n = AggWinOps.qAggRollup(spark, sf).count()
    val detail = Tables.nation(spark, sf).select(col("n_name")).distinct().count()
    // regions with >=1 customer add one subtotal row each, +1 grand total
    assert(n === detail + 5 + 1)
  }

  test("cube contains all four grouping combinations") {
    val rows = AggWinOps.qAggCube(spark, sf).collect()
    val combos = rows.map(r => (r.getString(0) == "ALL", r.getString(1) == "ALL")).distinct
    assert(combos.length === 4)
  }

  test("window running total tops out at the customer's total order value") {
    // output is ordered by (custkey, orderkey) while the frame runs over
    // (orderdate, orderkey) — so check the cumulative endpoint, not
    // monotonicity in output order
    val maxRunning = AggWinOps.qWindowRunning(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(2)).max).toMap
    val totals = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(maxRunning.keySet === totals.keySet)
    maxRunning.foreach { case (k, v) => assert(math.abs(v - totals(k)) < 1e-6, s"cust $k") }
  }

  test("as-of join emits one row per event with order date <= event day") {
    val n = RelOps.qJoinAsof(spark, sf).count()
    assert(n === Tables.events(spark, sf).count())
  }

  test("set ops: except + intersect partition the customers-with-orders set") {
    val rows = AggWinOps.qSetOps(spark, sf).collect()
    val byOp = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val withOrders = Tables.orders(spark, sf).select(col("o_custkey")).distinct().count()
    assert(byOp.getOrElse("except_p", 0) + byOp.getOrElse("intersect_p", 0) === withOrders)
  }

  test("dedup_exact survivors never exceed docs per lang") {
    LlmOps.qDedupExact(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), r.getString(0))
    }
  }

  test("near-dup clusters all have >= 2 members") {
    val rows = LlmOps.qDedupNear(spark, sf).collect()
    assert(rows.nonEmpty, "near-dup must find candidate clusters in the synthetic corpus")
    rows.foreach(r => assert(r.getLong(2) >= 2))
  }

  test("sim_topk: 5 neighbors per probe, scores in [-1,1] and descending") {
    val rows = LlmOps.qSimTopk(spark, sf).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size === 10)
    byProbe.values.foreach { rs =>
      assert(rs.length === 5)
      val scores = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.forall(sc => sc >= -1.0001 && sc <= 1.0001))
      assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
      rs.foreach(r => assert(r.getLong(1) !== r.getLong(0), "self-match excluded"))
    }
  }

  test("text_stats: at most 20 tokens per lang, counts descending") {
    val rows = LlmOps.qTextStats(spark, sf).collect()
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      assert(rs.length <= 20)
      val ns = rs.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(ns.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("stream_session: per-user sessions cover all that user's events") {
    val sess = StreamOps.qStreamSession(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val direct = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess === direct)
  }

  test("stream_sliding: every event lands in exactly 4 windows") {
    val total = StreamOps.qStreamSliding(spark, sf)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total === Tables.events(spark, sf).count() * 4)
  }

  test("connected components: 60-hop chain converges inside the round cap") {
    import spark.implicits._
    // path graph 0-1-2-...-60 — min-label propagation alone needs 60
    // rounds; path halving must close it within the default cap of 20
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("va", "vb")
    val labels = LlmOps.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 61)
    assert(labels.values.forall(_ === 0L), "all nodes must label to the chain min")
  }

  test("connected components: two disjoint cliques keep separate labels") {
    import spark.implicits._
    val edges = Seq((10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("va", "vb")
    val labels = LlmOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: throws instead of silently truncating") {
    import spark.implicits._
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("va", "vb")
    assertThrows[IllegalStateException] {
      LlmOps.connectedComponents(chain, maxIter = 2).collect()
    }
  }

  test("trained IVF: all vectors assigned, cells nonempty, norms finite") {
    val rows = ScaleOps.qSimAnnIvfTrained(spark, sf).collect()
    assert(rows.length <= 8 && rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    assert(total === Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(!r.getDouble(2).isNaN && r.getDouble(2) > 0.0)
    }
  }

  test("stratified sample: per-stratum rates near targets and rerun-identical") {
    val rows = ScaleOps.qSampleStratified(spark, sf).collect()
    val totals = Tables.lineitem(spark, sf).groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Map("A" -> 0.05, "N" -> 0.10, "R" -> 0.20)
    rows.foreach { r =>
      val flag = r.getString(0)
      val rate = r.getLong(1).toDouble / totals(flag)
      assert(math.abs(rate - targets(flag)) < 0.03,
        s"stratum $flag sampled at $rate, target ${targets(flag)}")
    }
    // determinism: a rerun yields the identical sample (hash, not rand)
    val rerun = ScaleOps.qSampleStratified(spark, sf).collect()
    assert(rows.map(_.toSeq).sameElements(rerun.map(_.toSeq)))
  }

  test("multimodal decode: real WAV codec round-trips, skips junk, survives empty") {
    import spark.implicits._
    import graft.functions.WavCodec
    // direct codec round-trip: header fields and samples all survive,
    // with and without the interposed LIST metadata chunk
    for (junk <- Seq(true, false)) {
      val w = WavCodec.parse(WavCodec.build("hello".getBytes("UTF-8"), 12000, junk))
        .getOrElse(fail(s"parse failed (junk=$junk)"))
      assert(w.sampleRate === 12000 && w.channels === 1 && w.bitsPerSample === 8)
      assert(w.samples.toSeq === "hello".getBytes("UTF-8").map(_ & 0xff).toSeq)
    }
    // odd-length PCM exercises the RIFF word-alignment pad byte
    val odd = WavCodec.parse(WavCodec.build(Array[Byte](1, 2, 3), 8000, true)).get
    assert(odd.samples.toSeq === Seq(1, 2, 3))
    // hostile bytes: truncated, wrong magic, empty — None, never a throw
    assert(WavCodec.parse(Array.emptyByteArray).isEmpty)
    assert(WavCodec.parse("RIFFxxxxJUNK".getBytes("ASCII")).isEmpty)
    assert(WavCodec.parse(WavCodec.build("x".getBytes, 8000, false).take(20)).isEmpty)
    // the Spark pipeline: empty payload decodes to a 0-sample row, not a crash
    val docs = Seq((1L, "hello", "en"), (2L, "", "en"))
      .toDF("doc_id", "text", "lang")
    val out = AnnOps.decodeWav(spark, AnnOps.buildWavPayloads(spark, docs))
      .orderBy(col("doc_id")).collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_samples") === 5L)
    assert(out(0).getAs[Long]("sum_amp") === "hello".getBytes.map(_ & 0xff).sum.toLong)
    assert(out(0).getAs[Long]("peak") === 'o'.toLong)
    assert(out(1).getAs[Long]("n_samples") === 0L && out(1).getAs[Long]("peak") === 0L)
    // doc 1 (odd id) gets rate 8000+1*4000; duration_ms floors n*1000/rate
    assert(out(0).getAs[Long]("sample_rate") === 12000L)
    assert(out(0).getAs[Long]("duration_ms") === 5L * 1000L / 12000L)
  }

  test("persisted ANN index probes (full build AND incremental append) return exactly the inline IVF-PQ answer") {
    val inline = AnnOps.qSimAnnIvfPq(spark, sf).collect().toSeq
    assert(inline.nonEmpty)
    assert(AnnOps.qSimAnnIndex(spark, sf).collect().toSeq === inline,
      "index probe must be indistinguishable from recomputing inline")
    assert(AnnOps.qSimAnnIndexIncr(spark, sf).collect().toSeq === inline,
      "appended index must be indistinguishable from the full build")
  }

  test("semantic dedup: survivors + dropped = docs per lang, survivors nonzero") {
    val rows = AnnOps.qDedupSemantic(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1), s"counts inconsistent for ${r.getString(0)}")
      assert(r.getLong(3) > 0, s"no survivors in ${r.getString(0)}")
    }
  }

  test("BPE training: 10 ranked merges, token count never increases") {
    val rows = TextOps.qTextBpe(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (0 until 10))
    rows.foreach { r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty, "empty merge symbol")
      assert(r.getLong(3) > 0, "merge with zero pair count")
    }
    val after = rows.map(_.getLong(4))
    assert(after.sliding(2).forall { case Array(a, b) => b <= a; case _ => true },
      "corpus token count must be non-increasing across merges")
  }

  test("batched BPE trains the IDENTICAL merge table (vocabulary equivalence)") {
    val serial = TextOps.qTextBpe(spark, sf).collect().map(_.toSeq)
    val batched = TextOps.qTextBpeBatched(spark, sf).collect().map(_.toSeq)
    assert(serial.nonEmpty && batched.sameElements(serial),
      "frequency-gap-safe batching must reproduce sequential BPE exactly, " +
        "including per-merge counts and token totals")
  }

  test("curation funnel: stage counts are monotone non-increasing") {
    val rows = LlmOps.qPipelineCuration(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === (0 to 6))
    val counts = rows.map(_.getLong(2))
    assert(counts.sliding(2).forall { case Array(a, b) => b <= a; case _ => true },
      s"a gate grew the corpus: ${counts.mkString(",")}")
    assert(counts.last > 0, "nothing survived the funnel")
  }

  test("sequence packing: per-lang token totals and doc counts are conserved") {
    val packed = TextOps.qPackSequences(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val expected = Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(count(lit(1)), sum(size(split(col("text"), " "))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(packed === expected, "packing must conserve docs and tokens per lang")
  }

  test("frame sampling: stride-4 indices, sub-frame docs emit nothing") {
    import spark.implicits._
    // 80 bytes = 5 frames -> indices 0 and 4; 100 bytes = 6 -> 0, 4;
    // 15 bytes < one frame -> no rows
    val docs = Seq(
      (1L, "a" * 80, "en"), (2L, "b" * 100, "en"), (3L, "c" * 15, "en"))
      .toDF("doc_id", "text", "lang")
    val out = AnnOps.sampleFrames(spark, docs)
      .orderBy(col("doc_id"), col("frame_idx")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, 'a'.toLong), (1L, 4L, 'a'.toLong),
      (2L, 0L, 'b'.toLong), (2L, 4L, 'b'.toLong)))
  }

  test("bloom dedup: zero false negatives, flagged = members + false positives") {
    val rows = LlmOps.qDedupBloom(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (members, flagged, fps) =
        (r.getAs[Long]("n_members"), r.getAs[Long]("n_flagged"),
          r.getAs[Long]("n_false_pos"))
      // a Bloom filter can over-flag but never under-flag its own members
      assert(flagged === members + fps,
        s"lang ${r.getString(0)}: members=$members flagged=$flagged fps=$fps")
    }
  }

  test("weighted sample: 3 per source, priorities positive and descending, rerun-identical") {
    val a = ScaleOps.qSampleWeighted(spark, sf).collect()
    val perSrc = a.groupBy(_.getString(0))
    perSrc.foreach { case (src, rs) =>
      assert(rs.length === 3, s"$src sampled ${rs.length} docs")
      val pr = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("priority"))
      assert(pr.forall(_ > 0) && pr.sameElements(pr.sorted.reverse),
        s"$src priorities not descending: ${pr.toSeq}")
    }
    val b = ScaleOps.qSampleWeighted(spark, sf).collect()
    assert(a.map(_.toSeq).sameElements(b.map(_.toSeq)), "sample not deterministic")
  }

  test("profiler: one row per column, doc_id unique and null-free") {
    val rows = ScaleOps.qProfileStats(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("doc_id", "lang", "n_chars", "source", "text"))
    val ids = rows("doc_id")
    assert(ids.getAs[Long]("n_nulls") === 0L)
    // doc_id is the PK: distinct count equals the corpus row count,
    // which the text row's distinct can never exceed
    assert(rows("text").getAs[Long]("n_distinct") <= ids.getAs[Long]("n_distinct"))
  }

  test("oracle SQL: every final-projection SUM/AVG is CAST-wrapped") {
    // DuckDB widens SUM(int) to HUGEINT (int128) and may return DECIMAL for
    // other aggregates, while Spark emits BIGINT/DOUBLE — an uncast aggregate
    // in an oracle's OUTPUT schema hash-mismatches even when every value is
    // identical (the r10 q_dedup_bloom failure). COUNT/MIN/MAX are
    // type-preserving and safe; SUM/AVG in the final SELECT list must be
    // wrapped in CAST so both engines agree on the column type.
    def bareAggs(sql: String): Seq[String] = {
      val up = sql.toUpperCase
      def isWord(i: Int) = i >= 0 && (up(i).isLetterOrDigit || up(i) == '_')
      // last SELECT at paren depth 0 starts the final projection
      var depth = 0; var lastSel = -1
      for (i <- sql.indices) sql(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && up.startsWith("SELECT", i) && !isWord(i - 1))
            lastSel = i
      }
      require(lastSel >= 0, "oracle has no top-level SELECT")
      // projection ends at the next paren-depth-0 FROM
      depth = 0; var end = sql.length; var i = lastSel + 6
      while (i < sql.length && end == sql.length) {
        sql(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ => if (depth == 0 && up.startsWith("FROM", i) && !isWord(i - 1)) end = i
        }
        i += 1
      }
      // walk the projection keeping a stack of open-paren "labels" (the
      // identifier immediately before each '('); a SUM/AVG paren with no
      // enclosing CAST label is a bare aggregate in the output schema
      val stack = scala.collection.mutable.Stack[String]()
      val bad = scala.collection.mutable.Buffer[String]()
      for (j <- lastSel until end) sql(j) match {
        case '(' =>
          var k = j - 1
          while (k >= lastSel && sql(k).isWhitespace) k -= 1
          val e = k
          while (k >= lastSel && isWord(k)) k -= 1
          val label = up.substring(k + 1, e + 1)
          if ((label == "SUM" || label == "AVG") && !stack.contains("CAST"))
            bad += s"$label( at offset $j"
          stack.push(label)
        case ')' => if (stack.nonEmpty) stack.pop()
        case _ =>
      }
      bad.toSeq
    }
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => bareAggs(sql).map(b => s"$name: $b")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("funnel steps are monotone: reaching step k implies step k-1") {
    AggWinOps.qWindowFunnel(spark, sf).collect().foreach { r =>
      val (s1, s2, s3) = (r.getAs[Long]("n_step1"), r.getAs[Long]("n_step2"),
        r.getAs[Long]("n_step3"))
      assert(s1 >= s2 && s2 >= s3, s"non-monotone funnel row: $r")
    }
  }

  test("cohort r0 equals cohort size (signup day is itself activity)") {
    AggWinOps.qAggCohort(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("r0") == r.getAs[Long]("n_users"), s"row: $r")
    }
  }

  test("contrastive negatives never collide with the anchor or a positive") {
    val rows = LlmOps.qPairsContrastive(spark, sf)
    val negs = rows.filter(col("neg_id").isNotNull)
      .select(col("anchor"), col("neg_id"))
    assert(negs.filter(col("anchor") === col("neg_id")).count() == 0)
    // rebuild the positive adjacency via the graded components input:
    // a negative that IS a band partner would be a label leak
    val half = LlmOps.qDedupJaccard(spark, sf).select(col("va"), col("vb"))
    val pos = half.select(col("va").as("anchor"), col("vb").as("neg_id"))
      .union(half.select(col("vb").as("anchor"), col("va").as("neg_id")))
    assert(negs.join(pos, Seq("anchor", "neg_id")).count() == 0)
  }

  test("rag retrieval: exactly 5 chunks, cosine in [-1,1], descending") {
    val rows = LlmOps.qPipelineRag(spark, sf).collect()
    assert(rows.length == 5)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(s => s >= -1.0 && s <= 1.0))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("SCD2 history per customer is contiguous and singly-current") {
    val rows = RelOps.qMergeScd2(spark, sf).collect()
      .groupBy(_.getAs[Long]("custkey"))
    rows.foreach { case (c, hs) =>
      val sorted = hs.sortBy(r => r.getAs[java.sql.Date]("valid_from").getTime)
      assert(sorted.count(_.getAs[Long]("is_current") == 1L) == 1,
        s"customer $c must have exactly one current row")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Date]("valid_to") ==
            b.getAs[java.sql.Date]("valid_from"),
            s"customer $c: history gap between $a and $b")
        case _ =>
      }
      assert(sorted.last.getAs[java.sql.Date]("valid_to") == null)
    }
  }
}
