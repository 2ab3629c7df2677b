package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness for BPE merge-round scaling (VERDICT r10 item 7): the
  * graded q_text_bpe learns 10 merges, production learns ~50k rounds of
  * the SAME loop — this tool runs a few hundred rounds at sf0.1 and
  * prints the seconds-per-round slope so the round-loop bottleneck is
  * named from measurement, not intuition.
  *
  * What the loop does per round (mirrors TextOps.bpeTrain):
  *   (1) pair-count aggregate over the vocab-sized symbol table,
  *   (2) 1-row argmax collected to the driver,
  *   (3) row-local merge applied via string replace.
  * State is O(|vocab|) regardless of corpus size, so the scaling
  * question is purely: what grows with ROUND COUNT? Candidates are
  * (a) driver round-trip latency (two jobs per round — irreducible
  * floor), (b) lineage/plan growth if the table is not checkpointed
  * (each round's plan nests the last), (c) executor-side work (shrinks
  * as merges shorten symbol sequences). The ladder prints per-decade
  * round timings under two checkpoint cadences to separate (a) from (b).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BPE_ROUNDS=100 \
  *     sbt "runMain graft.BpeLadder"
  */
object BpeLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BPE_ROUNDS", "100").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // word-frequency table — the ONLY corpus-sized aggregate; everything
    // after is vocab-sized
    def freshTable(): DataFrame =
      Tables.documents(spark, sfDir)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .select(col("word"),
          concat(regexp_replace(col("word"), "(.)", "  $1"), lit("  ")).as("st"),
          col("n"))

    /** Run `rounds` merges; checkpoint the symbol table every `cadence`
      * rounds (cadence = 1 is bpeTrain's shape). Returns per-round secs. */
    def run(cadence: Int): Array[Double] = {
      var st = freshTable().localCheckpoint() // eager: corpus scan paid here
      val times = new Array[Double](rounds)
      for (r <- 0 until rounds) {
        val t0 = System.nanoTime()
        val pairs = st
          .select(col("n"), split(trim(col("st")), "  ").as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("n"), explode(expr(
            "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS x, tk[i] AS y))"))
            .as("p"))
          .groupBy(col("p.x").as("x"), col("p.y").as("y"))
          .agg(sum(col("n")).as("cnt"))
        // 1-row argmax to the driver (the merge rule is a broadcast-sized
        // fact; collecting it is the loop's design, not a shortcut)
        val bestRows = pairs.orderBy(col("cnt").desc, col("x"), col("y"))
          .limit(1).collect()
        if (bestRows.isEmpty) {
          println(s"[bpe-ladder] vocabulary exhausted at round $r")
          return times.take(r)
        }
        val b = bestRows.head
        val (x, y) = (b.getString(0), b.getString(1))
        val merged = st.select(col("word"),
          regexp_replace(col("st"),
            java.util.regex.Pattern.quote(s" $x  $y "),
            java.util.regex.Matcher.quoteReplacement(s" $x$y ")).as("st"),
          col("n"))
        st = if ((r + 1) % cadence == 0) {
          val cp = merged.localCheckpoint() // truncates lineage
          // the superseded table's blocks are exclusively owned + fully
          // consumed — the GraftShim scope warning does not apply
          org.apache.spark.sql.GraftShim.freeCheckpointBlocks(st)
          cp
        } else merged
        times(r) = (System.nanoTime() - t0) / 1e9
      }
      times
    }

    def decades(ts: Array[Double]): String =
      ts.grouped(math.max(1, rounds / 10)).zipWithIndex.map { case (g, i) =>
        f"d$i=${g.sum / g.length}%.3f"
      }.mkString(" ")

    /** BATCHED rounds: up to `batch` symbol-disjoint top pairs merged per
      * round (the 50k-round lever named in SCALE.md — driver round-trips
      * divide by ~batch). Disjoint symbols guarantee the batch's merges
      * don't perturb each other's counts; equivalence to SERIAL greedy
      * BPE is then an empirical question (a merge may create a pair that
      * serial would have ranked next), so the caller diffs the merge
      * tables rather than assuming. Returns (merges in application
      * order, per-round secs). */
    def runBatched(batch: Int, cadence: Int)
        : (Seq[(String, String)], Array[Double]) = {
      var st = freshTable().localCheckpoint()
      val merges = Seq.newBuilder[(String, String)]
      val times = Array.newBuilder[Double]
      var done = 0
      var round = 0
      while (done < rounds) {
        val t0 = System.nanoTime()
        val pairs = st
          .select(col("n"), split(trim(col("st")), "  ").as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("n"), explode(expr(
            "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS x, tk[i] AS y))"))
            .as("p"))
          .groupBy(col("p.x").as("x"), col("p.y").as("y"))
          .agg(sum(col("n")).as("cnt"))
        val top = pairs.orderBy(col("cnt").desc, col("x"), col("y"))
          .limit(3 * batch).collect()
        if (top.isEmpty) {
          println(s"[bpe-ladder] vocabulary exhausted after $done merges ($round batched rounds)")
          return (merges.result(), times.result())
        }
        // greedy symbol-disjoint selection in rank order
        val used = scala.collection.mutable.Set[String]()
        val sel = top.iterator.map(r => (r.getString(0), r.getString(1)))
          .filter { case (x, y) =>
            val ok = !used(x) && !used(y) && x != y
            if (ok) { used += x; used += y }
            ok
          }.take(math.min(batch, rounds - done)).toSeq
        val merged = sel.foldLeft(st.select(col("word"), col("st"), col("n"))) {
          case (df, (x, y)) =>
            df.select(col("word"),
              regexp_replace(col("st"),
                java.util.regex.Pattern.quote(s" $x  $y "),
                java.util.regex.Matcher.quoteReplacement(s" $x$y ")).as("st"),
              col("n"))
        }
        merges ++= sel
        done += sel.size
        round += 1
        st = if (round % cadence == 0) {
          val cp = merged.localCheckpoint()
          org.apache.spark.sql.GraftShim.freeCheckpointBlocks(st)
          cp
        } else merged
        times += (System.nanoTime() - t0) / 1e9
      }
      (merges.result(), times.result())
    }

    /** SAFE batched rounds — TextOps.bpeTrainBatched's selection rule
      * (symbol-disjoint prefix + frequency gap above the created-pair
      * bounds max(maxInto(x), maxOutOf(y)), singleton self-pairs), which
      * is PROVABLY sequential-equivalent — the graded q_text_bpe_batched
      * hash-matches the sequential oracle. This mode measures the
      * realized driver-round reduction at ladder scale. */
    def runSafe(batch: Int, cadence: Int)
        : (Seq[(String, String)], Array[Double]) = {
      var st = freshTable().localCheckpoint()
      val merges = Seq.newBuilder[(String, String)]
      val times = Array.newBuilder[Double]
      var done = 0
      var round = 0
      while (done < rounds) {
        val t0 = System.nanoTime()
        val pairs = st
          .select(col("n"), split(trim(col("st")), "  ").as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("n"), explode(expr(
            "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS x, tk[i] AS y))"))
            .as("p"))
          .groupBy(col("p.x").as("x"), col("p.y").as("y"))
          .agg(sum(col("n")).as("cnt"))
          .localCheckpoint()
        val top = pairs.orderBy(col("cnt").desc, col("x"), col("y"))
          .limit(3 * batch).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        if (top.isEmpty) {
          println(s"[bpe-ladder] vocabulary exhausted after $done merges ($round safe rounds)")
          return (merges.result(), times.result())
        }
        val (tripTopK, pairSub, clash) = TextOps.safeBatchInputs(spark, st, pairs, top)
        val accepted = TextOps.selectSafeBatch(top, tripTopK, pairSub, clash,
          batch, rounds - done)
        val merged = accepted.foldLeft(st.select(col("word"), col("st"), col("n"))) {
          case (df, (x, y, _)) =>
            df.select(col("word"),
              regexp_replace(col("st"),
                java.util.regex.Pattern.quote(s" $x  $y "),
                java.util.regex.Matcher.quoteReplacement(s" $x$y ")).as("st"),
              col("n"))
        }
        merges ++= accepted.map(a => (a._1, a._2))
        done += accepted.size
        round += 1
        st = if (round % cadence == 0) {
          val cp = merged.localCheckpoint()
          org.apache.spark.sql.GraftShim.freeCheckpointBlocks(st)
          cp
        } else merged
        times += (System.nanoTime() - t0) / 1e9
      }
      (merges.result(), times.result())
    }

    var serialMerges: Seq[(String, String)] = Seq.empty
    Seq(1, 10).foreach { cadence =>
      val ts = run(cadence)
      println(f"[bpe-ladder] cadence=$cadence rounds=${ts.length} " +
        f"total=${ts.sum}%.1f s mean=${ts.sum / ts.length}%.3f s/round")
      println(s"[bpe-ladder]   per-decade mean s/round: ${decades(ts)}")
    }
    // serial merge table for the equivalence diff (re-derive via batch=1)
    val (sm, _) = runBatched(1, 10)
    serialMerges = sm
    Seq(4, 8).foreach { b =>
      val (bm, ts) = runBatched(b, 10)
      val agree = serialMerges.zip(bm).takeWhile { case (a, c) => a == c }.size
      println(f"[bpe-ladder] batch=$b rounds=${ts.length} merges=${bm.size} " +
        f"total=${ts.sum}%.1f s mean/round=${ts.sum / ts.length}%.3f")
      println(s"[bpe-ladder]   merge-table agreement with serial: $agree/" +
        s"${math.min(serialMerges.size, bm.size)} prefix" +
        (if (agree == math.min(serialMerges.size, bm.size)) " (IDENTICAL)"
         else s"; first divergence at merge $agree: serial=" +
           s"${serialMerges.lift(agree)} batched=${bm.lift(agree)}"))
    }
    Seq(8, 16).foreach { b =>
      val (bm, ts) = runSafe(b, 10)
      val agree = serialMerges.zip(bm).takeWhile { case (a, c) => a == c }.size
      println(f"[bpe-ladder] SAFE batch=$b driver-rounds=${ts.length} " +
        f"merges=${bm.size} total=${ts.sum}%.1f s " +
        f"reduction=${bm.size.toDouble / ts.length}%.2fx merges/round")
      println(s"[bpe-ladder]   merge-table agreement with serial: $agree/" +
        s"${math.min(serialMerges.size, bm.size)} prefix" +
        (if (agree == math.min(serialMerges.size, bm.size)) " (IDENTICAL)"
         else s"; first divergence at merge $agree: serial=" +
           s"${serialMerges.lift(agree)} batched=${bm.lift(agree)}"))
    }
    spark.stop()
  }
}
