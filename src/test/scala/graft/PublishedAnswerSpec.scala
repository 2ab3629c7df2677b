package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the published-answer FIRST-CONSUMER invariant (r15 verdict item
  * 3): AnnOps.publishedAnswer makes each graded ANN method query stage
  * its ≤30-row answer once and serve the read-back, and the recall
  * scorecard grades FROM those staged answers. That split is only
  * honest while each pipeline's cost lands inside its OWNING timed
  * query — if registry ordering ever changed so the scorecard ran
  * first, every pipeline's cost would silently migrate into
  * q_sim_ann_recall. Three locks:
  *
  *  1. the owner map below must cover exactly the publishedAnswer call
  *     sites in the source (a new tag without an owner fails here);
  *  2. every TIMED owner sorts strictly before "q_sim_ann_recall", so
  *     Bench/Verify's sorted loops build each stage in its owner; the
  *     ONE allowed exception is ans_prefix, whose owner is untimed by
  *     declared design (its operator is priced twice elsewhere) and
  *     whose build cost is therefore paid inside the scorecard's arm;
  *  3. behaviorally: running the timed owners in Bench's sorted order
  *     against a FRESH SharedStage keyspace stages every non-prefix
  *     answer before the scorecard's frame is ever constructed.
  */
class PublishedAnswerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** tag → owning registered query (mirrors the call sites; lock 1
    * keeps it from drifting). */
  private val owners = Map(
    "ans_lsh" -> "q_sim_ann_lsh",
    "ans_pq" -> "q_sim_ann_pq",
    "ans_ivf" -> "q_sim_ann_ivf",
    "ans_ivf_pq" -> "q_sim_ann_ivf_pq",
    "ans_ivf_prefix" -> "q_sim_ann_ivf_prefix",
    "ans_bit" -> "q_embed_bit",
    "ans_prefix" -> "q_sim_ann_prefix")

  test("owner map covers exactly the publishedAnswer call sites") {
    val re = """publishedAnswer\(s,\s*d,\s*"(ans_\w+)"""".r
    val srcDir = java.nio.file.Paths.get("src/main/scala/graft")
    val files = java.nio.file.Files.walk(srcDir)
    val tags = try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap(p => re.findAllMatchIn(
          java.nio.file.Files.readString(p)).map(_.group(1)))
        .toSet
    } finally files.close()
    assert(tags === owners.keySet,
      s"publishedAnswer call sites drifted from the owner map: " +
        s"source=$tags map=${owners.keySet}")
  }

  test("AnnOps.publishedAnswerQueries is exactly the owner set") {
    // Bench's steady-state rep pins these names to their first-pass
    // time; a drift here would let a staged-read rep time leak into
    // the steady total
    assert(AnnOps.publishedAnswerQueries === owners.values.toSet)
  }

  test("every timed owner sorts before the scorecard; ans_prefix is the only untimed owner") {
    owners.values.foreach(o =>
      assert(SparkEntry.queries.contains(o), s"owner $o not declared"))
    assert(SparkEntry.queries.contains("q_sim_ann_recall"))
    assert(!Bench.untimed.contains("q_sim_ann_recall"),
      "the scorecard must stay timed — it prices the ans_prefix build")
    val untimedOwners = owners.filter { case (_, o) => Bench.untimed.contains(o) }
    assert(untimedOwners === Map("ans_prefix" -> "q_sim_ann_prefix"),
      s"unexpected untimed owners: $untimedOwners — an untimed owner's " +
        "pipeline cost migrates into the scorecard")
    owners.collect { case (t, o) if !Bench.untimed.contains(o) => (t, o) }
      .foreach { case (t, o) =>
        assert(o < "q_sim_ann_recall",
          s"$o (stage $t) sorts AFTER the scorecard — Bench's sorted " +
            "loop would build its stage inside q_sim_ann_recall")
      }
  }

  test("running the timed owners in Bench order stages every non-prefix answer") {
    // fresh SharedStage keyspace: same parquet files, different sfDir
    // STRING (the cache key), so stages built by other suites in this
    // shared JVM are invisible here
    val altSf = TestSpark.sf + "/."
    def stageDir(tag: String): java.io.File = new java.io.File(
      RelOps.stagingDir(spark, s"shared_${tag}_${SharedStage.pathTag(altSf)}"))
    val timedOwners = owners.filter { case (_, o) => !Bench.untimed.contains(o) }
    timedOwners.foreach { case (tag, _) =>
      assert(!new java.io.File(stageDir(tag), "_SUCCESS").exists(),
        s"stage $tag pre-exists on the fresh keyspace — test is vacuous")
    }
    timedOwners.toSeq.sortBy(_._2).foreach { case (tag, owner) =>
      SparkEntry.queries(owner)(spark, altSf).count()
      assert(new java.io.File(stageDir(tag), "_SUCCESS").exists(),
        s"$owner did not stage its own answer $tag")
    }
    // the scorecard, constructed AFTER the owners ran, finds every
    // non-prefix stage already published — only ans_prefix (the
    // documented exception) is built here
    SparkEntry.queries("q_sim_ann_recall")(spark, altSf).count()
    assert(new java.io.File(stageDir("ans_prefix"), "_SUCCESS").exists(),
      "scorecard run should have built the ans_prefix stage (its owner is untimed)")
  }
}
