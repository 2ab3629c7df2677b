package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_maintenance_compact's content invariance is oracle-checked; this
  * spec checks the MAINTENANCE effect — the fragmented table really is
  * fragmented and compaction really collapses each lang partition to a
  * single file without moving rows across partitions. */
class CompactionSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("compaction collapses per-partition file counts; rows stay put") {
    RelOps.qMaintenanceCompact(s, TestSpark.sf).collect()

    def filesPerLang(table: String): Map[String, Long] =
      s.table(table)
        .select(col("lang"), input_file_name().as("f"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("f")).as("nf"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    val before = filesPerLang("default.graft_docs_frag")
    val after = filesPerLang("default.graft_docs_compact")
    assert(before.keySet == after.keySet)
    before.foreach { case (lang, nb) =>
      assert(nb > 1, s"$lang: fragmentation fixture should have many files, got $nb")
      assert(after(lang) == 1L, s"$lang: expected 1 compacted file, got ${after(lang)}")
    }

    // partition-local rewrite: per-lang row counts and checksums agree
    val sums = s.table("default.graft_docs_frag")
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("doc_id").as("cs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    s.table("default.graft_docs_compact")
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("doc_id").as("cs"))
      .collect().foreach { r =>
        assert(sums(r.getString(0)) == ((r.getLong(1), r.getLong(2))))
      }
  }
}
