package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Native MINI-LOG table format — the snapshot / time-travel commit log
  * that Delta/Iceberg provide, reduced to its load-bearing core and
  * buildable offline (no lake-format jars exist in this environment):
  *
  *  - A table is a directory of immutable parquet DATA FILES plus a
  *    `_graft_log/` directory of versioned JSON MANIFESTS. Manifest N
  *    lists the exact (bucket, file) set composing snapshot N.
  *  - A COMMIT writes only the NEW files plus one tiny manifest; files
  *    carried over from the parent snapshot are referenced by path —
  *    structural sharing, never copied. Copy-on-write merges rewrite
  *    only the buckets their keys touch (the q_merge_* machinery's
  *    partition-confined discipline, now with versioned metadata).
  *  - A READ resolves a manifest (latest or as-of-version) and scans
  *    exactly its file list — historical snapshots stay readable after
  *    later commits because no commit ever mutates or deletes a data
  *    file (vacuuming old versions is a separate, explicit act).
  *
  * At 100 TB the manifests are metadata-scale (file count, not data
  * size) and live next to the data on the object store; the JSON-file
  * log is the same mechanism as Delta's `_delta_log/N.json`. Writing a
  * manifest is a driver-side metadata write, like a partition commit.
  * Single-writer discipline here; a real multi-writer deployment adds
  * an atomic rename/put-if-absent on the manifest name — the object
  * store primitive Delta relies on too.
  */
object MiniLog {

  private def logDir(table: String): Path = Paths.get(table, "_graft_log")

  /** Write `df` (which must carry a `bucket` column) as one file per
    * bucket under `table/<tag>/bucket=<b>/`, returning bucket → file.
    * One Spark job: repartition on the bucket key so each partition
    * directory gets exactly one file. A bucket with NO surviving rows
    * produces no file and no map entry — a rewrite that empties a
    * bucket must REMOVE that bucket's key from the parent manifest map
    * (`parent - bucket ++ writeBucketFiles(...)`), or the old file stays
    * referenced; `parent ++` alone only covers non-emptying rewrites. */
  def writeBucketFiles(df: DataFrame, table: String, tag: String)
      : Map[Long, String] = {
    df.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$table/$tag")
    val base = Paths.get(table, tag)
    val dirs = Files.list(base)
    try dirs.iterator().asScala
      .filter(_.getFileName.toString.startsWith("bucket="))
      .map { bd =>
        val b = bd.getFileName.toString.stripPrefix("bucket=").toLong
        val fs = Files.list(bd)
        val pq = try fs.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toList
        finally fs.close()
        require(pq.size == 1, s"expected 1 file in $bd, found ${pq.size}")
        b -> pq.head.toString
      }.toMap
    finally dirs.close()
  }

  /** Commit manifest `version` naming the snapshot's (bucket, file) set. */
  def commit(table: String, version: Int, files: Map[Long, String]): Unit = {
    Files.createDirectories(logDir(table))
    val entries = files.toSeq.sortBy(_._1).map { case (b, p) =>
      s"""{"bucket":$b,"path":"${p.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
    }
    val json =
      s"""{"version":$version,"files":[${entries.mkString(",")}]}"""
    Files.write(logDir(table).resolve(f"$version%08d.json"),
      json.getBytes("UTF-8"))
  }

  /** Resolve manifest `version` back to its bucket → file map. */
  def manifest(table: String, version: Int): Map[Long, String] = {
    val raw = new String(
      Files.readAllBytes(logDir(table).resolve(f"$version%08d.json")), "UTF-8")
    // minimal parse of the writer's own format (paths JSON-escaped)
    val entry = """\{"bucket":(\d+),"path":"((?:[^"\\]|\\.)*)"\}""".r
    entry.findAllMatchIn(raw).map { m =>
      m.group(1).toLong ->
        m.group(2).replace("\\\"", "\"").replace("\\\\", "\\")
    }.toMap
  }

  /** Latest committed version (manifest file names sort by version). */
  def latestVersion(table: String): Int = {
    val fs = Files.list(logDir(table))
    try fs.iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toInt).max
    finally fs.close()
  }

  /** Snapshot read AS OF `version`: scan exactly that manifest's files. */
  def readAsOf(s: SparkSession, table: String, version: Int): DataFrame =
    s.read.parquet(manifest(table, version).values.toSeq.sorted: _*)

  /** VACUUM — the explicit retention act every commit above relies on
    * never happening implicitly: delete the data files referenced ONLY
    * by manifests older than `keepFrom`, then the old manifests
    * themselves. Time travel below `keepFrom` ends here, by declared
    * intent; every version ≥ `keepFrom` keeps reading byte-identically
    * because its files are untouched (structural sharing means an old
    * file referenced by ANY kept manifest survives). Returns
    * (#files deleted, #files kept). Metadata-scale work: file LISTS,
    * never data. */
  def vacuum(table: String, keepFrom: Int): (Int, Int) = {
    val latest = latestVersion(table)
    require(keepFrom <= latest, s"keepFrom=$keepFrom > latest=$latest")
    val keep = (keepFrom to latest)
      .flatMap(v => manifest(table, v).values).toSet
    val walk = Files.walk(Paths.get(table))
    val all = try walk.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        !p.startsWith(logDir(table)))
      .map(_.toString).toSet
    finally walk.close()
    val dead = all -- keep
    dead.foreach(p => Files.deleteIfExists(Paths.get(p)))
    val lfs = Files.list(logDir(table))
    try lfs.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".json") &&
        p.getFileName.toString.stripSuffix(".json").toInt < keepFrom)
      .toList.foreach(Files.delete)
    finally lfs.close()
    (dead.size, keep.size)
  }
}
