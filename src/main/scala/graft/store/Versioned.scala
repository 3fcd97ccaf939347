package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal manifest-versioned table — the snapshot-isolation core of the
  * Iceberg/Delta idea re-expressed in ~100 lines on the Hadoop FS API:
  * every commit writes NEW immutable parquet files plus a
  * `manifest-<v>.json` naming exactly the files visible at that version.
  * Readers resolve a manifest and load only its files, so
  *  - a reader never sees a half-written commit (the manifest is renamed
  *    into place last — rename is the atomic primitive, same as a
  *    streaming sink's commit log),
  *  - concurrent readers of different versions are isolated for free
  *    (files are immutable; versions share unchanged files),
  *  - time travel is "read an older manifest",
  *  - vacuum is set arithmetic over manifests, never a data scan.
  *
  * Writes go through the driver-side FS API only for the MANIFEST (a
  * file list — control-plane sized); data files are written by the
  * cluster. Single-writer by design (no compare-and-swap here — a real
  * multi-writer needs a lock service or a CAS rename, which HDFS rename
  * semantics provide and object stores don't).
  */
object Versioned {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Long) = new Path(s"$dir/manifest-$v.json")

  /** Versions present, ascending (empty for a fresh dir). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("manifest-") && n.endsWith(".json") =>
        n.stripPrefix("manifest-").stripSuffix(".json").toLong }
      .sorted.toSeq
  }

  private def readManifest(spark: SparkSession, dir: String, v: Long): Seq[String] = {
    val f = fs(spark, dir)
    val in = f.open(manifestPath(dir, v))
    val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    // one file name per line between the brackets (written by us; no
    // general JSON parsing needed)
    body.linesIterator.map(_.trim.stripSuffix(",").stripPrefix("\"").stripSuffix("\""))
      .filter(n => n.nonEmpty && n != "[" && n != "]").toSeq
  }

  /** Commit `df` as the next version. `mode` "append" carries the previous
    * version's files forward; "overwrite" starts the file list fresh (old
    * files stay on disk for time travel until [[vacuumPlan]] reaps them).
    * Returns the new version number.
    */
  def commit(df: DataFrame, dir: String, mode: String = "append"): Long = {
    require(mode == "append" || mode == "overwrite", s"bad mode $mode")
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val v = if (vs.isEmpty) 1L else vs.max + 1
    val dataDir = s"$dir/data-$v"
    df.write.mode("errorifexists").parquet(dataDir)
    val newFiles = f.listStatus(new Path(dataDir))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .map(n => s"data-$v/$n").sorted.toSeq
    val carried =
      if (mode == "append" && vs.nonEmpty) readManifest(spark, dir, vs.max)
      else Seq.empty
    val all = carried ++ newFiles
    val tmp = new Path(s"$dir/.manifest-$v.json.tmp")
    // overwrite=true: a crash between tmp-create and rename leaves a stale
    // tmp behind, and version v was never published so the next commit
    // recomputes the same v — it must be able to reclaim the tmp path
    // (private to the single writer by contract) instead of failing forever
    val out = f.create(tmp, true)
    try out.write(all.mkString("[\n\"", "\",\n\"", "\"\n]").getBytes("UTF-8"))
    finally out.close()
    // atomic publish: readers either see the complete manifest or none
    require(f.rename(tmp, manifestPath(dir, v)), s"manifest publish failed for v$v")
    v
  }

  /** Read a specific version (defaults to the latest). */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no versions in $dir")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not in $vs")
    val files = readManifest(spark, dir, v).map(n => s"$dir/$n")
    spark.read.parquet(files: _*)
  }

  /** Compact the LATEST version's accumulated small files into
    * ~`targetRows`-row outputs as a NEW version (overwrite commit) — the
    * executor for [[Layout.compactionPlan]]'s planning math on this store:
    * after thousands of micro-batch commits, one compact() restores the
    * file count, readers of older versions keep their exact snapshots
    * (immutable files), and [[vacuumPlan]] reaps the fragments once the
    * retention window passes. Row order within files follows the read
    * order of the manifest file list (time-ordered ingest stays
    * time-ordered).
    */
  def compact(spark: SparkSession, dir: String, targetRows: Long): Long = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val current = read(spark, dir)
    val n = current.count()
    val files = math.max(1L, (n + targetRows - 1) / targetRows).toInt
    commit(current.coalesce(files), dir, mode = "overwrite")
  }

  /** Files no version within the retention window references — safe to
    * delete. Pure manifest set arithmetic (no data scan): files referenced
    * by any of the newest `retainVersions` manifests survive.
    *
    * Expired MANIFESTS are part of the plan too: if only the data files
    * were reaped, the old manifests would keep their versions listed by
    * [[versions]] and resolvable by [[read]], which would then fail
    * mid-scan on missing parquet instead of failing fast. Deleting the
    * manifest with its data makes a reaped version vanish atomically from
    * the version list.
    */
  def vacuumPlan(spark: SparkSession, dir: String, retainVersions: Int): Seq[String] = {
    require(retainVersions >= 1, s"retainVersions must be >= 1, got $retainVersions")
    val vs = versions(spark, dir)
    val expired = vs.dropRight(retainVersions)
    val retained = vs.takeRight(retainVersions)
      .flatMap(readManifest(spark, dir, _)).toSet
    val all = vs.flatMap(readManifest(spark, dir, _)).toSet
    ((all -- retained).toSeq ++ expired.map(v => s"manifest-$v.json")).sorted
  }
}
