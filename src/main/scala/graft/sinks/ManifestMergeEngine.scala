package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** ACID-flavored [[MergeEngine]] over vanilla parquet: a file-level
  * manifest log (the public Delta/Iceberg design, minus the formats'
  * dependencies, which this build cannot take — zero egress).
  *
  * Layout per table root:
  * {{{
  *   data/…                immutable parquet files (partition subdirs when
  *                         the table is partitioned); files are NEVER
  *                         rewritten in place — a merge adds new files
  *   _manifests/m{N}.json  the FULL relative file list of version N; the
  *                         manifest file itself is the commit record
  * }}}
  *
  * Commit protocol: (1) stage the merge's output files into `data/` under
  * names no other version references, (2) write the next manifest to a
  * temp name and atomically rename it to `_manifests/m{N+1}.json`. The
  * current version IS the max-numbered manifest, so there is no pointer
  * file to overwrite and no window where the table is missing: a reader
  * resolves either version N or N+1, never a half-swapped directory — the
  * isolation gap [[ParquetSwapMergeEngine]] documents (its rename window)
  * closes. A crash before the manifest rename leaves only orphaned data
  * files (invisible to every reader; removed by the next GC), after it the
  * commit is complete — nothing to recover either way.
  *
  * Partitioned merges carry UNTOUCHED partitions' file entries forward
  * into the new manifest instead of copying the files — O(touched
  * partitions) IO per merge, same as the directory-swap engine, but old
  * versions stay intact for in-flight readers.
  *
  * GC: after each commit, manifests older than `retainVersions` are
  * dropped and data files referenced by NO retained manifest are deleted.
  * `retainVersions` ≥ 2 keeps the previous snapshot alive for readers
  * that resolved it just before a commit. Single writer per table assumed
  * (as for every engine here); multi-writer needs a CAS on the manifest
  * name, which HDFS rename-without-overwrite provides and object stores
  * provide via conditional put — out of scope.
  */
final class ManifestMergeEngine(retainVersions: Int = 3) extends MergeEngine {
  require(retainVersions >= 1, "retainVersions must be >= 1")
  import ManifestMergeEngine._

  def upsert(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String]): Unit = {
    val all = read(spark, path) match {
      case Some(existing) => existing.unionByName(batch, allowMissingColumns = true)
      case None           => batch
    }
    commitFullRewrite(spark, path, TableSink.mergeLastWins(all, keys), retainVersions)
  }

  def coalescingUpsert(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String]): Unit = {
    val all = read(spark, path) match {
      case Some(existing) => existing.unionByName(batch, allowMissingColumns = true)
      case None           => batch
    }
    commitFullRewrite(spark, path, TableSink.mergeCoalescing(all, keys), retainVersions)
  }

  def partitionedCoalescingUpsert(spark: SparkSession, path: String,
      batch: DataFrame, keys: Seq[String], partCol: String): Unit = {
    require(keys.contains(partCol),
      s"partition column $partCol must be part of the merge key $keys")
    val fs = fileSystem(spark, path)
    val current = currentManifest(fs, path)
    val existingOpt = current.flatMap(m => readFiles(spark, path, m.files))
    val schemaDrifted = existingOpt.exists(_.columns.toSet != batch.columns.toSet)
    if (existingOpt.isEmpty || schemaDrifted) {
      // first write, or column-set drift: merge the WHOLE table once so
      // every partition carries the uniform widened schema (same rule as
      // the directory-swap engine)
      val all = existingOpt match {
        case Some(existing) => existing.unionByName(batch, allowMissingColumns = true)
        case None           => batch
      }
      commitPartitionedRewrite(spark, path,
        TableSink.mergeCoalescing(all.repartitionByRange(keys.map(col): _*), keys),
        partCol, carriedFiles = Seq.empty, retainVersions)
    } else {
      val touched = batch.select(col(partCol)).distinct().collect()
        .map(r => Option(r.get(0)).map(_.toString)).toSet
      val touchedDirs = touched.map(v => partDirName(partCol, v))
      val (touchedFiles, untouchedFiles) = current.get.files.partition { f =>
        // files of a partitioned table live under "<partCol>=<v>/…"; the
        // root-level case (unpartitioned history) counts as touched so it
        // gets folded into the rewrite rather than silently carried
        val slash = f.indexOf('/')
        slash < 0 || touchedDirs.contains(f.substring(0, slash))
      }
      val existingTouched = readFiles(spark, path, touchedFiles)
      val all = existingTouched match {
        case Some(t) => t.unionByName(batch, allowMissingColumns = true)
        case None    => batch
      }
      commitPartitionedRewrite(spark, path,
        TableSink.mergeCoalescing(all.repartitionByRange(keys.map(col): _*), keys),
        partCol, carriedFiles = untouchedFiles, retainVersions)
    }
  }

  def append(path: String, batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    // append never reads data: stage the new files, carry every current
    // entry forward
    val fs = fileSystem(spark, path)
    val staged = stageFiles(spark, path, batch, partitionBy = None)
    val prev = currentManifest(fs, path)
    commit(fs, path, prev.map(_.files).getOrElse(Seq.empty) ++ staged,
      prev.map(_.version + 1).getOrElse(0L), retainVersions)
  }

  def dedupAppend(spark: SparkSession, path: String, batch: DataFrame,
      key: String): Unit = {
    val inBatch = TableSink.firstWinsInBatch(batch, key)
    val fresh = read(spark, path) match {
      case Some(existing) =>
        inBatch.join(existing.select(col(key)), Seq(key), "left_anti")
      case None => inBatch
    }
    val fs = fileSystem(spark, path)
    val staged = stageFiles(spark, path, fresh, partitionBy = None)
    val prev = currentManifest(fs, path)
    commit(fs, path, prev.map(_.files).getOrElse(Seq.empty) ++ staged,
      prev.map(_.version + 1).getOrElse(0L), retainVersions)
  }

  def compact(spark: SparkSession, path: String, targetBytes: Long): Unit = {
    val fs = fileSystem(spark, path)
    currentManifest(fs, path).foreach { m =>
      readFiles(spark, path, m.files).foreach { df =>
        // size from one recursive summary of data/ — per-file getFileStatus
        // round-trips serialize on the driver at high file counts; the
        // summary may overcount by not-yet-GC'd older versions, which only
        // rounds the target file count up (harmless for a layout pass)
        val bytes = fs.getContentSummary(dataRoot(path)).getLength
        val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        // preserve a partitioned layout: a flat rewrite would demote the
        // partition column to an embedded field, killing directory pruning
        // and forcing the next partitionedCoalescingUpsert into a
        // full-table merge (every file would look "touched")
        val partCols = m.files.flatMap { f =>
          val slash = f.indexOf('/')
          if (slash <= 0) None
          else {
            val eq = f.indexOf('=')
            if (eq > 0 && eq < slash) Some(f.substring(0, eq)) else None
          }
        }.distinct
        val partitionBy =
          if (partCols.length == 1 && m.files.forall(_.contains('/')))
            Some(partCols.head)
          else None
        val staged = stageFiles(spark, path,
          df.repartition(nFiles), partitionBy)
        commit(fs, path, staged, m.version + 1, retainVersions)
      }
    }
  }

  /** Current snapshot of a manifest table (readers' entry point). */
  def read(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = fileSystem(spark, path)
    currentManifest(fs, path).flatMap(m => readFiles(spark, path, m.files))
  }
}

object ManifestMergeEngine {

  final case class Manifest(version: Long, files: Seq[String])

  private def dataRoot(path: String) = new Path(path, "data")
  private def manifestDir(path: String) = new Path(path, "_manifests")

  private def fileSystem(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val ManifestName = "m(\\d+)\\.json".r

  private[sinks] def currentManifest(fs: FileSystem, path: String): Option[Manifest] = {
    val dir = manifestDir(path)
    if (!fs.exists(dir)) return None
    val versions = fs.listStatus(dir).flatMap(_.getPath.getName match {
      case ManifestName(n) => Some(n.toLong)
      case _               => None
    })
    if (versions.isEmpty) None
    else {
      val v = versions.max
      val in = fs.open(new Path(dir, s"m$v.json"))
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      Some(Manifest(v, body.split("\n").map(_.trim).filter(_.nonEmpty).toSeq))
    }
  }

  private def readFiles(spark: SparkSession, path: String,
      files: Seq[String]): Option[DataFrame] =
    if (files.isEmpty) None
    else {
      val root = dataRoot(path).toString
      // basePath keeps partition-directory columns visible when files sit
      // under "<partCol>=<v>/" subdirs
      Some(spark.read.option("basePath", root)
        .parquet(files.map(f => s"$root/$f"): _*))
    }

  private def partDirName(partCol: String, value: Option[String]): String = {
    // match Spark's partitioned-write directory naming (escaping aside —
    // the engine's partition values are alphanumeric by contract)
    s"$partCol=${value.getOrElse("__HIVE_DEFAULT_PARTITION__")}"
  }

  /** Write `df` into a staging dir, then move its part-files under
    * `data/` with a unique commit id prefixed to each name (no version
    * ever references another version's staged names). Returns relative
    * paths (including the partition subdir when `partitionBy` is set).
    */
  private def stageFiles(spark: SparkSession, path: String, df: DataFrame,
      partitionBy: Option[String]): Seq[String] = {
    val fs = fileSystem(spark, path)
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(path, s"_staging_$commitId")
    val writer = df.write.mode(SaveMode.Overwrite)
    partitionBy.fold(writer)(writer.partitionBy(_)).parquet(staging.toString)
    val data = dataRoot(path)
    fs.mkdirs(data)
    val moved = scala.collection.mutable.ArrayBuffer.empty[String]
    def moveTree(dir: Path, relPrefix: String): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) moveTree(st.getPath,
          if (relPrefix.isEmpty) name else s"$relPrefix/$name")
        else if (name.startsWith("part-")) {
          val rel = (if (relPrefix.isEmpty) "" else s"$relPrefix/") +
            s"c$commitId-$name"
          val target = new Path(data, rel)
          fs.mkdirs(target.getParent)
          // rename failure returns FALSE — unchecked, the manifest would
          // commit a path whose file never arrived and every later read
          // of this version fails
          if (!fs.rename(st.getPath, target))
            throw new java.io.IOException(
              s"failed to stage $rel into $data (rename returned false)")
          moved += rel
        }
      }
    moveTree(staging, "")
    fs.delete(staging, true)
    moved.toSeq
  }

  /** Stage + commit a full-table rewrite: the new manifest lists ONLY the
    * staged files.
    */
  private def commitFullRewrite(spark: SparkSession, path: String, df: DataFrame,
      retain: Int): Unit = {
    val fs = fileSystem(spark, path)
    val staged = stageFiles(spark, path, df, partitionBy = None)
    val prev = currentManifest(fs, path)
    commit(fs, path, staged, prev.map(_.version + 1).getOrElse(0L), retain)
  }

  /** Stage a partitioned rewrite of the touched partitions and commit it
    * together with the carried-forward entries of untouched partitions.
    */
  private def commitPartitionedRewrite(spark: SparkSession, path: String,
      df: DataFrame, partCol: String, carriedFiles: Seq[String],
      retain: Int): Unit = {
    val fs = fileSystem(spark, path)
    val staged = stageFiles(spark, path, df, partitionBy = Some(partCol))
    val prev = currentManifest(fs, path)
    commit(fs, path, carriedFiles ++ staged,
      prev.map(_.version + 1).getOrElse(0L), retain)
  }

  /** Atomically publish version `v` (temp write + rename — the manifest's
    * existence IS the commit), then GC manifests/files beyond `retain`.
    */
  private def commit(fs: FileSystem, path: String, files: Seq[String],
      v: Long, retain: Int): Unit = {
    val dir = manifestDir(path)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".m$v.json.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    // rename signals failure by RETURNING FALSE (dst exists = another
    // writer won version v, or an FS fault) — unchecked, the commit would
    // be silently lost while the caller believes it landed
    if (!fs.rename(tmp, new Path(dir, s"m$v.json"))) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"manifest commit lost the race for version $v at $path " +
          "(single-writer contract violated, or filesystem rename fault)")
    }
    gc(fs, path, retain)
  }

  /** Drop manifests older than the newest `retain`, then delete data files
    * no retained manifest references (and stray temp files).
    */
  private def gc(fs: FileSystem, path: String, retain: Int): Unit = {
    // crash leftovers (single writer: anything still present when gc runs
    // is orphaned — the live commit's staging dir is already gone):
    // _staging_<uuid>/ trees from a crash mid-write, .m*.tmp manifests
    // from a crash between create and rename
    fs.listStatus(new Path(path)).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith("_staging_"))
        fs.delete(st.getPath, true)
    }
    val dir = manifestDir(path)
    if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
      if (!st.isDirectory && st.getPath.getName.startsWith(".") &&
          st.getPath.getName.endsWith(".tmp"))
        fs.delete(st.getPath, false)
    }
    val versions = fs.listStatus(dir).flatMap(_.getPath.getName match {
      case ManifestName(n) => Some(n.toLong)
      case _               => None
    }).sorted
    val dropped = versions.dropRight(retain)
    dropped.foreach(v => fs.delete(new Path(dir, s"m$v.json"), false))
    val live: Set[String] = versions.takeRight(retain).flatMap { v =>
      currentManifestAt(fs, path, v)
    }.toSet
    val data = dataRoot(path)
    if (!fs.exists(data)) return
    def sweep(d: Path, relPrefix: String): Unit =
      fs.listStatus(d).foreach { st =>
        val name = st.getPath.getName
        val rel = if (relPrefix.isEmpty) name else s"$relPrefix/$name"
        if (st.isDirectory) {
          sweep(st.getPath, rel)
          if (fs.listStatus(st.getPath).isEmpty) fs.delete(st.getPath, false)
        } else if (!live.contains(rel)) fs.delete(st.getPath, false)
      }
    sweep(data, "")
  }

  private def currentManifestAt(fs: FileSystem, path: String, v: Long): Seq[String] = {
    val p = new Path(manifestDir(path), s"m$v.json")
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      body.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    }
  }
}
