package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The ACID-flavored manifest engine must (1) reproduce the directory-swap
  * engine's merge semantics exactly — same U1/U3 replay/idempotence
  * contract — and (2) add what the swap engine cannot: a committed
  * snapshot readers can resolve at every instant, with untouched-partition
  * files SHARED across versions instead of copied.
  */
class ManifestMergeEngineSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val engine = new ManifestMergeEngine(retainVersions = 2)

  test("keyed upsert: later _seq wins, replay idempotent (U1 parity)") {
    val path = tmp("mseng") + "/sessions"
    val v1 = Seq((9001, "Quali v1", 5L)).toDF("session_key", "name", "line_id")
    val v2 = Seq((9001, "Quali v2", 3L)).toDF("session_key", "name", "line_id")
    engine.upsert(spark, path, TableSink.withSeq(v1, 1), Seq("session_key"))
    engine.upsert(spark, path, TableSink.withSeq(v2, 2), Seq("session_key"))
    assert(engine.read(spark, path).get.head().getAs[String]("name") == "Quali v2")
    // replaying the OLDER batch must not regress the row
    engine.upsert(spark, path, TableSink.withSeq(v1, 1), Seq("session_key"))
    val rows = engine.read(spark, path).get
    assert(rows.head().getAs[String]("name") == "Quali v2")
    assert(rows.count() == 1)
  }

  test("coalescing upsert: per-column last-non-null, replay idempotent (U3 parity)") {
    val path = tmp("msengC") + "/lap_data"
    val keys = Seq("driver_number", "lap_number")
    val frag1 = Seq((1, 1, Some(92.5), None: Option[Double], 10L))
      .toDF("driver_number", "lap_number", "lap_time", "sector_1_time", "line_id")
    val frag2 = Seq((1, 1, None: Option[Double], Some(28.1), 11L))
      .toDF("driver_number", "lap_number", "lap_time", "sector_1_time", "line_id")
    engine.coalescingUpsert(spark, path, TableSink.withSeq(frag1, 1), keys)
    engine.coalescingUpsert(spark, path, TableSink.withSeq(frag2, 2), keys)
    engine.coalescingUpsert(spark, path, TableSink.withSeq(frag2, 2), keys) // replay
    val row = engine.read(spark, path).get.collect()
    assert(row.length == 1)
    assert(row.head.getAs[Double]("lap_time") == 92.5)
    assert(row.head.getAs[Double]("sector_1_time") == 28.1)
  }

  test("append + dedupAppend: no data read on append, key dedup across versions") {
    val path = tmp("msengA") + "/race_control"
    engine.append(path, Seq((1L, "GREEN"), (2L, "SC")).toDF("msg_id", "flag"))
    engine.dedupAppend(spark, path,
      Seq((2L, "SC dup"), (3L, "RED")).toDF("msg_id", "flag"), "msg_id")
    val rows = engine.read(spark, path).get.orderBy("msg_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).getString(1) == "SC") // first version's row survived
  }

  test("snapshot isolation: a resolved reader keeps its version across a commit") {
    val path = tmp("msengS") + "/sessions"
    engine.upsert(spark, path,
      TableSink.withSeq(Seq((1, "A", 0L)).toDF("session_key", "name", "line_id"), 1),
      Seq("session_key"))
    // reader resolves version 0's file list NOW
    val snapshot = engine.read(spark, path).get
    val before = snapshot.collect()
    // writer commits version 1 (full rewrite: all-new files)
    engine.upsert(spark, path,
      TableSink.withSeq(Seq((1, "B", 0L)).toDF("session_key", "name", "line_id"), 2),
      Seq("session_key"))
    // the old snapshot still reads version 0's files (retain=2 keeps them)
    assert(snapshot.collect().toSeq == before.toSeq)
    assert(before.head.getAs[String]("name") == "A")
    assert(engine.read(spark, path).get.head().getAs[String]("name") == "B")
  }

  test("partitioned coalescing: untouched partition files carried forward, not rewritten") {
    val path = tmp("msengP") + "/lap_data"
    val keys = Seq("driver_number", "lap_number")
    val b1 = Seq(
      (1, 1, Some(92.5), None: Option[Double], 10L),
      (2, 1, Some(95.0), None: Option[Double], 11L))
      .toDF("driver_number", "lap_number", "lap_time", "sector_1_time", "line_id")
    engine.partitionedCoalescingUpsert(spark, path,
      TableSink.withSeq(b1, 1), keys, "driver_number")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = ManifestMergeEngine.currentManifest(fs, path).get
    val d1FilesV1 = m1.files.filter(_.startsWith("driver_number=1/")).toSet
    assert(d1FilesV1.nonEmpty, m1.files)

    // merge touching ONLY driver 2
    val b2 = Seq((2, 1, None: Option[Double], Some(30.2), 12L))
      .toDF("driver_number", "lap_number", "lap_time", "sector_1_time", "line_id")
    engine.partitionedCoalescingUpsert(spark, path,
      TableSink.withSeq(b2, 2), keys, "driver_number")
    val m2 = ManifestMergeEngine.currentManifest(fs, path).get
    assert(m2.version == m1.version + 1)
    // driver 1's entries are the SAME file names — shared, not copied
    assert(m2.files.filter(_.startsWith("driver_number=1/")).toSet == d1FilesV1, m2.files)
    // and driver 2's are all new
    assert(m2.files.filter(_.startsWith("driver_number=2/"))
      .forall(f => !m1.files.contains(f)), m2.files)

    val rows = engine.read(spark, path).get.orderBy("driver_number").collect()
    assert(rows.length == 2)
    assert(rows(1).getAs[Double]("lap_time") == 95.0)
    assert(rows(1).getAs[Double]("sector_1_time") == 30.2)
  }

  test("partitioned coalescing: schema drift forces a uniform full rewrite") {
    val path = tmp("msengD") + "/lap_data"
    val keys = Seq("driver_number", "lap_number")
    val b1 = Seq((1, 1, Some(92.5), 10L), (2, 1, Some(95.0), 11L))
      .toDF("driver_number", "lap_number", "lap_time", "line_id")
    engine.partitionedCoalescingUpsert(spark, path,
      TableSink.withSeq(b1, 1), keys, "driver_number")
    val b2 = Seq((2, 1, Some(28.1), 12L))
      .toDF("driver_number", "lap_number", "sector_1_time", "line_id")
    engine.partitionedCoalescingUpsert(spark, path,
      TableSink.withSeq(b2, 2), keys, "driver_number")
    val rows = engine.read(spark, path).get.orderBy("driver_number").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.schema.fieldNames.contains("sector_1_time")))
    assert(rows(0).getAs[Any]("sector_1_time") == null)
    assert(rows(1).getAs[Double]("sector_1_time") == 28.1)
    assert(rows(1).getAs[Double]("lap_time") == 95.0)
  }

  test("GC: log truncated below the reconstruction base, unreferenced files deleted, live kept") {
    val path = tmp("msengG") + "/sessions"
    val keys = Seq("session_key")
    (1 to 4).foreach { i => // versions 0..3
      engine.upsert(spark, path, TableSink.withSeq(
        Seq((1, s"v$i", 0L)).toDF("session_key", "name", "line_id"), i), keys)
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path, "_manifests")
    val segments = fs.listStatus(dir).map(_.getPath.getName).sorted
    // retain=2 keeps versions 2,3; their reconstruction base is the m0
    // checkpoint, so d1..d3 + m0 survive and d0 (folded into m0) is gone
    assert(segments.toSeq == Seq("d1.json", "d2.json", "d3.json", "m0.json"),
      segments.toSeq)
    // every data file on disk is referenced by a RETAINED version (full
    // rewrites → versions 0/1's files were GC'd even though their log
    // segments are still needed as the reconstruction base)
    def filesAt(v: Long): Set[String] = {
      // reconstruct v: checkpoint m0 + deltas 1..v
      val st = scala.collection.mutable.LinkedHashSet.empty[String]
      st ++= scala.io.Source.fromInputStream(
        fs.open(new org.apache.hadoop.fs.Path(dir, "m0.json")), "UTF-8")
        .mkString.split("\n").filter(_.nonEmpty)
      (1L to v).foreach { i =>
        scala.io.Source.fromInputStream(
          fs.open(new org.apache.hadoop.fs.Path(dir, s"d$i.json")), "UTF-8")
          .mkString.split("\n").filter(_.nonEmpty).foreach { l =>
            if (l.startsWith("-")) st -= l.substring(1) else st += l.substring(1)
          }
      }
      st.toSet
    }
    val live = filesAt(2) ++ filesAt(3)
    assert(ManifestMergeEngine.currentManifest(fs, path).get.files.toSet == filesAt(3))
    def walk(d: org.apache.hadoop.fs.Path, prefix: String): Seq[String] =
      fs.listStatus(d).toSeq.flatMap { st =>
        val rel = if (prefix.isEmpty) st.getPath.getName else s"$prefix/${st.getPath.getName}"
        if (st.isDirectory) walk(st.getPath, rel) else Seq(rel)
      }
    val onDisk = walk(new org.apache.hadoop.fs.Path(path, "data"), "").toSet
    assert(onDisk == live, s"disk=$onDisk live=$live")
    assert(engine.read(spark, path).get.head().getAs[String]("name") == "v4")
  }

  test("delta log: per-commit record stays O(changed files); checkpoints bound reconstruction") {
    val path = tmp("msengDL") + "/events"
    val ck = 5
    val dl = new ManifestMergeEngine(retainVersions = 2, checkpointEvery = ck)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path, "_manifests")
    dl.append(path, Seq((0L, "row0")).toDF("id", "payload"))
    // v0's delta is truncated by its own commit's GC (the m0 checkpoint
    // subsumes it) — measure from v1
    val deltaBytes = (1 until 18).map { i =>
      dl.append(path, Seq((i.toLong, s"row$i")).toDF("id", "payload"))
      fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, s"d$i.json")).getLen
    }
    // every append adds one file to a GROWING table: the commit record
    // must not grow with table size (the old full-list manifest did —
    // O(files) JSON per commit)
    assert(deltaBytes.max <= deltaBytes.min * 2,
      s"delta record grew with table size: $deltaBytes")
    // reads see all rows through checkpoint + trailing deltas
    assert(dl.read(spark, path).get.count() == 18)
    // log stays bounded: segments ≥ newest base checkpoint only
    val segments = fs.listStatus(dir).map(_.getPath.getName).sorted.toSeq
    val checkpoints = segments.filter(_.startsWith("m"))
    assert(checkpoints == Seq("m15.json"), segments) // m0,m5,m10 truncated
    val deltas = segments.filter(_.startsWith("d")).map(_.stripPrefix("d").stripSuffix(".json").toLong)
    assert(deltas.forall(_ > 15), segments) // d16, d17 only
    // a keyed rewrite after all those appends still reads correctly
    dl.upsert(spark, path, TableSink.withSeq(
      Seq((99L, "merged", 0L)).toDF("id", "payload", "line_id"), 1), Seq("id"))
    assert(dl.read(spark, path).get.count() == 19)
  }

  test("compact preserves a partitioned layout and collapses fragmentation") {
    val path = tmp("msengCmp") + "/lap_data"
    val keys = Seq("driver_number", "lap_number")
    (1 to 4).foreach { b =>
      val df = Seq((1, b, Some(90.0 + b), 10L), (2, b, Some(95.0 + b), 11L))
        .toDF("driver_number", "lap_number", "lap_time", "line_id")
      engine.partitionedCoalescingUpsert(spark, path,
        TableSink.withSeq(df, b), keys, "driver_number")
    }
    val before = engine.read(spark, path).get.collect().map(_.toString).sorted
    engine.compact(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = ManifestMergeEngine.currentManifest(fs, path).get
    // layout survived: every committed file still sits under a
    // driver_number= partition directory (a flat rewrite would demote the
    // partition column and force the next merge into a full-table rewrite)
    assert(m.files.nonEmpty)
    assert(m.files.forall(_.startsWith("driver_number=")), m.files)
    val after = engine.read(spark, path).get.collect().map(_.toString).sorted
    assert(after.sameElements(before))
    // and a following one-partition merge still carries the other
    // partition's files forward untouched
    val d1Files = m.files.filter(_.startsWith("driver_number=1/")).toSet
    engine.partitionedCoalescingUpsert(spark, path, TableSink.withSeq(
      Seq((2, 1, Some(70.0), 12L))
        .toDF("driver_number", "lap_number", "lap_time", "line_id"), 9),
      keys, "driver_number")
    val m2 = ManifestMergeEngine.currentManifest(fs, path).get
    assert(m2.files.filter(_.startsWith("driver_number=1/")).toSet == d1Files)
  }

  test("GC removes crash leftovers: stranded staging trees and tmp manifests") {
    val path = tmp("msengOrph") + "/sessions"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    engine.upsert(spark, path, TableSink.withSeq(
      Seq((1, "A", 0L)).toDF("session_key", "name", "line_id"), 1),
      Seq("session_key"))
    // plant crash leftovers: a staging tree and a half-written tmp manifest
    val staging = new org.apache.hadoop.fs.Path(path, "_staging_deadbeef")
    fs.mkdirs(staging)
    val orphanTmp = new org.apache.hadoop.fs.Path(s"$path/_manifests/.m99.json.zz.tmp")
    val out = fs.create(orphanTmp, true); out.write("junk".getBytes); out.close()
    // next commit's GC sweeps both
    engine.upsert(spark, path, TableSink.withSeq(
      Seq((1, "B", 0L)).toDF("session_key", "name", "line_id"), 2),
      Seq("session_key"))
    assert(!fs.exists(staging), "stranded staging tree must be GC'd")
    assert(!fs.exists(orphanTmp), "orphan tmp manifest must be GC'd")
    assert(engine.read(spark, path).get.head().getAs[String]("name") == "B")
  }

  test("concurrent reader during writes: every poll resolves a complete committed snapshot") {
    val path = tmp("msengCW") + "/sessions"
    val keys = Seq("session_key")
    engine.upsert(spark, path, TableSink.withSeq(
      (1 to 50).map(k => (k, "v0", 0L)).toDF("session_key", "name", "line_id"), 0), keys)
    // a reader polling mid-merge must NEVER see a missing table, a partial
    // file set, or a mixed version: always exactly 50 rows, one uniform
    // version tag — the property the directory-swap engine cannot give
    // (its rename window leaves no table directory at all)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      while (!stop.get()) {
        try {
          val rows = engine.read(spark, path).map(_.collect()).getOrElse(Array.empty)
          if (rows.length != 50)
            failures.add(s"saw ${rows.length} rows")
          else {
            val versions = rows.map(_.getAs[String]("name")).distinct
            if (versions.length != 1) failures.add(s"mixed versions ${versions.toSeq}")
          }
        } catch { case e: Throwable => failures.add(s"read failed: ${e.getMessage}") }
      }
    }, "graft-manifest-reader")
    reader.start()
    try {
      (1 to 5).foreach { v =>
        engine.upsert(spark, path, TableSink.withSeq(
          (1 to 50).map(k => (k, s"v$v", 0L)).toDF("session_key", "name", "line_id"),
          v), keys)
      }
    } finally {
      stop.set(true)
      reader.join(30000)
    }
    assert(failures.isEmpty, failures.toArray.mkString("; "))
    assert(engine.read(spark, path).get.head().getAs[String]("name") == "v5")
  }

  test("GC grace is tombstone-time, not mtime: ancient files that JUST became unreferenced survive") {
    val path = tmp("msengTomb") + "/sessions"
    val keys = Seq("session_key")
    val g = new ManifestMergeEngine(retainVersions = 1, orphanGraceMs = 60000)
    g.upsert(spark, path, TableSink.withSeq(
      Seq((1, "v0", 0L)).toDF("session_key", "name", "line_id"), 0), keys)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v0Files = ManifestMergeEngine.currentManifest(fs, path).get.files
    assert(v0Files.nonEmpty)
    // backdate v0's data files: to an mtime-keyed grace they now look
    // ancient — but they only become UNREFERENCED at the next commit's
    // GC, so the tombstone clock must start THERE
    v0Files.foreach { f =>
      fs.setTimes(new org.apache.hadoop.fs.Path(s"$path/data/$f"), 1000L, -1)
    }
    g.upsert(spark, path, TableSink.withSeq(
      Seq((1, "v1", 0L)).toDF("session_key", "name", "line_id"), 1), keys)
    // retain=1 dropped v0 from retention; grace must still protect it
    v0Files.foreach { f =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/data/$f")),
        s"$f deleted on first sighting as unreferenced — grace keyed to mtime, not tombstone")
    }
    // and the ledger recorded the sighting
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/_manifests/.tombstones")))

    // a short-grace engine ages them out across two sweeps
    val fast = new ManifestMergeEngine(retainVersions = 1, orphanGraceMs = 200)
    Thread.sleep(250)
    fast.upsert(spark, path, TableSink.withSeq(
      Seq((1, "v2", 0L)).toDF("session_key", "name", "line_id"), 2), keys)
    v0Files.foreach { f =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/data/$f")),
        s"$f still present after its tombstone aged past the grace")
    }
    assert(g.read(spark, path).get.head().getAs[String]("name") == "v2")
  }

  test("multi-writer CAS: concurrent appends from two writers, no lost update") {
    val path = tmp("msengMW") + "/events"
    // grace >> test duration: a competing writer's GC must not sweep the
    // other's staged-but-uncommitted files (the multi-writer deployment
    // contract in the scaladoc)
    val mw = new ManifestMergeEngine(retainVersions = 3, orphanGraceMs = 600000)
    val perWriter = 6
    // build the frames on the main thread (toDF needs the active session)
    def batches(tag: String) = (0 until perWriter).map(i =>
      Seq((s"$tag$i", tag)).toDF("id", "writer"))
    val a = batches("a"); val b = batches("b")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writerThread(dfs: Seq[org.apache.spark.sql.DataFrame]) = new Thread(() => {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      try dfs.foreach(df => mw.append(path, df))
      catch { case t: Throwable => errs.add(t) }
    })
    val (ta, tb) = (writerThread(a), writerThread(b))
    ta.start(); tb.start(); ta.join(120000); tb.join(120000)
    assert(errs.isEmpty, errs.toArray.mkString("; "))
    val rows = mw.read(spark, path).get.collect()
    // every one of the 12 appends landed exactly once — the lost-update
    // case would drop a batch whose carried file list predated the winner
    assert(rows.length == 2 * perWriter, rows.map(_.getString(0)).sorted.mkString(","))
    assert(rows.map(_.getString(0)).distinct.length == 2 * perWriter)
    // 12 commits → versions 0..11 (every loser rebased to a NEW version)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ManifestMergeEngine.currentManifest(fs, path).get.version == 2L * perWriter - 1)
  }

  test("multi-writer CAS: concurrent keyed upserts rebase — both writers' keys survive") {
    val path = tmp("msengMWU") + "/sessions"
    val mw = new ManifestMergeEngine(retainVersions = 3, orphanGraceMs = 600000)
    val perWriter = 4
    // disjoint key ranges; each upsert is a FULL REWRITE, so without the
    // rebase a stale loser would erase every row the winner just merged
    def batches(base: Int, tag: String) = (0 until perWriter).map(i =>
      TableSink.withSeq(Seq((base + i, s"$tag$i", 0L))
        .toDF("session_key", "name", "line_id"), i))
    val a = batches(100, "a"); val b = batches(200, "b")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writerThread(dfs: Seq[org.apache.spark.sql.DataFrame]) = new Thread(() => {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      try dfs.foreach(df => mw.upsert(spark, path, df, Seq("session_key")))
      catch { case t: Throwable => errs.add(t) }
    })
    val (ta, tb) = (writerThread(a), writerThread(b))
    ta.start(); tb.start(); ta.join(180000); tb.join(180000)
    assert(errs.isEmpty, errs.toArray.mkString("; "))
    val keys = mw.read(spark, path).get.collect()
      .map(_.getAs[Int]("session_key")).sorted.toSeq
    assert(keys == ((100 until 100 + perWriter) ++ (200 until 200 + perWriter)).toSeq,
      keys.mkString(","))
  }

  test("persistent failure propagates on the FIRST attempt, not after 20 rebases") {
    val path = tmp("msengFail") + "/sessions"
    engine.upsert(spark, path, TableSink.withSeq(
      Seq((1, "v0", 0L)).toDF("session_key", "name", "line_id"), 0), Seq("session_key"))
    // a nonexistent merge key is a PERSISTENT analysis failure — under
    // the old catch-everything rebase it re-staged a full merge 20 times
    // (orphaning each attempt's files) before surfacing; the narrowed
    // catch (vanished-input faults only) must surface it immediately
    val t0 = System.nanoTime()
    val e = intercept[Exception] {
      engine.upsert(spark, path, TableSink.withSeq(
        Seq((2, "v1", 0L)).toDF("session_key", "name", "line_id"), 1),
        Seq("no_such_column"))
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
      e.getMessage.contains("no_such_column"), e.toString)
    // 20 rebases would pay ≥ sum(10ms*n) ≈ 1.9 s of backoff alone plus
    // 20 merge recomputations; first-attempt propagation is sub-second
    assert(elapsedMs < 3000, s"took ${elapsedMs}ms — did it rebase-retry a persistent failure?")
    // and the table is untouched
    assert(engine.read(spark, path).get.head().getAs[String]("name") == "v0")
  }

  test("contention marker imposes a GC grace floor on grace-0 engines") {
    val path = tmp("msengCont") + "/events"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    engine.append(path, Seq((1L, "a")).toDF("id", "tag"))
    // plant an unreferenced (orphan) data file — a stand-in for a
    // competing writer's staged-but-not-yet-committed work
    def plantOrphan(name: String): org.apache.hadoop.fs.Path = {
      val p = new org.apache.hadoop.fs.Path(s"$path/data/$name")
      val out = fs.create(p, true); out.write("x".getBytes); out.close(); p
    }
    // no marker: a grace-0 engine sweeps the orphan on the next commit
    val o1 = plantOrphan("orphan1.parquet")
    engine.append(path, Seq((2L, "b")).toDF("id", "tag"))
    assert(!fs.exists(o1), "grace-0 GC should sweep orphans promptly when uncontended")
    // stamped marker (what any lost CAS writes): the SAME engine's GC
    // must now apply the floor and spare a fresh orphan
    val marker = new org.apache.hadoop.fs.Path(s"$path/_manifests/.contention")
    val mo = fs.create(marker, true); mo.write("contended\n".getBytes); mo.close()
    val o2 = plantOrphan("orphan2.parquet")
    engine.append(path, Seq((3L, "c")).toDF("id", "tag"))
    assert(fs.exists(o2),
      "marker present but grace-0 GC still swept a young orphan — floor not applied")
    assert(engine.read(spark, path).get.count() == 3)
  }

  test("lost CAS durably stamps the contention marker") {
    val path = tmp("msengStamp") + "/events"
    val mw = new ManifestMergeEngine(retainVersions = 3, orphanGraceMs = 600000)
    val perWriter = 8
    val dfs = (0 until 2 * perWriter).map(i => Seq((s"k$i", i)).toDF("id", "n"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writerThread(ds: Seq[org.apache.spark.sql.DataFrame]) = new Thread(() => {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      try ds.foreach(df => mw.append(path, df))
      catch { case t: Throwable => errs.add(t) }
    })
    val (ta, tb) = (writerThread(dfs.take(perWriter)), writerThread(dfs.drop(perWriter)))
    ta.start(); tb.start(); ta.join(180000); tb.join(180000)
    assert(errs.isEmpty, errs.toArray.mkString("; "))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // two threads each running 8 back-to-back commits: their
    // read→compute→CAS windows overlap continuously, so at least one CAS
    // loss occurs and the loser must have stamped the marker durably
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/_manifests/.contention")),
      "16 interleaved commits from 2 writers produced no stamped contention marker")
    assert(mw.read(spark, path).get.count() == 2L * perWriter)
  }

  test("replacePartitions: listed partitions replaced (or dropped when empty), others carried") {
    val path = tmp("msengRP") + "/lists"
    engine.appendPartitioned(path, Seq(
      (1L, "a", 1), (2L, "b", 1), (3L, "c", 2), (4L, "d", 3))
      .toDF("id", "v", "cid"), "cid")
    val cid2FilesBefore = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      ManifestMergeEngine.currentManifest(fs, path).get.files.filter(_.startsWith("cid=2/"))
    }
    // replace cid=1 with a 1-row remainder; cid=3 with NOTHING (dropped)
    engine.replacePartitions(spark, path,
      Seq((2L, "b", 1)).toDF("id", "v", "cid"), "cid", Seq(1, 3))
    val rows = engine.read(spark, path).get.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq((2L, "b", 1), (3L, "c", 2)), rows.mkString(","))
    // the untouched partition's file entries were CARRIED, not rewritten
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cid2FilesAfter = ManifestMergeEngine.currentManifest(fs, path)
      .get.files.filter(_.startsWith("cid=2/"))
    assert(cid2FilesAfter == cid2FilesBefore,
      s"untouched partition rewritten: $cid2FilesBefore -> $cid2FilesAfter")
    // a flat table refuses the partitioned replace
    val flat = tmp("msengRPflat") + "/t"
    engine.append(flat, Seq((1L, "x")).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      engine.replacePartitions(spark, flat,
        Seq((1L, "x", 1)).toDF("id", "v", "cid"), "cid", Seq(1))
    }
  }

  test("overwrite: whole-table swap; old snapshot retires, new contents atomic") {
    val path = tmp("msengOW") + "/t"
    engine.append(path, Seq((1L, "old"), (2L, "old")).toDF("id", "v"))
    engine.overwrite(spark, path, Seq((9L, "new")).toDF("id", "v"))
    val rows = engine.read(spark, path).get.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((9L, "new")), rows.mkString(","))
  }

  test("conditionalOverwrite: stale expected version fails loudly, fresh one commits") {
    val path = tmp("msengCAS") + "/state"
    // creation requires expecting absence
    engine.conditionalOverwrite(spark, path,
      Seq((0L, "v0")).toDF("n", "v"), None)
    val v0 = engine.currentVersion(spark, path)
    assert(v0.contains(0L))
    // read-modify-write at the read version commits
    engine.conditionalOverwrite(spark, path,
      Seq((1L, "v1")).toDF("n", "v"), v0)
    // a SECOND writer that also read v0 must fail loudly, not
    // last-write-wins over v1
    val ex = intercept[java.util.ConcurrentModificationException] {
      engine.conditionalOverwrite(spark, path,
        Seq((99L, "stale")).toDF("n", "v"), v0)
    }
    assert(ex.getMessage.contains("concurrent writer"), ex.getMessage)
    val row = engine.read(spark, path).get.head()
    assert(row.getLong(0) == 1L && row.getString(1) == "v1")
  }

  test("flat ops on a partitioned manifest stage under the layout (no mixed manifest)") {
    val path = tmp("msengFlatP") + "/lap_data"
    val keys = Seq("driver_number", "lap_number")
    engine.partitionedCoalescingUpsert(spark, path, TableSink.withSeq(
      Seq((1, 1, Some(92.5), 10L), (2, 1, Some(95.0), 11L))
        .toDF("driver_number", "lap_number", "lap_time", "line_id"), 1),
      keys, "driver_number")
    // append with the partition column: must land under driver_number=3/
    engine.append(path, Seq((3, 1, Some(90.0), 12L))
      .toDF("driver_number", "lap_number", "lap_time", "line_id"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = ManifestMergeEngine.currentManifest(fs, path).get
    assert(m.files.forall(_.startsWith("driver_number=")), m.files)
    assert(engine.read(spark, path).get.count() == 3)
    // a batch MISSING the partition column fails fast instead of
    // committing a mixed flat+partitioned manifest
    intercept[IllegalArgumentException] {
      engine.append(path, Seq((4, Some(91.0))).toDF("lap_number", "lap_time"))
    }
    // keyed full rewrites keep the layout too
    engine.upsert(spark, path, TableSink.withSeq(
      Seq((1, 1, Some(80.0), 13L))
        .toDF("driver_number", "lap_number", "lap_time", "line_id"), 2), keys)
    val m2 = ManifestMergeEngine.currentManifest(fs, path).get
    assert(m2.files.forall(_.startsWith("driver_number=")), m2.files)
    assert(engine.read(spark, path).get.count() == 3)
  }

  test("streaming pipeline runs end-to-end through the manifest engine") {
    val src = tmp("msengStrSrc")
    val tables = tmp("msengStrTbl")
    val ckpt = tmp("msengStrCkpt")
    val (p1, p2) = graft.f1.Fixtures.pyLines.splitAt(6)
    Files.write(java.nio.file.Paths.get(s"$src/p1.txt"), p1.mkString("\n").getBytes)
    val q = graft.streaming.F1Pipeline.startUnified(spark, src, tables, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"),
      engine = engine)
    try {
      q.processAllAvailable()
      Files.write(java.nio.file.Paths.get(s"$src/p2.txt"), p2.mkString("\n").getBytes)
      q.processAllAvailable()
    } finally q.stop()
    def table(name: String) = engine.read(spark, s"$tables/$name").get
    val laps = table("lap_data").orderBy("driver_number", "lap_number").collect()
    assert(laps.length == 2)
    assert(laps.head.getAs[Int]("speed_trap") == 315) // cross-batch merge through versions
    assert(table("drivers").count() == 3)
    assert(table("weather").count() == 3)
    assert(table("race_control").count() == 2)
  }

  test("full pipeline batch load routes through the manifest engine (S6 parity)") {
    val tables = tmp("msengPipe")
    val events = graft.sources.EventSource.fromLines(spark, graft.f1.Fixtures.pyLines)
    graft.streaming.F1Pipeline.loadBatch(spark, events, tables, batchId = 0, engine)
    // replay the same batch — idempotent through the manifest engine too
    graft.streaming.F1Pipeline.loadBatch(spark, events, tables, batchId = 0, engine)
    def table(name: String) = engine.read(spark, s"$tables/$name").get
    assert(table("sessions").count() == 1)
    assert(table("drivers").count() == 3)
    assert(table("weather").count() == 6) // append-only sink: replay appends (at-least-once, as documented)
    val laps = table("lap_data").orderBy("driver_number").collect()
    assert(laps.length == 2)
    assert(laps.head.getAs[Int]("speed_trap") == 315)
    assert(table("race_control").count() == 2) // dedupAppend absorbed the replay
  }
}
