package graft.sinks

import org.apache.spark.sql.SparkSession

/** Driver-side cache for SCALAR table metadata (a store's 1-row meta, the
  * sidecar's bucket modulus, an ANN index's model matrices) keyed by the
  * owning manifest table's snapshot token. Reading one of these through
  * the engine costs a full Spark job (tiny-parquet scan + `head()`), and
  * the streaming stores pay it several times PER TRIGGER for values that
  * only change when the table commits. Keying on
  * [[ManifestMergeEngine.snapshotToken]] — (version, newest-segment
  * mtime) — makes staleness structurally impossible: any commit advances
  * the version; a torn-down-and-rebuilt path changes the mtime. This is
  * metadata caching in the public Delta `SnapshotManagement` sense, never
  * result caching: every cached value is a pure function of one committed
  * table version, and the first read at each version still computes it
  * from the stored bytes.
  *
  * Non-manifest engines (no snapshot identity to key on) bypass the cache
  * entirely.
  */
private[graft] object MetaCache {

  private val MaxEntries = 4096
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Long, Long), AnyRef]()

  /** `compute` the value of scalar metadata stored under `path` (a table
    * root managed by `engine`), cached per committed snapshot. `kind`
    * namespaces different projections of the same table.
    */
  def cached[T <: AnyRef](spark: SparkSession, path: String, kind: String,
      engine: MergeEngine)(compute: => T): T = engine match {
    case m: ManifestMergeEngine =>
      m.snapshotToken(spark, path) match {
        case Some((v, mtime)) =>
          if (cache.size() > MaxEntries) cache.clear()
          cache.computeIfAbsent((path, kind, v, mtime), _ => compute)
            .asInstanceOf[T]
        case None => compute
      }
    case _ => compute
  }

  /** Populate the cache at WRITE time with the value the writer just
    * committed — a maintenance pass that overwrites scalar metadata (a
    * streaming trigger's meta refresh) advances the snapshot version on
    * every trigger, so read-side caching alone misses once per trigger
    * for a value the writer had in hand. The token is resolved AFTER the
    * commit, so the entry maps the exact committed snapshot; a
    * concurrent commit between the write and the token read would at
    * worst cache the newer snapshot's key with this value — impossible
    * under the stores' single-maintainer contract, and self-healing
    * anyway (the losing entry is keyed to a version whose next read
    * recomputes through [[cached]] only if absent).
    */
  def put[T <: AnyRef](spark: SparkSession, path: String, kind: String,
      engine: MergeEngine, value: T): Unit = engine match {
    case m: ManifestMergeEngine =>
      m.snapshotToken(spark, path).foreach { case (v, mtime) =>
        if (cache.size() > MaxEntries) cache.clear()
        cache.put((path, kind, v, mtime), value)
      }
    case _ => ()
  }
}
