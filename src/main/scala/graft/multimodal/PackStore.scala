package graft.multimodal

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Generational pack store — the WRITE lifecycle of the packed layout.
  *
  * [[ContainerOps.ensurePackedObjects]] compacts a static corpus once; a
  * real ingest keeps RECEIVING objects after that, and each ingest batch
  * is far too small to justify rewriting the corpus. The store answers
  * with the LSM/table-format idea (log-structured merge via immutable
  * generations + an atomically-swapped pointer, the scheme Iceberg/Delta
  * snapshots and git packfiles share — all public designs):
  *
  *   - **Components are immutable.** A component = one directory of
  *     range-partitioned packfiles + its (media_id, pack_path, offset,
  *     length) parquet manifest. The initial corpus is component
  *     `packs/v0`; each ingest batch lands whole as a small delta
  *     component `deltas/d<k>`. Nothing is ever modified in place.
  *   - **Snapshots are immutable too; CURRENT is the only mutable
  *     thing.** Every publish writes the full component list to a new
  *     immutable `snapshots/snap-<k>` file (one `dir \t minId \t maxId`
  *     line per component), then atomically swaps the one-line CURRENT
  *     pointer to `<k>` (tmp + rename — [[graft.sources.GraftFs
  *     .writeSmallFileAtomic]]), so a reader sees the old or the new
  *     snapshot, never a mix. Single writer assumed (ingest and
  *     compaction serialized by the caller), readers never blocked.
  *     Retained snapshots stay readable AS OF their publish point
  *     (`scanAt`) — the Iceberg/Delta time-travel contract: an audit or
  *     a reproducibility rerun reads the exact corpus a training job
  *     saw, not whatever compaction has since rewritten.
  *   - **Reads union the live manifests.** `scan` prunes components by
  *     the CURRENT min/max before touching their manifests (a range
  *     lookup inside the base never even reads a delta's manifest
  *     footer), then prunes packs via the manifest exactly like
  *     [[ContainerOps.packedScan]].
  *   - **Compaction bounds read amplification.** Every delta adds pack
  *     opens to a full scan; `compact` streams all live components
  *     through one range-repartition into a fresh `packs/v<k>` and
  *     publishes a snapshot naming it alone. `vacuum(retainSnapshots)`
  *     expires all but the newest N snapshots, then deletes component
  *     dirs no RETAINED snapshot references — the delete is safe
  *     precisely because every pointer that could name them is gone.
  *     Reading an expired snapshot fails with a typed error, never a
  *     dangling read.
  *
  * Scale shape: ingest cost tracks the batch (one small component write,
  * one pointer swap); scan cost tracks live bytes + live pack count;
  * compaction is the only corpus-sized pass and runs on whatever cadence
  * keeps the delta count acceptable — the standard LSM trade, made
  * explicit and spec-proven here (PackStoreSpec counts real pack opens
  * before and after).
  */
object PackStore {

  /** One live component: its dir and the id range its manifest covers. */
  final case class Component(dir: String, minId: Long, maxId: Long)

  private def currentPath(base: String) = s"$base/CURRENT"
  private def snapPath(base: String, id: Long) = s"$base/snapshots/snap-$id"

  /** Latest published snapshot id (None on an empty store). */
  def latestSnapshotId(s: SparkSession, base: String): Option[Long] =
    graft.sources.GraftFs.readSmallFile(s, currentPath(base)).map(_.trim.toLong)

  /** Components of snapshot `id`. Typed failure — not a dangling read —
    * when the snapshot was vacuumed away or never existed. Lines starting
    * with `#` are snapshot metadata (see [[snapshotNote]]), not components.
    */
  def readSnapshot(s: SparkSession, base: String, id: Long): Seq[Component] =
    graft.sources.GraftFs.readSmallFile(s, snapPath(base, id)) match {
      case None =>
        throw new IllegalArgumentException(
          s"snapshot $id of $base is expired or was never published")
      case Some(content) =>
        content.split("\n").filter(l => l.nonEmpty && !l.startsWith("#")).toSeq.map { line =>
          val Array(d, lo, hi) = line.split("\t")
          Component(d, lo.toLong, hi.toLong)
        }
    }

  /** The free-form note a publish attached to snapshot `id` (None when
    * none was). [[graft.streaming.PackIngest]] stores the micro-batch id
    * here — IN the atomically-swapped pointer — so replayed batches are
    * detected without a separate (non-atomic) marker file.
    */
  def snapshotNote(s: SparkSession, base: String, id: Long): Option[String] =
    graft.sources.GraftFs.readSmallFile(s, snapPath(base, id))
      .flatMap(_.split("\n").find(_.startsWith("#note=")).map(_.stripPrefix("#note=")))

  def readCurrent(s: SparkSession, base: String): Seq[Component] =
    latestSnapshotId(s, base).fold(Seq.empty[Component])(readSnapshot(s, base, _))

  /** Publish a new snapshot: immutable snap file first, then the atomic
    * CURRENT swap. Returns the new snapshot id. `note` and `kind` ride
    * in the snapshot file itself so they commit atomically with the
    * publish. `kind` records WHY the snapshot exists — `init`/`delta`
    * publishes carry new data, `compact` only rewrites existing data —
    * which is exactly the bit a changelog subscriber needs to emit every
    * object once (see [[graft.streaming.PackSubscribe]]).
    */
  private def publish(s: SparkSession, base: String, comps: Seq[Component],
      note: Option[String] = None, kind: String = "delta"): Long = {
    val id = nextSnapshotId(s, base)
    val lines = Seq(s"#kind=$kind") ++ note.map(n => s"#note=$n") ++
      comps.map(c => s"${c.dir}\t${c.minId}\t${c.maxId}")
    graft.sources.GraftFs.writeSmallFileAtomic(s, snapPath(base, id), lines.mkString("\n"))
    graft.sources.GraftFs.writeSmallFileAtomic(s, currentPath(base), id.toString)
    id
  }

  /** The publish kind of snapshot `id` (`init` / `delta` / `compact`);
    * pre-kind snapshot files read as `delta` (the conservative choice —
    * a subscriber would rather re-emit than drop).
    */
  def snapshotKind(s: SparkSession, base: String, id: Long): String =
    graft.sources.GraftFs.readSmallFile(s, snapPath(base, id))
      .flatMap(_.split("\n").find(_.startsWith("#kind=")).map(_.stripPrefix("#kind=")))
      .getOrElse("delta")

  private def nextSnapshotId(s: SparkSession, base: String): Long =
    latestSnapshotId(s, base).fold(0L)(_ + 1)

  /** Test seam (RetryProbe / PackStoreSpec): when true, the FIRST attempt
    * of pack-writing task 0 throws after its first object lands — local
    * mode shares the JVM, so the static is visible from executor threads
    * (the RetryProbe.fired idiom).
    */
  @volatile private[graft] var failFirstWriteAttempt: Boolean = false

  /** Set when the injected failure actually threw (proves the probe probed). */
  @volatile private[graft] var writeFailureFired: Boolean = false

  /** Write one immutable component: payloads range-partitioned into
    * `nPacks` packfiles under `dir`, manifest rows (media_id, pack_path,
    * offset, length) emitted from the same executor-side pass. Returns
    * the component with its measured id range.
    *
    * RETRY/SPECULATION SAFETY: the pack write is a side effect outside
    * Spark's output-commit protocol, so two attempts of one task (retry
    * after a mid-write crash, or a speculative duplicate) must never
    * race one file. Each attempt writes its OWN file —
    * `pack-<pid>-a<taskAttemptId>.bin` — and the manifest (a normal
    * Spark-committed parquet write) only ever contains the surviving
    * attempt's rows, which reference that attempt's complete file. A
    * dead attempt leaves an orphan pack file, nothing more; `vacuum`
    * sweeps orphans out of live component dirs by diffing the dir
    * listing against the manifest.
    */
  def writeComponent(s: SparkSession, objs: Dataset[(Long, Array[Byte])],
      dir: String, nPacks: Int): Component = {
    import s.implicits._
    val manifest = objs
      .repartitionByRange(nPacks, col("_1"))
      .sortWithinPartitions("_1")
      .mapPartitions { it: Iterator[(Long, Array[Byte])] =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val attempt = if (tc == null) 0L else tc.taskAttemptId()
        val conf = new org.apache.hadoop.conf.Configuration()
        val packPath = s"$dir/pack-$pid-a$attempt.bin"
        val p = new org.apache.hadoop.fs.Path(packPath)
        val fs = p.getFileSystem(conf)
        val out = fs.create(p, true)
        var off = 0L
        var n = 0
        val entries = Iterator.newBuilder[(Long, String, Long, Int)]
        try it.foreach { case (id, payload) =>
          out.write(payload)
          entries += ((id, packPath, off, payload.length))
          off += payload.length
          n += 1
          if (failFirstWriteAttempt && pid == 0 && tc != null && tc.attemptNumber() == 0 && n == 1) {
            writeFailureFired = true
            throw new RuntimeException("PackStore: injected first-attempt failure")
          }
        } finally out.close()
        entries.result()
      }
      .toDF("media_id", "pack_path", "offset", "length")
    manifest.write.mode("overwrite").parquet(s"$dir/manifest")
    val mm = s.read.parquet(s"$dir/manifest")
      .agg(min("media_id"), max("media_id")).head
    Component(dir, mm.getLong(0), mm.getLong(1))
  }

  /** Initialize the store: the whole batch becomes component packs/v0,
    * published as snapshot 0.
    */
  def initBase(s: SparkSession, base: String, objs: Dataset[(Long, Array[Byte])],
      nPacks: Int): Unit =
    publish(s, base, Seq(writeComponent(s, objs, s"$base/packs/v0", nPacks)), kind = "init")

  /** Land one ingest batch as a small delta component and publish it.
    * The component dir is keyed by the snapshot id it will publish as —
    * monotone across the store's whole history, so a delta written after
    * a compaction can never collide with (and silently overwrite) an
    * earlier delta an older retained snapshot still references.
    */
  def appendDelta(s: SparkSession, base: String, objs: Dataset[(Long, Array[Byte])],
      nPacks: Int = 1, note: Option[String] = None): Unit = {
    val live = readCurrent(s, base)
    val comp = writeComponent(s, objs, s"$base/deltas/d${nextSnapshotId(s, base)}", nPacks)
    publish(s, base, live :+ comp, note, kind = "delta")
  }

  /** Raw bytes of every live object whose id falls in `idRange` (all when
    * None): component-pruned by CURRENT min/max, pack-pruned by the
    * manifests, positioned range reads in (pack_path, offset) order.
    * Parallelism scales with bytes, not pack count: entries shuffle on
    * (pack_path, offset-chunk of `chunkBytes`), so a large pack is read
    * by many tasks over disjoint ranges (see [[ContainerOps.packedScan]]).
    */
  def scanBytes(s: SparkSession, base: String,
      idRange: Option[(Long, Long)] = None,
      chunkBytes: Long = 128L << 20,
      snapshot: Option[Long] = None): Dataset[(Long, Array[Byte])] = {
    val comps = snapshot.fold(readCurrent(s, base))(readSnapshot(s, base, _))
    scanComponents(s, comps, idRange, chunkBytes)
  }

  /** Raw bytes of every object in an EXPLICIT component list (the seam
    * snapshot scans and the changelog subscriber share): min/max-pruned
    * by idRange, pack-pruned by the manifests, offset-chunked positioned
    * reads exactly as [[scanBytes]] documents.
    */
  def scanComponents(s: SparkSession, comps: Seq[Component],
      idRange: Option[(Long, Long)] = None,
      chunkBytes: Long = 128L << 20): Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    val live = idRange.fold(comps) { case (lo, hi) =>
      comps.filter(c => c.maxId >= lo && c.minId <= hi)
    }
    val manifests = live.map(c => s.read.parquet(s"${c.dir}/manifest"))
      .reduceOption(_.unionByName(_))
      .getOrElse(s.emptyDataset[(Long, String, Long, Int)]
        .toDF("media_id", "pack_path", "offset", "length"))
    val manifest = idRange.foldLeft(manifests) {
      case (m, (lo, hi)) => m.filter(col("media_id").between(lo, hi))
    }
    val fsImpls: Seq[(String, String)] = {
      import scala.jdk.CollectionConverters._
      s.sparkContext.hadoopConfiguration.asScala
        .filter(e => e.getKey.startsWith("fs.") && e.getKey.endsWith(".impl"))
        .map(e => e.getKey -> e.getValue).toVector
    }
    manifest
      .repartition(col("pack_path"), floor(col("offset") / chunkBytes))
      .sortWithinPartitions(col("pack_path"), col("offset"))
      .select(col("media_id").as[Long], col("pack_path").as[String],
        col("offset").as[Long], col("length").as[Int])
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        fsImpls.foreach { case (k, v) => conf.set(k, v) }
        var curPack: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def close(): Unit = if (in != null) { in.close(); in = null }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => close())
        it.map { case (id, pack, off, len) =>
          if (pack != curPack) {
            close()
            val p = new org.apache.hadoop.fs.Path(pack)
            in = p.getFileSystem(conf).open(p)
            curPack = pack
          }
          val buf = new Array[Byte](len)
          in.readFully(off, buf)
          (id, buf)
        }
      }
  }

  /** Parsed view of the live store (the ContainerParser over scanBytes). */
  def scan(s: SparkSession, base: String,
      idRange: Option[(Long, Long)] = None): Dataset[ContainerOps.ContainerRow] = {
    import s.implicits._
    scanBytes(s, base, idRange)
      .mapPartitions(_.map { case (id, bytes) => ContainerOps.ContainerParser.parse(id, bytes) })
  }

  /** TIME TRAVEL: the parsed corpus exactly as snapshot `id` published
    * it — components are immutable and snapshot files pin the set, so
    * compactions/ingests after `id` are invisible here. Fails typed if
    * the snapshot has been expired by a retention vacuum.
    */
  def scanAt(s: SparkSession, base: String, id: Long): Dataset[ContainerOps.ContainerRow] = {
    import s.implicits._
    scanBytes(s, base, snapshot = Some(id))
      .mapPartitions(_.map { case (id, bytes) => ContainerOps.ContainerParser.parse(id, bytes) })
  }

  /** Merge every live component into one fresh base generation and
    * publish a snapshot naming it alone — full scans drop back to
    * `nPacks` opens. The generation dir is keyed by its snapshot id
    * (monotone, collision-free across retention).
    */
  def compact(s: SparkSession, base: String, nPacks: Int,
      note: Option[String] = None): Unit = {
    val comp = writeComponent(s, scanBytes(s, base),
      s"$base/packs/v${nextSnapshotId(s, base)}", nPacks)
    publish(s, base, Seq(comp), note, kind = "compact")
  }

  /** Expire all but the newest `retainSnapshots` snapshots, then delete
    * component dirs no retained snapshot references (safe exactly
    * because every pointer that could name them is gone first). The
    * default keeps only CURRENT's snapshot — the no-time-travel
    * behavior; a larger retention is the audit/reproducibility window,
    * priced in storage exactly like Iceberg's expire_snapshots.
    */
  def vacuum(s: SparkSession, base: String, retainSnapshots: Int = 1): Unit = {
    val snapIds = graft.sources.GraftFs.listFiles(s, s"$base/snapshots")
      .map(_.getPath.getName).filter(_.startsWith("snap-"))
      .map(_.stripPrefix("snap-").toLong).sorted
    val (expired, retained) = snapIds.splitAt(math.max(0, snapIds.size - math.max(1, retainSnapshots)))
    // pointers first: an expired snapshot must be unreadable before any
    // component it references can go
    expired.foreach(id => graft.sources.GraftFs.deleteRecursively(s, snapPath(base, id)))
    // qualify both sides of the liveness check: snapshot files carry dirs
    // as written (possibly scheme-less), listStatus returns them qualified
    val liveComps = retained.flatMap(readSnapshot(s, base, _))
      .map(c => graft.sources.GraftFs.qualify(s, c.dir)).distinct
    val live = liveComps.toSet
    for (family <- Seq("packs", "deltas");
         st <- {
           val (fs, q) = graft.sources.GraftFs.resolve(s, s"$base/$family")
           if (fs.exists(q)) fs.listStatus(q).toSeq else Seq.empty
         } if st.isDirectory && !live.contains(st.getPath.toString))
      graft.sources.GraftFs.deleteRecursively(s, st.getPath.toString)
    // orphan sweep INSIDE live components: pack files written by dead task
    // attempts (retry/speculation) are unreferenced by the committed
    // manifest — diff the dir listing against it and delete the rest
    for (dir <- liveComps) {
      val referenced = s.read.parquet(s"$dir/manifest")
        .select("pack_path").distinct.collect()
        .map(r => graft.sources.GraftFs.qualify(s, r.getString(0))).toSet
      for (f <- graft.sources.GraftFs.listFiles(s, dir)
           if f.getPath.getName.startsWith("pack-") && !referenced.contains(f.getPath.toString))
        graft.sources.GraftFs.deleteRecursively(s, f.getPath.toString)
    }
  }

  /** The snapshot the lifecycle store's FIRST compaction publishes —
    * the ≤-c2 (80%) corpus view [[mmPackTimetravel]] time-travels to.
    * Sequence below: init=0, delta=1, compact=2, delta=3, compact=4.
    */
  val TimeTravelSnapId = 2L

  /** Full store lifecycle, then the oracle check on what survived it:
    * the corpus lands 60% as base v0, takes a delta to 80%, compacts
    * (snapshot 2 — the retained time-travel point), takes the final
    * delta to 100%, compacts again, and is vacuumed with a 3-snapshot
    * retention — so v0 and the first delta are GONE (the vacuum really
    * deletes), while snapshot 2 stays readable as-of (the retention
    * really retains). The latest view must still parse to EXACTLY the
    * container oracle (compaction/vacuum lost and invented nothing);
    * the snapshot-2 view must equal the ≤80% cut. Built once per scale
    * dir behind the fingerprint guard; PackStoreSpec drives the interim
    * states (merged-view equality, open counts, pointer atomicity,
    * expired-snapshot typed failure) at spec scale.
    */
  def ensureLifecycleStore(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val base = graft.sources.GraftFs.qualify(s,
      s"target/graft-pack-store/${ContainerOps.payloadFingerprint}-p${ContainerOps.NumPacks}-snap/$tag")
    synchronized {
      if (!graft.sources.GraftFs.hasSuccess(s, base)) {
        graft.sources.GraftFs.deleteRecursively(s, base)
        import s.implicits._
        val objs = ContainerOps.containerTable(s, dir)
        val ids = objs.map(_._1)
        val (lo, hi) = (ids.agg(min("value")).head.getLong(0), ids.agg(max("value")).head.getLong(0))
        val c1 = lo + (hi - lo) * 6 / 10
        val c2 = lo + (hi - lo) * 8 / 10
        initBase(s, base, objs.filter(_._1 <= c1), ContainerOps.NumPacks)     // snapshot 0
        appendDelta(s, base, objs.filter(o => o._1 > c1 && o._1 <= c2))       // snapshot 1
        compact(s, base, ContainerOps.NumPacks)                               // snapshot 2 (≤ c2)
        appendDelta(s, base, objs.filter(_._1 > c2))                          // snapshot 3
        compact(s, base, ContainerOps.NumPacks)                               // snapshot 4 (all)
        vacuum(s, base, retainSnapshots = 3)                                  // expire 0, 1
        graft.sources.GraftFs.writeSmallFileAtomic(s, s"$base/_SUCCESS", "done")
      }
    }
    base
  }

  val mmPackLifecycle = QueryDef(
    "q_mm_pack_lifecycle",
    (s, dir) => {
      val base = ensureLifecycleStore(s, dir)
      scan(s, base).toDF().orderBy("media_id")
    },
    Some(ContainerOps.containerOracleForStore),
  )

  /** TIME TRAVEL, oracle-checked: reading the lifecycle store AS OF its
    * first compaction (snapshot 2) must return exactly the ≤-80%-cut
    * corpus — two ingests and a rewriting compaction happened AFTER
    * that snapshot, and none of it may show. DuckDB reproduces the cut
    * with the same integer arithmetic over min/max doc_id that the
    * lifecycle build used, so the boundary is independently derived.
    */
  val mmPackTimetravel = QueryDef(
    "q_mm_pack_timetravel",
    (s, dir) => {
      val base = ensureLifecycleStore(s, dir)
      scanAt(s, base, TimeTravelSnapId).toDF().orderBy("media_id")
    },
    Some(s"""SELECT * FROM (
${ContainerOps.containerOracleBaseForStore}
) t WHERE media_id <= (SELECT MIN(doc_id) + (MAX(doc_id) - MIN(doc_id)) * 8 // 10 FROM documents)
ORDER BY media_id"""),
  )

  def defs: Seq[QueryDef] = Seq(mmPackLifecycle, mmPackTimetravel)
}
