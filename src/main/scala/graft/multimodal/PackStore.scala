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
  *   - **CURRENT is the only mutable thing.** A one-file pointer listing
  *     the live components, one `dir \t minId \t maxId` line each,
  *     swapped atomically (tmp + rename — [[graft.sources.GraftFs
  *     .writeSmallFileAtomic]]), so a reader sees the old or the new
  *     component set, never a mix. Single writer assumed (ingest and
  *     compaction serialized by the caller), readers never blocked.
  *   - **Reads union the live manifests.** `scan` prunes components by
  *     the CURRENT min/max before touching their manifests (a range
  *     lookup inside the base never even reads a delta's manifest
  *     footer), then prunes packs via the manifest exactly like
  *     [[ContainerOps.packedScan]].
  *   - **Compaction bounds read amplification.** Every delta adds pack
  *     opens to a full scan; `compact` streams all live components
  *     through one range-repartition into `packs/v<n+1>` and swaps
  *     CURRENT to it alone. `vacuum` deletes unreferenced component
  *     dirs afterwards — the delete is safe precisely because CURRENT
  *     no longer names them.
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

  def readCurrent(s: SparkSession, base: String): Seq[Component] =
    graft.sources.GraftFs.readSmallFile(s, currentPath(base)).toSeq.flatMap {
      _.split("\n").filter(_.nonEmpty).toSeq.map { line =>
        val Array(d, lo, hi) = line.split("\t")
        Component(d, lo.toLong, hi.toLong)
      }
    }

  private def writeCurrent(s: SparkSession, base: String, comps: Seq[Component]): Unit =
    graft.sources.GraftFs.writeSmallFileAtomic(s, currentPath(base),
      comps.map(c => s"${c.dir}\t${c.minId}\t${c.maxId}").mkString("\n"))

  /** Write one immutable component: payloads range-partitioned into
    * `nPacks` packfiles under `dir`, manifest rows (media_id, pack_path,
    * offset, length) emitted from the same executor-side pass. Returns
    * the component with its measured id range.
    */
  def writeComponent(s: SparkSession, objs: Dataset[(Long, Array[Byte])],
      dir: String, nPacks: Int): Component = {
    import s.implicits._
    val manifest = objs
      .repartitionByRange(nPacks, col("_1"))
      .sortWithinPartitions("_1")
      .mapPartitions { it: Iterator[(Long, Array[Byte])] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val conf = new org.apache.hadoop.conf.Configuration()
        val p = new org.apache.hadoop.fs.Path(s"$dir/pack-$pid.bin")
        val fs = p.getFileSystem(conf)
        val out = fs.create(p, true)
        var off = 0L
        val entries = Iterator.newBuilder[(Long, String, Long, Int)]
        try it.foreach { case (id, payload) =>
          out.write(payload)
          entries += ((id, s"$dir/pack-$pid.bin", off, payload.length))
          off += payload.length
        } finally out.close()
        entries.result()
      }
      .toDF("media_id", "pack_path", "offset", "length")
    manifest.write.mode("overwrite").parquet(s"$dir/manifest")
    val mm = s.read.parquet(s"$dir/manifest")
      .agg(min("media_id"), max("media_id")).head
    Component(dir, mm.getLong(0), mm.getLong(1))
  }

  /** Initialize the store: the whole batch becomes component packs/v0. */
  def initBase(s: SparkSession, base: String, objs: Dataset[(Long, Array[Byte])],
      nPacks: Int): Unit =
    writeCurrent(s, base, Seq(writeComponent(s, objs, s"$base/packs/v0", nPacks)))

  /** Land one ingest batch as a small delta component and publish it. */
  def appendDelta(s: SparkSession, base: String, objs: Dataset[(Long, Array[Byte])],
      nPacks: Int = 1): Unit = {
    val live = readCurrent(s, base)
    val k = live.count(_.dir.contains("/deltas/d"))
    val comp = writeComponent(s, objs, s"$base/deltas/d$k", nPacks)
    writeCurrent(s, base, live :+ comp)
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
      chunkBytes: Long = 128L << 20): Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    val live = idRange.fold(readCurrent(s, base)) { case (lo, hi) =>
      readCurrent(s, base).filter(c => c.maxId >= lo && c.minId <= hi)
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

  /** Merge every live component into one fresh base generation and swap
    * CURRENT to it — full scans drop back to `nPacks` opens.
    */
  def compact(s: SparkSession, base: String, nPacks: Int): Unit = {
    val next = readCurrent(s, base)
      .map(_.dir).filter(_.contains("/packs/v"))
      .map(_.split("/packs/v").last.toLong).maxOption.getOrElse(-1L) + 1
    val comp = writeComponent(s, scanBytes(s, base), s"$base/packs/v$next", nPacks)
    writeCurrent(s, base, Seq(comp))
  }

  /** Delete component dirs CURRENT no longer references (safe exactly
    * because the pointer swap already made them unreachable).
    */
  def vacuum(s: SparkSession, base: String): Unit = {
    val live = readCurrent(s, base).map(_.dir).toSet
    for (family <- Seq("packs", "deltas");
         st <- {
           val (fs, q) = graft.sources.GraftFs.resolve(s, s"$base/$family")
           if (fs.exists(q)) fs.listStatus(q).toSeq else Seq.empty
         } if st.isDirectory && !live.contains(st.getPath.toString))
      graft.sources.GraftFs.deleteRecursively(s, st.getPath.toString)
  }

  /** Full store lifecycle, then the oracle check on what survived it:
    * the corpus lands 60% as base v0 + two delta ingests, gets compacted
    * to v1 and vacuumed — and the compacted store must still parse to
    * EXACTLY the container oracle (compaction/vacuum lost and invented
    * nothing). Built once per scale dir behind the fingerprint guard;
    * PackStoreSpec drives the interim states (merged-view equality, open
    * counts before/after, pointer atomicity) at spec scale.
    */
  def ensureLifecycleStore(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val base = graft.sources.GraftFs.qualify(s,
      s"target/graft-pack-store/${ContainerOps.payloadFingerprint}-p${ContainerOps.NumPacks}/$tag")
    synchronized {
      if (!graft.sources.GraftFs.hasSuccess(s, base)) {
        graft.sources.GraftFs.deleteRecursively(s, base)
        import s.implicits._
        val objs = ContainerOps.containerTable(s, dir)
        val ids = objs.map(_._1)
        val (lo, hi) = (ids.agg(min("value")).head.getLong(0), ids.agg(max("value")).head.getLong(0))
        val c1 = lo + (hi - lo) * 6 / 10
        val c2 = lo + (hi - lo) * 8 / 10
        initBase(s, base, objs.filter(_._1 <= c1), ContainerOps.NumPacks)
        appendDelta(s, base, objs.filter(o => o._1 > c1 && o._1 <= c2))
        appendDelta(s, base, objs.filter(_._1 > c2))
        compact(s, base, ContainerOps.NumPacks)
        vacuum(s, base)
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

  def defs: Seq[QueryDef] = Seq(mmPackLifecycle)
}
