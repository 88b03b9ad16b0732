package graft

import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test-only FileSystem (`graftfault` scheme) that injects the failure
  * modes the CAS/compaction protocol must survive (CasCrashSpec):
  *
  *   - renameLieOnce(substr): the next rename whose DESTINATION contains
  *     substr PHYSICALLY LANDS but reports failure — the ambiguous-CAS
  *     case (an RPC failure after the exclusive rename landed); through
  *     the FileContext delegate this surfaces to GraftFs as an
  *     IOException with the target existing, i.e. CAS-reports-lost.
  *   - failCreateOnce(substr): the next create whose path contains substr
  *     throws — a crash mid-publish (before or after the CAS, depending
  *     on the pattern).
  *   - failDeleteOnce(substr): the next delete whose path contains substr
  *     throws — a crash during deferred GC of folded segment dirs.
  *
  * Schedules are one-shot and recorded; a spec must assert `fired`, or it
  * silently tested nothing. Registered via `fs.graftfault.impl` +
  * `fs.AbstractFileSystem.graftfault.impl` (FileSystem instances are
  * cached per scheme, hence the static schedule).
  */
class FaultInjectingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfault"
  override def getUri: URI = URI.create("graftfault:///")

  override def rename(src: Path, dst: Path): Boolean = {
    val r = super.rename(src, dst)
    if (r && FaultInjectingFileSystem.take("renameLie", dst.toUri.getPath)) false
    else r
  }

  // both create chains (with and without permission) — RawLocalFileSystem
  // routes FileSystem.create(Path, overwrite) through the latter
  override def create(f: Path, permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (FaultInjectingFileSystem.take("failCreate", f.toUri.getPath))
      throw new java.io.IOException(s"injected create failure at $f")
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (FaultInjectingFileSystem.take("failCreate", f.toUri.getPath))
      throw new java.io.IOException(s"injected create failure at $f")
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    if (FaultInjectingFileSystem.take("failDelete", p.toUri.getPath))
      throw new java.io.IOException(s"injected delete failure at $p")
    super.delete(p, recursive)
  }
}

/** FileContext-side binding (the CAS rename goes through FileContext). */
class FaultInjectingAbstractFs(uri: URI, conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new FaultInjectingFileSystem, conf, "graftfault", false)

object FaultInjectingFileSystem {
  private val scheduled = new ConcurrentHashMap[(String, String), AtomicInteger]()
  private val firedLog = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

  private[graft] def take(kind: String, path: String): Boolean = {
    val it = scheduled.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val (k, substr) = e.getKey
      if (k == kind && path.contains(substr) && e.getValue.getAndDecrement() > 0) {
        synchronized { firedLog += ((kind, path)); () }
        return true
      }
    }
    false
  }

  def renameLieOnce(substr: String): Unit =
    scheduled.put(("renameLie", substr), new AtomicInteger(1)): Unit
  def failCreateOnce(substr: String): Unit =
    scheduled.put(("failCreate", substr), new AtomicInteger(1)): Unit
  def failDeleteOnce(substr: String): Unit =
    scheduled.put(("failDelete", substr), new AtomicInteger(1)): Unit

  def reset(): Unit = { scheduled.clear(); synchronized { firedLog.clear() } }
  def fired: Seq[(String, String)] = synchronized { firedLog.toVector }
  def pending: Int = {
    var n = 0
    scheduled.values().forEach(v => n += math.max(0, v.get()))
    n
  }
}
