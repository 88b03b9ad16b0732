package graft

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Test-only FileSystem that records every directory listing — the
  * measurement harness RefreshSpec uses to PROVE that re-listing after a
  * partition refresh is partition-pruned (the 100 TB cost claim of
  * E-R6): a query pinned to one partition must listStatus only that
  * partition's directory, never the siblings.
  *
  * Registered under the `graftcount` scheme via
  * `fs.graftcount.impl` in the Hadoop conf; instantiated reflectively by
  * Hadoop, hence top-level class + no-arg constructor.
  */
class CountingFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftcount"
  override def getUri: URI = URI.create("graftcount:///")

  override def listStatus(p: Path): Array[FileStatus] = {
    CountingFileSystem.record(p.toUri.getPath)
    super.listStatus(p)
  }

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    CountingFileSystem.recordOpen(f.toUri.getPath)
    super.open(f, bufferSize)
  }
}

/** FileContext-side binding for the `graftcount` scheme (FileContext
  * resolves AbstractFileSystem, not FileSystem — needed by the atomic
  * rename in GraftFs.writeSmallFileAtomic). Registered via
  * `fs.AbstractFileSystem.graftcount.impl`.
  */
class CountingAbstractFs(uri: URI, conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new CountingFileSystem, conf, "graftcount", false)

object CountingFileSystem {
  private val listed = scala.collection.mutable.ArrayBuffer.empty[String]
  private val opened = scala.collection.mutable.ArrayBuffer.empty[String]

  private def record(path: String): Unit = synchronized { listed += path; () }

  private def recordOpen(path: String): Unit = synchronized { opened += path; () }

  def reset(): Unit = synchronized { listed.clear(); opened.clear() }

  def listedPaths: Seq[String] = synchronized { listed.toVector }

  def openedPaths: Seq[String] = synchronized { opened.toVector }
}
