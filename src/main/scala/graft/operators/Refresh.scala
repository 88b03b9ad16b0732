package graft.operators

import java.util.concurrent.{Executors, TimeUnit}
import scala.concurrent.{Await, ExecutionContext, Future, TimeoutException}
import scala.concurrent.duration._
import scala.util.control.NonFatal

import org.apache.spark.sql.{Dataset, SparkSession}

/** One refresh target (reference: `ImpalaNode.hostName`,
  * /root/reference/impala-refresher.go:28-40). The reference fans out over N
  * impalad hosts; a Spark driver has one catalog, so the engine fans out
  * over N tables (SURVEY.md §2.A R2 mapping).
  */
final case class RefreshTarget(name: String)

/** Per-target outcome (reference: `ImpalaNode` result fields,
  * /root/reference/impala-refresher.go:30-39). Documented deviations from
  * the reference (SURVEY.md §7.1 slice 1): the real error message is kept
  * (the reference discards it, impala-refresher.go:59) and duration is
  * recorded on the timeout path too (the reference leaves it zero,
  * impala-refresher.go:81-86).
  */
final case class RefreshResult(target: String, ok: Boolean, error: Option[String], durationNanos: Long)

/** Group A — catalog refresh orchestration (SURVEY.md §2.B Group A),
  * replicating /root/reference/impala-refresher.go semantics on Spark:
  * concurrent fan-out with a bounded window (ref R6, :108-135), per-target
  * timeout with job cancellation (ref R4, :66-87), per-target report (ref
  * R5/R13) and all-or-nothing exit code (ref R11, :173-180).
  */
object Refresh {

  /** E-R1: reload metadata + file listing for one table so the next scan
    * sees files added behind the catalog's back (semantics of ref R2,
    * impala-refresher.go:48-49 — Impala `REFRESH <table>` → Spark
    * `REFRESH TABLE`).
    */
  def refreshTable(spark: SparkSession, table: String): Unit =
    spark.catalog.refreshTable(table)

  /** E-R6: partition-scoped refresh — Impala's `REFRESH <table>
    * PARTITION (<spec>)` (reload one partition's file listing after
    * files changed behind the catalog's back) mapped onto Spark's
    * catalog. Impala parity kept: an unknown partition is an ERROR, not
    * a no-op, and — like Impala's form — this reloads an EXISTING
    * partition; discovering brand-new partition directories is
    * `ALTER TABLE ... RECOVER PARTITIONS` territory.
    *
    * Documented deviation (same class as SURVEY §7.1's): Spark's public
    * invalidation granularity is the TABLE (`refreshTable`;
    * `refreshByPath` only recaches cached plans — probed empirically),
    * so the *invalidation* here is table-wide. The partition-scoping
    * that matters at 100 TB — the RE-LIST COST — is preserved anyway:
    * Spark's CatalogFileIndex re-lists lazily and partition-pruned, so
    * the next query pays listing only for the partitions it actually
    * scans, not the 10k others (RefreshSpec proves this with a
    * listStatus-counting FileSystem: after a partition refresh, a query
    * pinned to that partition lists ONLY that partition's directory).
    */
  def refreshPartition(spark: SparkSession, table: String, spec: Map[String, String]): Unit = {
    require(spec.nonEmpty, "empty partition spec")
    val specSql = spec.map { case (k, v) => s"$k='$v'" }.mkString(", ")
    val wanted = spec.map { case (k, v) => s"$k=$v" }.toSet
    // existence validation collects SHOW PARTITIONS — O(#partitions) of
    // metadata strings on the driver (Impala parity: it errors on unknown
    // partitions). Bounded and metadata-only, but at ~10^5+ partitions
    // prefer a catalog listPartitions call filtered by the spec (one
    // partition probe) over materializing the full listing.
    val known = spark.sql(s"SHOW PARTITIONS $table").collect()
      .map(_.getString(0).split("/").toSet)
    require(known.contains(wanted),
      s"partition ($specSql) not found in $table") // Impala errors on unknown partitions
    // best-effort targeted recache for plans cached over this partition's
    // files, then the table-granular invalidation Spark actually offers
    spark.sql(s"DESCRIBE FORMATTED $table PARTITION ($specSql)").collect()
      .find(_.getString(0).trim == "Location").map(_.getString(1))
      .foreach(spark.catalog.refreshByPath)
    spark.catalog.refreshTable(table)
  }

  /** R10: parse a comma-separated target list. Deviation from the reference
    * (impala-refresher.go:170-172): empty segments are rejected instead of
    * silently producing an empty hostname.
    */
  def parseTargets(arg: String): Seq[RefreshTarget] = {
    val names = arg.split(",").map(_.trim).toSeq
    require(names.nonEmpty && names.forall(_.nonEmpty), s"empty refresh target in '$arg'")
    names.map(RefreshTarget)
  }

  /** E-R2 + E-R3: concurrent refresh of N targets on a bounded window
    * (`concurrency == 0` ⇒ unbounded, ref :122/:153), each with a deadline.
    * On timeout the target is marked failed and its Spark jobs are cancelled
    * via the job tag — the analogue of the reference's `Process.Kill()`
    * (impala-refresher.go:79-80). The action is pluggable for tests; the
    * default is the real catalog refresh.
    */
  def refreshAll(
      spark: SparkSession,
      targets: Seq[RefreshTarget],
      timeout: Duration = 60.seconds,
      concurrency: Int = 0,
      action: String => Unit = null,
      onDispatch: String => Unit = _ => (),
  ): Seq[RefreshResult] = {
    val act: String => Unit = if (action == null) t => refreshTable(spark, t) else action
    // Outer pool = the reference's sliding dispatch window (ref R6): at most
    // `concurrency` targets in flight. Inner pool runs the actual action so
    // the deadline is raced against completion from *dispatch* time — the
    // structural twin of the reference's goroutine + select (ref R3/R4).
    val window =
      if (concurrency <= 0) Executors.newCachedThreadPool()
      else Executors.newFixedThreadPool(concurrency)
    val workers = Executors.newCachedThreadPool()
    val windowEc = ExecutionContext.fromExecutorService(window)
    val workerEc = ExecutionContext.fromExecutorService(workers)
    try {
      val futures = targets.map { target =>
        val tag = s"graft-refresh-${target.name}"
        Future {
          // fires when the sliding window actually admits the target, not
          // at submission — the reference's dispatch-time progress line
          // "Refreshing X's metadata..." (ref R13, impala-refresher.go:115)
          onDispatch(target.name)
          val start = System.nanoTime()
          val run = Future {
            spark.sparkContext.addJobTag(tag)
            try act(target.name)
            finally spark.sparkContext.removeJobTag(tag)
          }(workerEc)
          try {
            Await.result(run, timeout)
            RefreshResult(target.name, ok = true, None, System.nanoTime() - start)
          } catch {
            case _: TimeoutException =>
              // analogue of the reference's Process.Kill() (ref :79-80)
              spark.sparkContext.cancelJobsWithTag(tag)
              RefreshResult(target.name, ok = false,
                Some(s"${target.name} timed out after $timeout"), System.nanoTime() - start)
            case NonFatal(e) =>
              RefreshResult(target.name, ok = false, Some(e.toString), System.nanoTime() - start)
          }
        }(windowEc)
      }
      futures.map(f => Await.result(f, Duration.Inf))
    } finally {
      window.shutdown()
      workers.shutdownNow() // interrupt any timed-out stragglers
      window.awaitTermination(1, TimeUnit.SECONDS)
      ()
    }
  }

  /** E-R4: results as a Dataset (the engine-native report; ref R5/R13 print
    * lines become rows).
    */
  def report(spark: SparkSession, results: Seq[RefreshResult]): Dataset[RefreshResult] = {
    import spark.implicits._
    spark.createDataset(results)
  }

  /** E-R5: AND-reduction to a process exit code (ref R11,
    * impala-refresher.go:173-180).
    */
  def exitCode(results: Seq[RefreshResult]): Int =
    if (results.nonEmpty && results.forall(_.ok)) 0 else 1
}

/** Parsed CLI invocation. `table` is Some for the reference-shaped
  * `-table` + `-nodes` form (refresh that one table once per node target,
  * reference impala-refresher.go:151-152) and None for the engine-native
  * `-targets` form (each target names a table in the one Spark catalog —
  * the SURVEY §2.A R2 mapping).
  */
final case class RefresherConfig(
    targets: Seq[RefreshTarget],
    table: Option[String],
    timeout: Duration,
    concurrency: Int)

/** CLI mirroring the reference's flags exactly (ref R8/R9,
  * impala-refresher.go:150-160): `-table <t> -nodes n1,n2,...` (BOTH
  * required, like ref :157-160's usage-and-exit-1), `-timeout` seconds
  * (default 60), `-concurrency` (default 0 = unlimited). The engine-native
  * `-targets t1,t2,...` form (N tables, one catalog) is accepted as an
  * alternative to `-table`/`-nodes`.
  */
object RefresherApp {
  private val usageText =
    """usage: RefresherApp -table <table> -nodes n1,n2,... [-timeout seconds] [-concurrency n]
      |       RefresherApp -targets t1,t2,... [-timeout seconds] [-concurrency n]""".stripMargin

  /** R8/R9: flag parsing + required-argument validation, returned as data so
    * the validation rules are unit-testable (RefreshSpec).
    */
  def parseArgs(args: Array[String]): Either[String, RefresherConfig] = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val table = opts.getOrElse("-table", "")
    val nodes = opts.getOrElse("-nodes", "")
    val targetsArg = opts.getOrElse("-targets", "")
    val timeout = opts.get("-timeout").map(_.toInt).getOrElse(60).seconds
    val concurrency = opts.get("-concurrency").map(_.toInt).getOrElse(0)
    if (table.nonEmpty || nodes.nonEmpty) {
      // reference shape: both -table and -nodes are required (ref :157-160)
      if (table.isEmpty || nodes.isEmpty) Left(usageText)
      else Right(RefresherConfig(Refresh.parseTargets(nodes), Some(table), timeout, concurrency))
    } else if (targetsArg.nonEmpty)
      Right(RefresherConfig(Refresh.parseTargets(targetsArg), None, timeout, concurrency))
    else Left(usageText)
  }

  def main(args: Array[String]): Unit = {
    val cfg = parseArgs(args) match {
      case Left(msg) => System.err.println(msg); sys.exit(1)
      case Right(c) => c
    }
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      // -table form: every node target runs a refresh of that one table
      // (the catalog is the node analogue); -targets form: each target IS
      // the table.
      val action: String => Unit = cfg.table match {
        case Some(t) => _ => Refresh.refreshTable(spark, t)
        case None => t => Refresh.refreshTable(spark, t)
      }
      val results = Refresh.refreshAll(spark, cfg.targets, cfg.timeout, cfg.concurrency, action,
        onDispatch = t => println(s"Refreshing $t's metadata..."))
      results.foreach { r =>
        if (r.ok) println(s"${r.target} refreshed successfully! Took: ${r.durationNanos / 1e9}s")
        else println(s"${r.target} failed to refresh! (${r.error.getOrElse("")})")
      }
      sys.exit(Refresh.exitCode(results))
    } finally spark.stop()
  }
}
