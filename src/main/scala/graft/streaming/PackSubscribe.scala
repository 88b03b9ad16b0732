package graft.streaming

import graft.multimodal.PackStore
import org.apache.spark.sql.{Dataset, SparkSession}

/** Changelog subscription over the pack store (Group L infra — the
  * s_pack_subscribe component, the READ twin of [[PackIngest]]).
  *
  * A downstream consumer (feature extraction, indexing, replication)
  * wants every ingested object exactly once, not repeated corpus scans.
  * The snapshot log already IS a changelog — each publish records its
  * component list and, since r7b, its KIND:
  *
  *   - `init` / `delta` snapshots carry NEW data: exactly the components
  *     added relative to the predecessor snapshot;
  *   - `compact` snapshots only REWRITE existing data into a fresh
  *     generation — a subscriber must emit nothing for them (the classic
  *     changelog-vs-storage distinction: compaction is not an event).
  *
  * `poll` reads forward from the caller's last-seen snapshot id to the
  * tip, unions the data-bearing component diffs, and returns the new tip
  * to persist as the caller's cursor. Exactly-once therefore reduces to
  * the caller persisting its cursor transactionally with its own output
  * — the Kafka-consumer contract, with snapshot ids as offsets.
  *
  * Lag discipline: vacuum's `retainSnapshots` window is the subscription
  * SLA. A subscriber lagging past it hits the typed expired-snapshot
  * failure (never a silent gap, never garbage reads) and must resync
  * with a full scan — exactly how log-retention overruns behave in any
  * produce/subscribe system.
  *
  * Scale shape: a poll reads only the small snapshot files in its window
  * plus the manifests of NEW components — cost tracks the new data,
  * never the corpus.
  */
object PackSubscribe {

  /** Objects published in snapshots (`lastSeen`, tip], each exactly once,
    * and the new cursor. `lastSeen = -1` subscribes from the beginning.
    * Returns an empty dataset (cursor unchanged) when already caught up.
    */
  def poll(s: SparkSession, base: String,
      lastSeen: Long): (Dataset[(Long, Array[Byte])], Long) = {
    import s.implicits._
    val tip = PackStore.latestSnapshotId(s, base).getOrElse(-1L)
    if (tip <= lastSeen) (s.emptyDataset[(Long, Array[Byte])], lastSeen)
    else {
      val fresh = for {
        k <- (lastSeen + 1) to tip
        if PackStore.snapshotKind(s, base, k) != "compact"
        prev = if (k == 0) Set.empty[String]
               else PackStore.readSnapshot(s, base, k - 1).map(_.dir).toSet
        c <- PackStore.readSnapshot(s, base, k) if !prev.contains(c.dir)
      } yield c
      (PackStore.scanComponents(s, fresh), tip)
    }
  }
}
