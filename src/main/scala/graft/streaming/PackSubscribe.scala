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

  /** One poll's emissions: object ADDS (id, payload), id DELETES (the
    * changelog's retraction records, from tombstone publishes), and the
    * new cursor to persist.
    */
  final case class Changes(adds: Dataset[(Long, Array[Byte])],
      deletes: Dataset[Long], tip: Long)

  /** Changes published in snapshots (`lastSeen`, tip], each exactly
    * once. `lastSeen = -1` subscribes from the beginning. Returns empty
    * datasets (cursor unchanged) when already caught up. `delete`
    * publishes emit their tombstone id set as retractions; `compact`
    * publishes emit nothing (they also physically drop previously
    * retracted ids — a subscriber that applied the retraction already
    * has nothing to do).
    */
  def poll(s: SparkSession, base: String, lastSeen: Long): Changes = {
    import s.implicits._
    val tip = PackStore.latestSnapshotId(s, base).getOrElse(-1L)
    if (tip <= lastSeen) Changes(s.emptyDataset[(Long, Array[Byte])], s.emptyDataset[Long], lastSeen)
    else {
      val fresh = for {
        k <- (lastSeen + 1) to tip
        if PackStore.snapshotKind(s, base, k) != "compact"
        prev = if (k == 0) Set.empty[String]
               else PackStore.readSnapshot(s, base, k - 1).map(_.dir).toSet
        c <- PackStore.readSnapshot(s, base, k) if !prev.contains(c.dir)
      } yield c
      val (tombs, data) = fresh.partition(_.dir.contains("/tombs/"))
      val deletes = tombs.map(c => s.read.parquet(c.dir).select("media_id").as[Long])
        .reduceOption(_.unionByName(_)).getOrElse(s.emptyDataset[Long]).distinct()
      Changes(PackStore.scanComponents(s, data), deletes, tip)
    }
  }
}
