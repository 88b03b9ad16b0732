package graft.operators

import org.apache.spark.sql.SparkSession

// Throwaway diagnostic: price the LSM trade compactTail exists for — on
// a store with a corpus-sized base and an ingest-sized tail, the tail
// fold must cost ~the tail while the full compaction costs ~the corpus.
// Usage: runMain graft.operators.TailCompactProbe <sfDir>
object TailCompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.multimodal.{ContainerOps, PackStore}
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def freshStore(suffix: String): String = {
      val base = java.nio.file.Files.createTempDirectory(s"graft_tcprobe_$suffix")
        .toFile.getAbsolutePath + "/store"
      // 10x-amplified corpus (id-offset replicas) so the data-proportional
      // cost dominates the fixed per-publish overhead
      val one = ContainerOps.containerTable(spark, dir)
      val nOne = one.count()
      val objs = spark.range(0, 10).toDF("rep").crossJoin(one.toDF("oid", "payload"))
        .select(($"rep" * nOne + $"oid").as[Long], $"payload".as[Array[Byte]])
        .map(identity)
      val n = nOne * 10
      val cut = (n * 9) / 10
      PackStore.initBase(spark, base, objs.filter(_._1 < cut), 8)   // 90% base
      for (k <- 0 until 4)                                           // 4 small deltas
        PackStore.appendDelta(spark, base,
          objs.filter(o => o._1 >= cut + k * (n - cut) / 4 && o._1 < cut + (k + 1) * (n - cut) / 4))
      PackStore.deleteIds(spark, base, objs.map(_._1).filter(i => i >= cut && i % 7 == 0))
      base
    }

    val b1 = freshStore("tail")
    val before = PackStore.scanBytes(spark, b1).count()
    val (_, tTail) = timed(PackStore.compactTail(spark, b1, 1))
    assert(PackStore.scanBytes(spark, b1).count() == before, "tail fold changed the view")

    val b2 = freshStore("full")
    val (_, tFull) = timed(PackStore.compact(spark, b2, 8))

    println(f"TAILCOMPACT tail_fold_s=$tTail%.2f full_compact_s=$tFull%.2f ratio=${tFull / tTail}%.1f")
    spark.stop()
  }
}
