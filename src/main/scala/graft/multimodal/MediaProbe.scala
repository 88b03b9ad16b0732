package graft.multimodal

import org.apache.spark.sql.SparkSession

/** Decode batch-shape / partition-pressure probe (SURVEY round-6 idea 1):
  * the multimodal decode is a narrow mapPartitions over the scan, so its
  * parallelism, straggler profile, and peak memory are entirely decided
  * by how the scan splits — `spark.sql.files.maxPartitionBytes` at read
  * time. This measures, per setting: partition count, rows/partition and
  * payload-MB/partition spread (min / median / max), and the wall time of
  * a full decode pass. The spread is the number that matters at 100 TB:
  * a fat partition is a straggler AND a memory spike (payload batches are
  * held per-partition during decode), so the knob trades scheduling
  * overhead against tail latency.
  *
  * Diagnostic main (driver-side collect of per-partition summaries is the
  * point here, not a query path). Run at sf0.1+ — at sf0.01 the fixture
  * is one small file and never splits.
  */
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // A single fixture parquet is one row group and never splits, so
    // materialize the media table as a MULTI-FILE object store first
    // (50 files ≈ the many-small-objects layout a media corpus actually
    // has); the scan then packs files into partitions by
    // maxPartitionBytes + openCostInBytes, which is the behavior under
    // measurement.
    val tag = graft.sources.GraftFs.scaleTag(spark, sfDir)
    val store = graft.sources.GraftFs.qualify(spark, s"target/graft-media/$tag/objects")
    if (!graft.sources.GraftFs.hasSuccess(spark, store))
      MultimodalOps.mediaTable(spark, sfDir).toDF()
        .repartition(50, org.apache.spark.sql.functions.col("media_id"))
        .write.mode("overwrite").parquet(store)

    println("MEDIAPROBE maxPartitionBytes n_parts rows[min/med/max] payloadMB[min/med/max] decode_s")
    for (mpb <- Seq("64k", "256k", "1m", "128m")) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      def media = spark.read.parquet(store).as[MultimodalOps.MediaRow]
      val stats = media.rdd.mapPartitions { it =>
        var rows = 0L; var bytes = 0L
        it.foreach { m => rows += 1; bytes += m.payload.length }
        Iterator((rows, bytes))
      }.collect().filter(_._1 > 0).sortBy(_._1)
      val t0 = System.nanoTime()
      MultimodalOps.decodeAll(media).count()
      val decodeS = (System.nanoTime() - t0) / 1e9
      def fmt(v: Seq[Double]): String =
        f"${v.min}%.1f/${v(v.length / 2)}%.1f/${v.max}%.1f"
      val rows = stats.map(_._1.toDouble).toSeq
      val mb = stats.map(_._2 / 1e6).sorted.toSeq
      println(f"MEDIAPROBE $mpb ${stats.length} ${fmt(rows)} ${fmt(mb)} $decodeS%.2f")
    }
    spark.stop()
  }
}
