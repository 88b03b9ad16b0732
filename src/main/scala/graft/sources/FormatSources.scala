package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink adapters for the interchange formats the engine supports
  * beyond parquet: CSV, JSON lines, ORC (all Spark-built-in datasources,
  * vectorized where the format allows).
  *
  * Scale notes: every reader takes an explicit schema — schema inference
  * is a full extra pass over the data, which is never acceptable at 100 TB;
  * writers partition however the upstream plan is partitioned (no
  * coalesce), so sink parallelism = plan parallelism.
  */
object FormatSources {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Small-file compaction — the maintenance op every streaming/incremental
    * parquet dataset needs: N small files become ceil(bytes/target) files
    * of ~targetBytes each. Reads once, repartitions once (round-robin —
    * no key skew), writes once; at 100 TB this runs per-partition-dir, not
    * globally. Returns the output file count.
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val bytes = GraftFs.listFiles(spark, inPath)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    GraftFs.listFiles(spark, outPath).count(_.getPath.getName.endsWith(".parquet"))
  }
}
