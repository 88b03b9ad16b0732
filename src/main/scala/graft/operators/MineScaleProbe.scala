package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic (builder tooling, not part of the library
  * surface): decade-style scale readings for the mining family across
  * fixture dirs — does the PassJoin candidate volume stay a vanishing
  * fraction of the brute-force pair space, and does the itemsets
  * self-join volume grow linearly in baskets (bounded per-basket
  * fan-out)? Usage: runMain graft.operators.MineScaleProbe <dir> [dir2…]
  */
object MineScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      // PassJoin: candidates vs brute pairs vs true pairs
      val docs = Tables.documents(spark, dir)
        .filter(col("n_chars") >= 40)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("p")).cache()
      val n = docs.count()
      val segs = docs.select(col("doc_id").as("id_a"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("seg"), substring(col("p"), i * 10 + 1, 10).as("g"))): _*)).as("sg"))
        .select(col("id_a"), col("sg.seg").as("seg"), col("sg.g").as("g"))
      val starts = for { i <- 0 until 4; d <- -3 to 3; st = i * 10 + 1 + d
                         if st >= 1 && st + 9 <= 40 } yield (i, st)
      val probes = docs.select(col("doc_id").as("id_b"),
        explode(array(starts.map { case (i, st) =>
          struct(lit(i).as("seg"), substring(col("p"), st, 10).as("g")) }: _*)).as("pr"))
        .select(col("id_b"), col("pr.seg").as("seg"), col("pr.g").as("g"))
      val cand = segs.join(probes, Seq("seg", "g"))
        .filter(col("id_a") =!= col("id_b"))
        .select(least(col("id_a"), col("id_b")).as("a"), greatest(col("id_a"), col("id_b")).as("b"))
        .distinct().count()
      val truePairs = MiningQueries.simEditdist.query(spark, dir).count()
      val brute = n * (n - 1) / 2
      println(f"MINESCALE $dir editdist: n=$n brute=$brute cand=$cand (${100.0 * cand / brute}%.4f%%) true=$truePairs")
      docs.unpersist()
      // itemsets: self-join volume vs baskets
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct().cache()
      val baskets = li.select("ok").distinct().count()
      val pairVolume = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk")).count()
      val maxBasket = li.groupBy("ok").count().agg(max("count")).head().getLong(0)
      println(f"MINESCALE $dir itemsets: baskets=$baskets pairJoinRows=$pairVolume " +
        f"perBasket=${pairVolume.toDouble / baskets}%.2f maxBasket=$maxBasket")
      li.unpersist()
    }
    spark.stop()
  }
}
