package graft.operators

import org.apache.spark.sql.SparkSession

// Throwaway diagnostic: the round-12 continuation's scale claims, measured
// at sf0.01 vs sf0.1 (x10 rows). Claims under test:
//   - q_stat_bootstrap: all R=40 replicates reduce in ONE scan (map-side
//     partials; the shuffle carries |groups|*R rows regardless of corpus
//     size) -- wall should grow sub-linearly in the x10 input, nowhere
//     near the x400 a resample-by-index bootstrap would pay.
//   - q_text_winnow: linear explode + one (doc, window) hash aggregate --
//     wall ~linear, selected-fingerprint density scale-invariant (the
//     2/(w+1) theory is per-window, independent of corpus size).
//   - q_layout_hilbert: a constant-size per-row fold -- wall ~linear,
//     same shape as the z-order row it sits beside.
// Usage: runMain graft.operators.R12bScaleProbe
object R12bScaleProbe {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val big = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def med(f: => Unit): Double =
      (1 to 3).map(_ => timed(f)._2).sorted.apply(1)

    for (dir <- Seq(small, big)) {
      val rows = graft.Tables.lineitem(spark, dir).count()
      val tb = med(ResampleQueries.statBootstrap.query(spark, dir).collect())
      val tp = med(ResampleQueries.statPermutation.query(spark, dir).collect())
      println(f"R12bPROBE resample $dir rows=$rows bootstrap=$tb%.2f s permutation=$tp%.2f s")
    }

    for (dir <- Seq(small, big)) {
      val (n, _) = timed(TextQueries.textWinnow.query(spark, dir).count())
      val tw = med(TextQueries.textWinnow.query(spark, dir).count())
      val grams = graft.Tables.documents(spark, dir)
        .selectExpr("greatest(size(split(text, ' ')) - 2, 0) AS g")
        .agg(org.apache.spark.sql.functions.sum("g")).head().getLong(0)
      println(f"R12bPROBE winnow $dir fps=$n grams=$grams density=${n.toDouble / grams}%.3f wall=$tw%.2f s")
    }

    for (dir <- Seq(small, big)) {
      val th = med(LayoutQueries.layoutHilbert.query(spark, dir).collect())
      val tz = med(LayoutQueries.layoutZorder.query(spark, dir).collect())
      println(f"R12bPROBE layout $dir hilbert=$th%.2f s zorder=$tz%.2f s")
    }
    spark.stop()
  }
}
