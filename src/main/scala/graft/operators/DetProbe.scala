package graft.operators

import org.apache.spark.sql.SparkSession

// Throwaway diagnostic: partition-count invariance sweep — run the named
// queries under two shuffle-partition settings and diff the collected
// row strings positionally (SURVEY §7.5 rule 3: every oracle query must
// be partition-count invariant because the driver picks its own thread
// count). Usage: runMain graft.operators.DetProbe <sfDir> q_a q_b ...
object DetProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names =
      if (args.drop(1).toSeq == Seq("--all")) graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq
    def rows(cpus: Int): Map[String, Seq[String]] = {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .appName(s"detprobe_$cpus")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val out = names.map { n =>
        n -> graft.SparkEntry.queries(n)(spark, dir).collect().map(_.toString).toSeq
      }.toMap
      spark.stop()
      out
    }
    val a = rows(4)
    val b = rows(32)
    for (n <- names) {
      val same = a(n) == b(n)
      val firstDiff = if (same) "" else
        a(n).zip(b(n)).zipWithIndex.collectFirst { case ((x, y), i) if x != y => s" first_diff@$i: $x VS $y" }
          .getOrElse(s" size ${a(n).size} vs ${b(n).size}")
      println(s"DETPROBE $n invariant=$same rows=${a(n).size}$firstDiff")
    }
  }
}
