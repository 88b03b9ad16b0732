package graft

/** Per-query regression diff over the bench history log
  * (target/graft-bench-history.jsonl, appended by every Bench run):
  * compares the last two runs at the same (sf, reps, cpus) — a settings
  * change between runs is a different experiment, not a regression — and
  * prints queries whose median moved more than `threshold`× in either
  * direction, worst first. Runs at the same sf under DIFFERENT settings
  * are reported as a mismatch instead of being diffed. No JSON library on
  * the classpath is assumed beyond what the line format guarantees (flat
  * string/number fields written by Bench itself; pre-r6 lines without
  * reps/cpus group under "?" and only diff against each other).
  */
object BenchDiff {
  private val QueriesRe = """"queries":\{([^}]*)\}""".r
  private val SfRe = """"sf":"([^"]*)"""".r
  private val RepsRe = """"reps":([0-9]+)""".r
  private val CpusRe = """"cpus":"?([0-9*]+)"?""".r
  private val PairRe = """"([^"]+)":(-?[0-9.Ee+-]+)""".r

  private def parse(line: String): Option[((String, String), Map[String, Double])] = for {
    qm <- QueriesRe.findFirstMatchIn(line)
    sf <- SfRe.findFirstMatchIn(line).map(_.group(1))
  } yield {
    val reps = RepsRe.findFirstMatchIn(line).map(_.group(1)).getOrElse("?")
    val cpus = CpusRe.findFirstMatchIn(line).map(_.group(1)).getOrElse("?")
    // negative medians mark failed queries (Bench r6+) — exclude from diffs
    (sf, s"reps=$reps,cpus=$cpus") -> PairRe.findAllMatchIn(qm.group(1))
      .map(m => m.group(1) -> m.group(2).toDouble).filter(_._2 >= 0).toMap
  }

  def main(args: Array[String]): Unit = {
    val threshold = if (args.nonEmpty) args(0).toDouble else 1.5
    val path = java.nio.file.Paths.get("target/graft-bench-history.jsonl")
    if (!java.nio.file.Files.exists(path)) { println("BENCHDIFF no history"); return }
    val runs = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(path)).asScala.flatMap(parse(_)).toSeq
    runs.groupBy(_._1._1).foreach { case (sf, atSf) =>
      if (atSf.map(_._1._2).distinct.size > 1)
        println(s"BENCHDIFF sf=$sf settings differ across runs " +
          s"(${atSf.map(_._1._2).distinct.mkString(" vs ")}) — diffing within matching settings only")
    }
    val bySf = runs.groupBy(_._1).filter(_._2.size >= 2)
    if (bySf.isEmpty) { println("BENCHDIFF need two runs at one (sf, settings)"); return }
    for (((sf, settings), rs) <- bySf) {
      val prev = rs(rs.size - 2)._2
      val cur = rs.last._2
      val moved = cur.keySet.intersect(prev.keySet).toSeq
        .map { q => (q, prev(q), cur(q), cur(q) / math.max(prev(q), 1e-9)) }
        .filter { case (_, p, c, r) => (r >= threshold || r <= 1.0 / threshold) && math.max(p, c) >= 0.5 }
        .sortBy { case (_, _, _, r) => -math.abs(math.log(r)) }
      println(f"BENCHDIFF sf=$sf [$settings] runs=${rs.size} moved=${moved.size} (>${threshold}x, max>=0.5s)")
      moved.take(20).foreach { case (q, p, c, r) =>
        println(f"BENCHDIFF   $q: $p%.2f -> $c%.2f (${r}%.2fx)")
      }
    }
  }
}
