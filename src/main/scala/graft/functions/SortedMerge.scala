package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Shared sorted-merge intersection count used by both long-array intersect
  * expressions — one implementation of the tricky loop for interpreted eval,
  * one generator for codegen, so the variants cannot drift apart.
  * `need ≤ 0` disables the early exit (plain intersect size).
  */
private[functions] object SortedMerge {

  def countLong(x: ArrayData, y: ArrayData, need: Int): Int = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < nx && j < ny) {
      if (need > 0 && n + math.min(nx - i, ny - j) < need) return -1
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi == yj) { n += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    if (need > 0 && n < need) -1 else n
  }

  /** Codegen twin of countLong: emits Java assigning the count to `out`.
    * `needExpr` is a Java int expression; pass "0" for the plain variant.
    */
  def genCountLong(
      fresh: String => String, a: String, b: String, needExpr: String, out: String): String = {
    val i = fresh("i")
    val j = fresh("j")
    val n = fresh("n")
    val nx = fresh("nx")
    val ny = fresh("ny")
    val xi = fresh("xi")
    val yj = fresh("yj")
    val rem = fresh("rem")
    val need = fresh("need")
    s"""
       |int $nx = $a.numElements(); int $ny = $b.numElements();
       |int $need = $needExpr;
       |int $i = 0; int $j = 0; int $n = 0;
       |while ($i < $nx && $j < $ny) {
       |  if ($need > 0) {
       |    int $rem = ($nx - $i < $ny - $j) ? ($nx - $i) : ($ny - $j);
       |    if ($n + $rem < $need) { $n = -1; break; }
       |  }
       |  long $xi = $a.getLong($i); long $yj = $b.getLong($j);
       |  if ($xi == $yj) { $n++; $i++; $j++; }
       |  else if ($xi < $yj) $i++;
       |  else $j++;
       |}
       |$out = ($need > 0 && $n >= 0 && $n < $need) ? -1 : $n;
     """.stripMargin
  }
}
