package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** ScaleFixtureGen's structure-preservation claims are what give
  * SCALE.json its meaning — if the upscale distorted within-replica
  * structure or let replicas collide, the measured slopes would be
  * slopes of a different workload. Pin each claim on a 3× upscale of
  * the sf0.001 fixture:
  *
  *  - row counts: replicated tables ×factor, fixed dims ×1;
  *  - key disjointness: replica key ranges cannot intersect;
  *  - text: token rename is BIJECTIVE per replica — the within-replica
  *    exact-duplicate cluster census is identical in every replica (so
  *    dedup candidate volume scales linearly by construction), and
  *    cross-replica token vocabularies are disjoint;
  *  - embeddings: the per-replica transform is ORTHOGONAL — every
  *    within-replica pairwise dot product (sampled) matches replica 0's
  *    to float tolerance, and vector norms are preserved;
  *  - events: timestamps are untouched (the hourly grain's cell SET is
  *    identical, only cell sums grow).
  */
class ScaleFixtureGenSpec extends SparkTestBase with Matchers {

  private lazy val out = {
    val dir = Files.createTempDirectory("graft_sfgen").toFile.getAbsolutePath
    ScaleFixtureGen.generate(spark, sfTiny, dir, 3)
    dir
  }

  test("row counts: replicated tables x3, fixed dims x1") {
    for (t <- Seq("lineitem", "orders", "customer", "supplier", "part",
        "events", "documents", "embeddings"))
      spark.read.parquet(s"$out/$t.parquet").count() shouldBe
        (spark.read.parquet(s"$sfTiny/$t.parquet").count() * 3)
    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$out/$t.parquet").count() shouldBe
        spark.read.parquet(s"$sfTiny/$t.parquet").count()
  }

  test("keys: replica ranges are disjoint and replica 0 is verbatim") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val stride = 1L << 40
    docs.groupBy((col("doc_id") / stride).cast("long").as("rep"))
      .count().collect().map(_.getLong(0)).sorted shouldBe Array(0L, 1L, 2L)
    // replica 0 rows are byte-identical to the source
    val src = Tables.documents(spark, sfTiny)
    docs.filter(col("doc_id") < stride).exceptAll(src).count() shouldBe 0
    src.exceptAll(docs.filter(col("doc_id") < stride)).count() shouldBe 0
  }

  test("text: within-replica duplicate-cluster census identical across replicas; vocabularies disjoint") {
    val stride = 1L << 40
    val docs = spark.read.parquet(s"$out/documents.parquet")
      .withColumn("rep", (col("doc_id") / stride).cast("long"))
    // census of exact-duplicate cluster sizes per replica: (size -> n)
    val census = docs.groupBy("rep", "text").count()
      .groupBy("rep", "count").agg(count(lit(1)).as("n"))
      .collect().groupBy(_.getLong(0))
      .map { case (r, rows) =>
        r -> rows.map(x => (x.getLong(1), x.getLong(2))).toSet
      }
    census(1L) shouldBe census(0L)
    census(2L) shouldBe census(0L)
    // cross-replica vocabularies share nothing
    val vocab = docs.select(col("rep"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
    vocab.groupBy("tok").agg(countDistinct("rep").as("nr"))
      .filter(col("nr") > 1).count() shouldBe 0
    // n_chars stays consistent with the salted text
    docs.filter(expr("cast(length(text) as bigint) <> n_chars"))
      .count() shouldBe 0
  }

  test("embeddings: per-replica transform is orthogonal (norms and sampled within-replica dot products preserved)") {
    val stride = 1L << 40
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
      .withColumn("rep", (col("vec_id") / stride).cast("long"))
      .withColumn("base", pmod(col("vec_id"), lit(stride)))
    val dot = expr("aggregate(zip_with(e1, e2, (a, b) -> cast(a as double) * b), 0D, (acc, x) -> acc + x)")
    // pair every base vector with base+1 within each replica: the dot
    // product must match replica 0's to float-sum tolerance
    val a = emb.select(col("rep"), col("base"), col("embedding").as("e1"))
    val b = emb.select(col("rep").as("rep2"), (col("base") - 1).as("base2"),
      col("embedding").as("e2"))
    val dots = a.join(b, col("rep") === col("rep2") && col("base") === col("base2"))
      .select(col("rep"), col("base"), dot.as("d"))
    val byPair = dots.collect().groupBy(_.getLong(1))
      .map { case (k, rows) => k -> rows.map(r => (r.getLong(0), r.getDouble(2))).toMap }
    byPair.foreach { case (_, m) =>
      m.values.foreach(d => math.abs(d - m(0L)) should be < 1e-3)
    }
    // norms preserved up to float-summation reordering (the permutation
    // + sign flip leave every |x_i| unchanged but reorder the sum, so
    // equality holds in real arithmetic, 1e-6 in floats)
    val norms = emb.select(col("rep"), col("base"),
        expr("aggregate(embedding, 0D, (acc, x) -> acc + cast(x as double) * x)").as("nrm"))
      .collect().groupBy(_.getLong(1))
      .map { case (k, rows) => k -> rows.map(r => (r.getLong(0), r.getDouble(2))).toMap }
    norms.foreach { case (_, m) =>
      m.values.foreach(n => math.abs(n - m(0L)) should be < 1e-6)
    }
  }

  test("events: hourly cell set identical, cell sums x3") {
    def grain(path: String) = spark.read.parquet(path)
      .select(col("event_type").as("g"),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"),
        col("value"))
      .groupBy("g", "h").agg(count(lit(1)).as("n"))
    val src = grain(s"$sfTiny/events.parquet").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val up = grain(s"$out/events.parquet").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    up.keySet shouldBe src.keySet
    up.foreach { case (k, n) => n shouldBe src(k) * 3 }
  }
}
