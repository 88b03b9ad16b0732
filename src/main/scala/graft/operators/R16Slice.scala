package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Throwaway r16 stage-slicing probe: time individual stages of the
  * heaviest bench rows so optimization targets the dominant stage, not a
  * guess (guide §1). Each slice is timed with the Bench discipline
  * (count + releasePinned), 2 reps; each slice BUILDS its frame inside
  * the thunk so releasePinned cannot orphan a shared localCheckpoint.
  */
object R16Slice {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, reps: Int = 2)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.BenchUtil.releasePinned(spark)
        (dt, n)
      }
      println(f"R16SLICE $name rows=${ts.last._2} secs=[${ts.map(t => f"${t._1}%.2f").mkString(",")}]")
    }

    val which = args.toSet

    if (which("events")) {
      time("events:raw_read")(spark.read.parquet(s"$dir/events.parquet").select("value"))
      time("events:tables_value")(Tables.events(spark, dir).select("value"))
      time("events:tables_all")(Tables.events(spark, dir))
      time("events:repart_sum")(Tables.events(spark, dir)
        .groupBy("event_type").agg(sum("value")))
    }

    if (which("sketch")) {
      val tdigest = udaf(new graft.functions.TDigestSketch(100, Seq(0.5, 0.95, 0.99)))
      time("sketch:udaf_only")(Tables.events(spark, dir)
        .groupBy("event_type").agg(tdigest(col("value")).as("qs")))
      time("sketch:udaf+items")(Tables.events(spark, dir)
        .groupBy("event_type").agg(tdigest(col("value")).as("qs"))
        .select(col("event_type"),
          col("qs").getItem(0).as("p50_est"),
          col("qs").getItem(1).as("p95_est"),
          col("qs").getItem(2).as("p99_est")))
      time("sketch:udaf+items+gate")(Tables.events(spark, dir)
        .groupBy("event_type").agg(tdigest(col("value")).as("qs"))
        .select(col("event_type"),
          col("qs").getItem(0).as("p50_est"),
          col("qs").getItem(1).as("p95_est"),
          col("qs").getItem(2).as("p99_est"))
        .transform(graft.QueryDef.countGate(_, "p50_est", "p95_est", "p99_est")))
      time("sketch:full")(MoreQueries.sketchQuantile.query(spark, dir))
      println("=== sketch full plan ===")
      MoreQueries.sketchQuantile.query(spark, dir).explain("formatted")
    }

    if (which("knnlsh")) {
      val e = Tables.embeddings(spark, dir).select("vec_id", "label", "embedding")
      time("knnlsh:home_buckets")(VectorQueries.homeBucketsOf(e, 16, 6))
      time("knnlsh:cands_undirected")(
        VectorQueries.lshGraphCandidatesUndirected(e, 16, 6, 1))
      time("knnlsh:full")(VectorQueries.vecKnnGraphLsh.query(spark, dir))
    }

    if (which("trycast")) {
      val o = Tables.orders(spark, dir)
      time("trycast:scan")(o.select("o_orderkey", "o_orderpriority", "o_totalprice"))
      time("trycast:prio_whole_only")(o.select(col("o_orderkey"),
        expr("try_cast(o_orderpriority AS INT)").as("c"))
        .transform(graft.QueryDef.countGate(_, "c")))
      time("trycast:prio_digit_only")(o.select(col("o_orderkey"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("c"))
        .transform(graft.QueryDef.countGate(_, "c")))
      time("trycast:div_only")(o.select(col("o_orderkey"),
        expr("try_divide(o_totalprice, o_orderkey % 3)").as("c"))
        .transform(graft.QueryDef.countGate(_, "c")))
      time("trycast:add_ovf_only")(o.select(col("o_orderkey"),
        expr("try_add(9223372036854775807L, o_orderkey)").as("c"))
        .transform(graft.QueryDef.countGate(_, "c")))
      time("trycast:orderby_only")(o.select(col("o_orderkey")).orderBy("o_orderkey"))
      time("trycast:full")(FunctionQueries.fnTryCast.query(spark, dir))
    }

    if (which("containment")) {
      time("cont:sets")(DedupQueries.containmentSets(spark, dir))
      time("cont:cands")(DedupQueries.candidatesFromPrefix(
        DedupQueries.containmentPrefixPersisted(spark, dir),
        DedupQueries.containmentSets(spark, dir).localCheckpoint()))
      time("cont:full")(DedupQueries.simContainmentPrefix.query(spark, dir))
    }

    if (which("cont2")) {
      val prefix = DedupQueries.containmentPrefixPersisted(spark, dir)
      time("cont2:prefix_read")(prefix)
      time("cont2:join_raw") {
        val t = DedupQueries.containmentSets(spark, dir).localCheckpoint()
        val full = t.select(col("lang").as("lang2"), explode(col("toksh")).as("h2"),
          col("doc_id").as("doc_id2"), col("sz").as("sz2"))
        prefix.join(full, col("lang") === col("lang2") && col("h") === col("h2")
            && (col("sz1") < col("sz2")
              || (col("sz1") === col("sz2") && col("doc_id1") < col("doc_id2"))))
          .select("doc_id1", "doc_id2")
      }
    }

    if (which("trend")) {
      val hourly = Tables.events(spark, dir)
        .select(col("event_type").as("g"),
          expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"),
          (col("value").cast("decimal(12,2)") * 100).cast("long").as("x"))
        .groupBy("g", "h").agg(sum("x").cast("long").as("x"))
      time("trend:hourly")(hourly)
      time("trend:slopehist") {
        TimeSeriesQueries.slopeHistFromHourly(hourly.localCheckpoint())
      }
      time("trend:full")(TimeSeriesQueries.tsTrend.query(spark, dir))
    }

    if (which("winnow")) {
      val docs = Tables.documents(spark, dir).select("doc_id", "text")
      time("winnow:fps")(TextQueries.winnowOn(docs))
      time("winnow:pairs")(TextQueries.winnowPairsOn(docs))
      time("winnow:spans_full")(TextQueries.textWinnowSpans.query(spark, dir))
      time("winnow:span_source")(TextQueries.textSpanSource.query(spark, dir))
    }

    if (which("mad")) {
      time("mad:hist")(Tables.orders(spark, dir)
        .select(col("o_orderpriority").as("grp"),
          (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("v"))
        .groupBy("grp", "v").agg(count(lit(1)).as("t")))
      time("mad:full")(StatQueries.statMad.query(spark, dir))
      time("spearman:full")(StatQueries.statSpearman.query(spark, dir))
    }

    spark.stop()
  }
}
