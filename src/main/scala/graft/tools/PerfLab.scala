package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.operators.Tables

/** Scratch micro-bench for the round-3 jaccard regression hunt. Times each
  * variant in the SAME session/JVM shape the driver bench uses (local[32],
  * 8g, shuffle=32) so numbers are comparable to BENCH_r{N}.json.
  */
object PerfLab {

  /** Variant: df via a count window over the shingle instead of the
    * BoundedPostingsAgg object aggregate — one shuffle + in-partition sort,
    * all inside whole-stage codegen / spill-safe operators.
    */
  def jaccardWindow(s: SparkSession, d: String): DataFrame = {
    val docs = Dedup.withShingles(Tables.documents(s, d))
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz"))
      .persist()
    val postings = docs.select(col("doc_id"), col("sz"), explode(col("shingles")).as("sh"))
    val withDf = postings
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("df") <= Dedup.MaxShingleDf)
    val ranked = withDf
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
    val prefix = ranked.filter(col("rk") <= col("sz") - expr("(4*sz + 4) DIV 5") + 1)
      .select(col("doc_id"), col("sh"))
      .persist()
    val cand = prefix.as("a").join(prefix.as("b"), col("a.sh") === col("b.sh")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val arrs = docs.select(col("doc_id"), col("shingles"), col("sz"))
    val out = cand
      .join(arrs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"), col("sz").as("sz_a")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jac", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jac") >= Dedup.JaccardT)
      .select(col("doc_a"), col("doc_b"), col("jac"))
      .orderBy(col("doc_a"), col("doc_b"))
    out
  }

  /** Window variant with ZERO persists: the prefix self-join and the
    * verification joins rely on Catalyst exchange reuse instead of
    * user-level caching.
    */
  def jaccardNoPersist(s: SparkSession, d: String): DataFrame = {
    val docs = Dedup.withShingles(Tables.documents(s, d))
      .select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz"))
    val postings = docs.select(col("doc_id"), col("sz"), explode(col("shingles")).as("sh"))
    val withDf = postings
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("df") <= Dedup.MaxShingleDf)
    val ranked = withDf
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
    val prefix = ranked.filter(col("rk") <= col("sz") - expr("(4*sz + 4) DIV 5") + 1)
      .select(col("doc_id"), col("sh"))
    val cand = prefix.as("a").join(prefix.as("b"), col("a.sh") === col("b.sh")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val arrs = docs.select(col("doc_id"), col("shingles"), col("sz"))
    cand
      .join(arrs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"), col("sz").as("sz_a")), "doc_a")
      .join(arrs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jac", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jac") >= Dedup.JaccardT)
      .select(col("doc_a"), col("doc_b"), col("jac"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => DataFrame): Unit = timeN(label, 3)(df)

    def timeN(label: String, reps: Int)(df: => DataFrame): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[perflab] $label run$i: $dt%.2f s")
        spark.catalog.clearCache()
      }
    }

    args.headOption.getOrElse("all") match {
      case "stages" =>
        // decompose the jaccard pipeline: time each prefix of the plan
        val docs0 = Dedup.withShingles(Tables.documents(spark, sfDir))
          .select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz"))
        time("s1-shingles")(docs0)
        val postings = docs0.select(col("doc_id"), col("sz"), explode(col("shingles")).as("sh"))
        time("s2-postings")(postings)
        val withDf = postings
          .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
          .filter(col("df") <= Dedup.MaxShingleDf)
        time("s3-windowdf")(withDf)
        val dfAgg = postings.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= Dedup.MaxShingleDf)
        time("s3b-groupdf")(postings.join(dfAgg, "sh"))
        val ranked = withDf.withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
        val prefix = ranked.filter(col("rk") <= col("sz") - expr("(4*sz + 4) DIV 5") + 1)
          .select(col("doc_id"), col("sh"))
        time("s4-prefix")(prefix)
        val cand = prefix.as("a").join(prefix.as("b"), col("a.sh") === col("b.sh")
            && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        time("s5-cand")(cand)
        time("s6-full")(jaccardNoPersist(spark, sfDir))
      case "variants" =>
        def core(persistIt: Boolean): (DataFrame, Seq[DataFrame]) = {
          var cached = List.empty[DataFrame]
          def p(df: DataFrame): DataFrame =
            if (persistIt) { val c = df.persist(); cached ::= c; c } else df
          val docs = p(Dedup.withShingles(Tables.documents(spark, sfDir))
            .select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz")))
          val postings = docs.select(col("doc_id"), col("sz"), explode(col("shingles")).as("sh"))
          val withDf = postings
            .withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
            .filter(col("df") <= Dedup.MaxShingleDf)
          val ranked = withDf.withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
          val prefix = p(ranked.filter(col("rk") <= col("sz") - expr("(4*sz + 4) DIV 5") + 1)
            .select(col("doc_id"), col("sh")))
          val cand = prefix.as("a").join(prefix.as("b"), col("a.sh") === col("b.sh")
              && col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
            .distinct()
          val arrs = docs.select(col("doc_id"), col("shingles"), col("sz"))
          val out = cand
            .join(arrs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"), col("sz").as("sz_a")), "doc_a")
            .join(arrs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"), col("sz").as("sz_b")), "doc_b")
            .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
            .withColumn("jac", round(col("inter").cast("double") /
              (col("sz_a") + col("sz_b") - col("inter")), 6))
            .filter(col("jac") >= Dedup.JaccardT)
            .select(col("doc_a"), col("doc_b"), col("jac"))
          (out, cached)
        }
        def unp(c: Seq[DataFrame]): Unit = c.foreach(_.unpersist(true))
        (1 to 3).foreach { i =>
          val (o, c) = core(false)
          val t0 = System.nanoTime()
          o.write.format("noop").mode("overwrite").save()
          println(f"[perflab] v-noorder-nopersist run$i: ${(System.nanoTime()-t0)/1e9}%.2f s"); unp(c)
        }
        (1 to 3).foreach { i =>
          val (o, c) = core(false)
          val t0 = System.nanoTime()
          o.repartition(1).sortWithinPartitions(col("doc_a"), col("doc_b"))
            .write.format("noop").mode("overwrite").save()
          println(f"[perflab] v-r1sort-nopersist run$i: ${(System.nanoTime()-t0)/1e9}%.2f s"); unp(c)
        }
        (1 to 3).foreach { i =>
          val (o, c) = core(true)
          val t0 = System.nanoTime()
          o.orderBy(col("doc_a"), col("doc_b"))
            .write.format("noop").mode("overwrite").save()
          println(f"[perflab] v-orderby-persist run$i: ${(System.nanoTime()-t0)/1e9}%.2f s"); unp(c)
        }
        (1 to 3).foreach { i =>
          val (o, c) = core(true)
          val t0 = System.nanoTime()
          o.repartition(1).sortWithinPartitions(col("doc_a"), col("doc_b"))
            .write.format("noop").mode("overwrite").save()
          println(f"[perflab] v-r1sort-persist run$i: ${(System.nanoTime()-t0)/1e9}%.2f s"); unp(c)
        }
      case "clusters" =>
        time("e8-full")(Dedup.clusterPairs(spark, sfDir))
        time("e8-jaccard-only")(Dedup.jaccardPairs(spark, sfDir))
      case "incremental" =>
        // where does the per-batch cost go? stage prefixes of incrementalNew
        time("e7-full")(Dedup.incrementalNew(spark, sfDir))
        val isNew = col("doc_id") % 10 >= 8
        val batch = Dedup.withShingles(Tables.documents(spark, sfDir).filter(isNew))
          .select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz"))
        time("e7-batch-shingle")(batch)
        val slug = sfDir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
        val oldDf = spark.table(s"graft_incr_dfh_$slug")
        val oldPrefix = spark.table(s"graft_incr_prefixh_$slug")
        val oldArrs = spark.table(s"graft_incr_arrh_$slug")
        val bpost = batch.select(col("doc_id"), col("sz"), explode(col("shingles")).as("sh"))
          .select(col("doc_id"), col("sz"),
            graft.plans.MixHash.polyHashCol(col("sh")).as("h"))
          .join(oldDf, Seq("h"), "left")
          .filter(col("df").isNull || col("df") <= Dedup.MaxShingleDf)
        time("e7-bpost-dfjoin")(bpost)
        val ranked = bpost.withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(coalesce(col("df"), lit(Long.MaxValue)), col("h"))))
        val bprefix = ranked.filter(col("rk") <= col("sz") - expr("(4*sz + 4) DIV 5") + 1)
          .select(col("doc_id"), col("h"))
        time("e7-bprefix")(bprefix)
        val cand = bprefix.as("a").join(oldPrefix.as("b"), col("a.h") === col("b.h"))
          .select(col("a.doc_id").as("doc_new"), col("b.doc_id").as("doc_old"))
          .distinct()
        time("e7-cand")(cand)
        val matched = cand
          .join(batch.select(col("doc_id").as("doc_new"), col("shingles").as("sh_a"), col("sz").as("sz_a")), "doc_new")
          .join(oldArrs.select(col("doc_id").as("doc_old"), col("shingles").as("sh_b"), col("sz").as("sz_b")), "doc_old")
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("jac", round(col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter")), 6))
          .filter(col("jac") >= Dedup.JaccardT)
        time("e7-matched")(matched)
      case "simhash" =>
        // decompose the r6 mega-bucket-cap cost: capped (current) vs the
        // r5 uncapped shape vs a groupBy-based cap (no full-data window)
        time("simhash-current")(Dedup.simhashPairs(spark, sfDir))
        def banded0 = {
          val postings = Dedup.withShingles(Tables.documents(spark, sfDir))
            .select(col("doc_id"), explode(col("shingles")).as("sh"))
            .withColumn("h", graft.plans.MixHash.polyHashCol(col("sh")))
          postings.groupBy(col("doc_id"))
            .agg(graft.plans.SketchAggs.simhash(col("h")).as("simhash"))
            .select(col("doc_id"), col("simhash"),
              explode(array((0 until 4).map(b =>
                struct(lit(b).as("band"),
                  shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bv"))): _*)).as("bk"))
            .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.bv"))
        }
        val uncapped = {
          val banded = banded0.persist()
          banded.as("a").join(banded.as("b"),
              col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
                && col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
            .distinct()
            .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
            .filter(col("hamming") <= 3)
            .select(col("doc_a"), col("doc_b"), col("hamming"))
        }
        time("simhash-uncapped")(uncapped)
        val aggCap = {
          val banded = banded0.persist()
          val big = banded.groupBy(col("band"), col("bv"))
            .agg(count(lit(1)).as("bn"), min(struct(col("doc_id"), col("simhash"))).as("repst"))
            .filter(col("bn") > Dedup.maxBandBucket(spark))
          val flagged = banded.join(big, Seq("band", "bv"), "left")
          val small = flagged.filter(col("bn").isNull)
          val star = flagged.filter(col("bn").isNotNull && col("doc_id") =!= col("repst.doc_id"))
            .select(col("repst.doc_id").as("doc_a"), col("doc_id").as("doc_b"),
              col("repst.simhash").as("sim_a"), col("simhash").as("sim_b"))
          small.as("a").join(small.as("b"),
              col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
                && col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
            .union(star)
            .distinct()
            .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
            .filter(col("hamming") <= 3)
            .select(col("doc_a"), col("doc_b"), col("hamming"))
        }
        time("simhash-aggcap")(aggCap)
      case "streamjoin" =>
        // stream-stream join cost vs state-store partition count (fixed at
        // query start from spark.sql.shuffle.partitions)
        def run(parts: String): Unit = {
          val saved = spark.conf.get("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.shuffle.partitions", parts)
          (1 to 3).foreach { i =>
            val t0 = System.nanoTime()
            val t = graft.streaming.Streams.streamingJoin(spark, sfDir)
            t.write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            println(f"[perflab] streamjoin p$parts run$i: $dt%.2f s")
          }
          spark.conf.set("spark.sql.shuffle.partitions", saved)
        }
        run("32"); run("8"); run("4")
      case "quant" =>
        // F5 store-and-scan vs the brute float path it must beat (r7 item:
        // quantized was 2.31 s vs brute 0.86 s with interpreted HOFs over
        // re-derived doubles). First quantized rep pays the one-time index
        // build; steady state is the int8 scan.
        timeN("f1-brute", 5)(graft.SparkEntry.queries("ann_brute_topk")(spark, sfDir))
        timeN("f5-quantized", 5)(graft.SparkEntry.queries("ann_quantized_topk")(spark, sfDir))
      case "dsum" =>
        // is the DECIMAL(18,4) exact-sum path the cost in the lineitem agg
        // family (q1/rollup/cube/grouping_sets)? Compare q1's agg with
        // plain double sums, decimal dsum, and a scan-only control.
        import graft.operators.Exact
        val li = Tables.lineitem(spark, sfDir)
          .filter(col("l_shipdate") < expr("timestamp'1999-06-01 00:00:00'"))
        def rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        time("q1-scan-only")(li.select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount")))
        time("q1-double-sum")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")), sum(col("l_extendedprice")), sum(rev),
            avg(col("l_quantity")), avg(col("l_discount")), count(lit(1))))
        time("q1-decimal-sum")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(Exact.decSum(col("l_quantity")), Exact.decSum(col("l_extendedprice")),
            Exact.decSum(rev), count(lit(1))))
        time("q1-int128-dsum")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(Exact.dsum(col("l_quantity")), Exact.dsum(col("l_extendedprice")),
            Exact.dsum(rev), Exact.davg(col("l_quantity")),
            Exact.davg(col("l_discount")), count(lit(1))))
        time("q1-full")(graft.SparkEntry.queries("q1_pricing")(spark, sfDir))
      case "pin" =>
        // 5-rep spreads for the r7 bench outliers (merge_upsert 3.4x,
        // join_shuffle 1.6x — no code changed) and the jaccard bimodality
        Seq("merge_upsert", "join_shuffle", "dedup_jaccard_pairs").foreach { n =>
          timeN(n, 5)(graft.SparkEntry.queries(n)(spark, sfDir))
        }
      case "pin9" =>
        // 5-rep spreads for the r9 bench-band suspects (quality_profile
        // 0.29→0.66, q9_profit 0.56→0.86, quality_fk_orphans 0.44→0.66 —
        // no code changed; BENCH_DETAIL rep load 2.0-4.6) plus
        // corpus_prepare (+0.37, expected ~+0.15 from the fused PII chain)
        Seq("quality_profile", "q9_profit", "quality_fk_orphans",
            "corpus_prepare").foreach { n =>
          timeN(n, 5)(graft.SparkEntry.queries(n)(spark, sfDir))
        }
      case "pin10" =>
        // 5-rep spreads for the r10 continuation-session band suspects
        // (basket_pairs 1.03->1.51, corpus_token_budget 0.41->0.60 between
        // two same-code bench runs; corpus_token_budget also read 1.34 min
        // earlier the same day — the r7/r9 load-band signature)
        Seq("basket_pairs", "corpus_token_budget").foreach { n =>
          timeN(n, 5)(graft.SparkEntry.queries(n)(spark, sfDir))
        }
      case "pin10b" =>
        // 5-rep spreads for the third-session band suspects: the four
        // common-key moves >1.3x with no code change (combine_aggregator
        // 0.96->1.33, q21 0.71->1.06, dedup_embedding 0.59->0.91, q20
        // 0.80->1.09) in a bench whose common-key sum drifted 72.5->80.8
        Seq("combine_aggregator", "q21_late_supplier", "dedup_embedding",
            "q20_dominant_supplier").foreach { n =>
          timeN(n, 5)(graft.SparkEntry.queries(n)(spark, sfDir))
        }
      case "pin11" =>
        // 5-rep steady-state spreads for every round-11 key (verdict item
        // 9: new keys need pins the round they land so later bench deltas
        // are adjudicable) plus the four heap-ported cascades
        Seq("quantile_sketch_log", "streaming_quantile_sketch",
            "corpus_pack_bpe", "corpus_span_dedup_anchor",
            "text_langid_ngram", "source_binary_compacted",
            "join_aqe_skew", "mm_phash2d_dedup",
            "ann_binary_topk", "ann_mips_topk", "ann_rerank_topk",
            "ann_pq_topk", "corpus_token_budget").foreach { n =>
          timeN(n, 5)(graft.SparkEntry.queries(n)(spark, sfDir))
        }
      case "clean" =>
        // decompose corpus_clean: which text expression dominates?
        import graft.functions.TextFunctions._
        val docs = Tables.documents(spark, sfDir)
        time("clean-scan-only")(docs.select(col("doc_id"), length(col("text")).as("n")))
        time("clean-alpha-only")(docs.select(col("doc_id"), alphaRatio(col("text")).as("a")))
        time("clean-space-only")(docs.select(col("doc_id"), spaceRatio(col("text")).as("s")))
        time("clean-langid-only")(docs.select(col("doc_id"), langId(col("text")).as("l")))
        time("clean-fp-only")(docs.select(col("doc_id"), fingerprint(col("text")).as("f")))
        time("clean-full")(graft.SparkEntry.queries("corpus_clean")(spark, sfDir))
      case "benchlike" =>
        // reproduce Bench's JVM shape for streaming_join (11 s in BENCH_r08
        // vs 2.3 s standalone): warm the streaming block at sf0.001 like
        // Bench's warmup pass, then 3 isolated reps at sfDir
        Seq("streaming_dedup", "streaming_enrich", "streaming_join",
            "streaming_sessionize", "streaming_window_agg").foreach { n =>
          try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
            .write.format("noop").mode("overwrite").save()
          catch { case e: Throwable => println(s"[perflab] warm $n: ${e.getMessage}") }
        }
        timeN("streamjoin-after-warm", 3)(
          graft.SparkEntry.queries("streaming_join")(spark, sfDir))
      case "jacrace" =>
        // through the CacheScope listener path (the shape Bench uses):
        // rep N's async unpersist-by-plan can kill rep N+1's identical
        // cache entry — the bimodality suspect
        timeN("jaccard-cachescope", 10)(
          graft.SparkEntry.queries("dedup_jaccard_pairs")(spark, sfDir))
      case "jacmode" =>
        // bimodality hunt: per-rep time + the join strategies AQE actually
        // chose in the final plan (slow mode hypothesis: broadcast<->SMJ flip)
        (1 to 10).foreach { i =>
          spark.catalog.clearCache(); System.gc()
          val (out, scoped) = Dedup.jaccardCore(spark, sfDir)
          val t0 = System.nanoTime()
          out.write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          val plan = out.queryExecution.executedPlan.toString
          val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
          val smj = "SortMergeJoin".r.findAllIn(plan).length
          val shj = "ShuffledHashJoin".r.findAllIn(plan).length
          println(f"[perflab] jacmode run$i: $dt%.2f s bhj=$bhj smj=$smj shj=$shj")
          scoped.foreach(_.unpersist(true))
        }
      case "current" => time("jaccard-current")(Dedup.jaccardPairs(spark, sfDir))
      case "window"  => time("jaccard-window")(jaccardWindow(spark, sfDir))
      case "thresh" =>
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "20000000")
        time("jaccard-thresh20M")(Dedup.jaccardPairs(spark, sfDir))
      case "winnow" => time("winnow-current")(Dedup.winnowPairs(spark, sfDir))
      case "nopersist" => time("jaccard-nopersist")(jaccardNoPersist(spark, sfDir))
      case _ =>
        time("jaccard-window")(jaccardWindow(spark, sfDir))
        time("jaccard-nopersist")(jaccardNoPersist(spark, sfDir))
    }
    spark.stop()
  }
}
