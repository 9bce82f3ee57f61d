package graft

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Capped near-dup scaling probe (run manually; not part of the driver
  * contract): replicates the documents table `factor`× with ids shifted
  * by a multiple of 250 — preserving the planted `id % 250` base
  * structure, so near-dup cliques genuinely grow with the corpus — then
  * times the hamming-banded pair queries WITH a bucket cap on, printing
  * pair counts and the `dropped_buckets` / `max_bucket_size` audit per
  * run. This is the README scaling table's capped-pair-family source:
  * the graded queries mirror their uncapped oracles, so the capped scale
  * path is probed here and pinned by DedupSpec's subset test.
  *
  * Usage: `sbt "runMain graft.ScaleProbe [sfDir] [factor]"`.
  */
object ScaleProbe {
  /** The ONE definition of the replicated embedding corpus every probe
    * arm measures against: replica k shifts ids by k·N and rotates each
    * vector by k positions (distinct geometry per replica — no
    * artificial exact duplicates), deterministic. Previously inlined at
    * three sites, which risked the arms silently diverging on the
    * corpus-construction rule and invalidating cross-arm comparisons.
    */
  private case class EmbReplicator(base: DataFrame, dim: Int,
                                   corpus: Int => DataFrame)
  private def embReplicator(spark: SparkSession,
                            sfDir: String): EmbReplicator = {
    val base = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val dim = base.select(size(col("embedding"))).head.getInt(0)
    val n = base.count()
    def rot(vec: org.apache.spark.sql.Column, k: Int) = {
      val s = k % dim
      if (s == 0) vec
      else concat(slice(vec, s + 1, dim - s), slice(vec, 1, s))
    }
    EmbReplicator(base, dim, f =>
      (0 until f).map(k => base.select(
          (col("vec_id") + lit(k * n)).as("vec_id"),
          rot(col("embedding"), k).as("embedding")))
        .reduce(_ unionAll _).localCheckpoint())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val n = base.count()
    val shift = ((n + 249) / 250) * 250 // keep id % 250 base structure

    def corpus(f: Int): DataFrame =
      (0 until f).map(k => base.select(
          (col("doc_id") + lit(k * shift)).as("doc_id"), col("text")))
        .reduce(_ union _).localCheckpoint()

    def run(name: String, f: Int, cap: Int)(pairs: Observation => DataFrame): Unit = {
      val obs = new Observation(s"$name-$f-$cap")
      val t0 = System.nanoTime()
      val nPairs = pairs(obs).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val m = obs.get
      println(f"""{"probe":"$name","factor":$f,"cap":$cap,"sec":$sec%.2f,""" +
        s""""pairs":$nPairs,"dropped_buckets":${m("dropped_buckets")},""" +
        s""""max_bucket_size":${m("max_bucket_size")}}""")
    }

    // round-7 operator families on the same replicated corpus: DSIR
    // selection (scan + 512-row broadcast + per-lang window), snapshot
    // diff (map-side fingerprints + one full-outer join) — both should
    // scale linearly with no funnel
    def corpusFull(f: Int): DataFrame = {
      val b = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      (0 until f).map(k => b.select(
          (col("doc_id") + lit(k * shift)).as("doc_id"),
          col("text"), col("lang"), col("source")))
        .reduce(_ union _).localCheckpoint()
    }
    for (f <- Seq(1, factor)) {
      val docs = corpusFull(f)
      def time(name: String)(df: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
      }
      time("d_dsir_sample") {
        operators.Splits.dsirSelect(docs, "doc_id", "lang", "text",
          isTarget = col("source").isin("src0", "src1", "src2"))
      }
      time("d_corpus_diff") {
        operators.Dedup.snapshotDiff(
            docs.filter(col("doc_id") % 23 =!= 0),
            docs.filter(col("doc_id") % 29 =!= 0),
            "doc_id", "text")
          .filter(col("status") =!= "unchanged")
      }
      docs.unpersist()
    }

    // stored-vs-inline gate probe: the historical corpus is f replicas,
    // the arriving batch ONE more replica (near-dups of history, so the
    // gate genuinely gates). The inline gate re-signs the whole history
    // per run — linear in f; the stored gate reads the band index written
    // once ("build" line) and only signs the batch — flat in f. This is
    // the 100 TB claim behind d_lsh_incremental_stored, measured. The
    // 3×factor rung makes the divergence visible above the join's
    // constant overhead.
    for (f <- Seq(1, factor, 3 * factor)) {
      val history = corpus(f)
      val batch = base.select((col("doc_id") + lit(f * shift)).as("doc_id"),
        col("text")).localCheckpoint()
      def gate(name: String)(mk: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val survivors = operators.Dedup.lshIngest(batch, mk, "doc_id", "text").count()
        println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"survivors":$survivors}""")
      }
      gate("lsh_gate_inline") {
        operators.Dedup.portableBands(
          operators.Dedup.portableMinhash(history, "doc_id", "text", k = 8),
          "doc_id", k = 8, bands = 4)
      }
      val storePath = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft_probe_lsh_$f").getAbsolutePath
      val tb = System.nanoTime()
      operators.Dedup.portableBands(
          operators.Dedup.portableMinhash(history, "doc_id", "text", k = 8),
          "doc_id", k = 8, bands = 4)
        .repartition(32, col("band_hash")).sortWithinPartitions(col("band_hash"))
        .write.mode("overwrite").parquet(storePath)
      println(f"""{"probe":"lsh_store_build","factor":$f,"sec":${(System.nanoTime() - tb) / 1e9}%.2f}""")
      gate("lsh_gate_stored")(spark.read.parquet(storePath))
      history.unpersist(); batch.unpersist()
    }

    // late-round-7 families. Heavy hitters: the sketch pass is linear and
    // the candidate set is bounded by k, so time should track corpus size
    // with no blowup. SemDeDup: replicas multiply cluster sizes, so the
    // in-cluster quadratic is the hazard — probe cap-on with the audit
    // (the graded query runs cap-off to mirror its oracle). Winnow gate:
    // the stored-vs-inline divergence, same claim as the LSH gate.
    for (f <- Seq(1, factor)) {
      val docs = corpus(f)
      def time(name: String)(df: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
      }
      time("d_token_hh") {
        operators.HeavyHitters.exact(
          docs.select(explode(operators.TextAnalysis.tokens(
            lower(trim(col("text"))))).as("term")),
          "term", minShare = 0.005, k = 256)
      }
      docs.unpersist()
    }
    {
      val emb = Tables(spark, "/root/testdata/sf0.1", "embeddings")
      val seeds = emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      val unit = seeds.map { v =>
        val nn = math.sqrt(v.map(x => x * x).sum)
        if (nn == 0.0) v else v.map(_ / nn)
      }
      for (f <- Seq(1, factor); cap <- Seq(Int.MaxValue, 700)) {
        val vecs = (0 until f).map(k => emb.select(
            (col("vec_id") + lit(k * 10000L)).as("vec_id"), col("embedding")))
          .reduce(_ union _).localCheckpoint()
        val obs = new Observation(s"semdedup-$f-$cap")
        val t0 = System.nanoTime()
        val kept = operators.Similarity.semDedup(vecs, "vec_id", "embedding",
          unit, eps = 0.35, maxClusterSize = cap, dropAudit = Some(obs)).count()
        val m = obs.get
        println(f"""{"probe":"s_semdedup","factor":$f,"cap":$cap,""" +
          f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f,"kept":$kept,""" +
          s""""skipped_clusters":${m("skipped_clusters")},""" +
          s""""max_cluster_size":${m("max_cluster_size")}}""")
        vecs.unpersist()
      }
    }
    for (f <- Seq(1, factor, 3 * factor)) {
      val history = corpus(f)
      val batch = base.select((col("doc_id") + lit(f * shift)).as("doc_id"),
        col("text")).localCheckpoint()
      def wgate(name: String)(mk: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val survivors = operators.Dedup.winnowIngest(batch, mk,
          "doc_id", "text").count()
        println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"survivors":$survivors}""")
      }
      wgate("winnow_gate_inline") {
        operators.Dedup.winnowFingerprints(history, "doc_id", "text")
          .select(col("fp")).distinct()
      }
      val wPath = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft_probe_winnow_$f").getAbsolutePath
      val tb = System.nanoTime()
      operators.Dedup.winnowFingerprints(history, "doc_id", "text")
        .select(col("fp")).distinct()
        .repartition(32, col("fp")).sortWithinPartitions(col("fp"))
        .write.mode("overwrite").parquet(wPath)
      println(f"""{"probe":"winnow_store_build","factor":$f,"sec":${(System.nanoTime() - tb) / 1e9}%.2f}""")
      wgate("winnow_gate_stored")(spark.read.parquet(wPath))
      history.unpersist(); batch.unpersist()
    }

    for (f <- Seq(1, factor); cap <- Seq(1000, 100)) {
      val docs = corpus(f)
      val hashes = graft.multimodal.Multimodal
        .dHashes(SparkEntry.imagePayloadsOf(spark, docs.select(col("doc_id"))))
        .localCheckpoint() // time the banding, not the planted PNG codec
      run("m_image_neardup_capped", f, cap) { obs =>
        operators.Dedup.bandedHammingPairs(hashes, "media_id", "dhash",
          maxHamming = 3, maxBucketSize = cap, dropAudit = Some(obs))
      }
      run("d_simhash_neardup_capped", f, cap) { obs =>
        operators.Dedup.bandedHammingPairs(
          operators.Dedup.simhash(docs, "doc_id", "text"), "id", "simhash",
          maxHamming = 3, maxBucketSize = cap, dropAudit = Some(obs))
      }
      docs.unpersist()
    }

    // round-8 families. BM25: the inline spelling rebuilds the postings
    // (tokenize + three aggregates, linear in f) per query batch; the
    // stored path pays that once at "build" and scoring is flat —
    // the retrieval twin of the LSH/winnow gate claims. NB predict:
    // inline retrains per run (linear), frozen stored weights score
    // with one test-half scan (flat, test side constant here).
    {
      val queries = base.filter(col("doc_id") < 5).localCheckpoint()
      for (f <- Seq(1, factor, 3 * factor)) {
        val docs = corpus(f)
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          val n = df.count()
          println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
        }
        time("bm25_inline") {
          operators.Retrieval.bm25TopK(docs, queries,
            "doc_id", "text", "doc_id", "text")
        }
        val bPath = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_probe_bm25_$f").getAbsolutePath
        val tb = System.nanoTime()
        operators.Retrieval.writeBm25Store(docs, "doc_id", "text", bPath)
        println(f"""{"probe":"bm25_store_build","factor":$f,"sec":${(System.nanoTime() - tb) / 1e9}%.2f}""")
        val store = operators.Retrieval.readBm25Store(spark, bPath)
        time("bm25_stored") {
          operators.Retrieval.bm25TopKStored(store, queries,
            "doc_id", "doc_id", "text")
        }
        // round-11 retrieval additions on the same replicated corpus:
        // BM25F doubles the posting stream (two fields off one token
        // array), PRF is two restricted scoring passes over SHARED
        // corpus aggregates (ReusedExchange) — both expected to track
        // bm25_inline's linear shape at a small constant factor
        time("bm25f_inline") {
          operators.Retrieval.bm25fTopK(docs, queries,
            "doc_id", "text", "doc_id", "text")
        }
        time("bm25_prf") {
          operators.Retrieval.bm25PrfTopK(docs, queries,
            "doc_id", "text", "doc_id", "text")
        }
        // round-12: PRF off the store built above — the two ranking
        // passes stay query-term-restricted (flat-ish) and the feedback
        // mining is ONE postings scan (linear in f), so expect growth to
        // track the postings scan, well under bm25_prf's inline rebuild
        time("bm25_prf_stored") {
          operators.Retrieval.bm25PrfTopKStored(store, queries,
            "doc_id", "doc_id", "text")
        }
        // round-12: fielded incremental — history (even ids) frozen into
        // a fielded store, delta (odd ids) folds in logically and the
        // merged components serve the query; BOTH halves grow ∝ f, so
        // expect LINEAR dominated by the delta's fielded build — the
        // claim under probe is no super-linear term, not flatness (the
        // graded row's plan pin already proves no historical re-scan)
        val fPath = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_probe_bm25f_$f").getAbsolutePath
        val tf = System.nanoTime()
        operators.Retrieval.writeBm25fStore(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", fPath)
        println(f"""{"probe":"bm25f_store_build","factor":$f,"sec":${(System.nanoTime() - tf) / 1e9}%.2f}""")
        val fstore = operators.Retrieval.readBm25fStore(spark, fPath)
        time("bm25f_incremental") {
          operators.Retrieval.bm25fTopKStored(
            operators.Retrieval.bm25fApplyDelta(fstore,
              docs.filter(col("doc_id") % 2 === 1), "doc_id", "text"),
            queries, "doc_id", "doc_id", "text")
        }
        // round-13: right-to-erasure on the postings store built above —
        // a FIXED 20-doc tombstone batch. The claim under probe: forget
        // never re-reads corpus TEXT (one postings id-scan + hit-bucket
        // survivor rewrite + integer decrements on df/stats), so its
        // cost tracks the integers-only postings table and stays well
        // under bm25_store_build (which pays tokenize + shuffle) at
        // every factor — erasure is a compaction, not a re-ingest.
        locally {
          val tomb = docs.filter(col("doc_id") < 20)
            .select(col("doc_id")).localCheckpoint()
          val t0 = System.nanoTime()
          operators.Retrieval.forgetBm25StoreAt(spark, bPath, tomb, "doc_id")
          val sec = (System.nanoTime() - t0) / 1e9
          val left = spark.read.parquet(s"$bPath/postings").count()
          println(f"""{"probe":"bm25_forget","factor":$f,"sec":$sec%.2f,""" +
            s""""postings_left":$left}""")
        }
        docs.unpersist()
      }
      queries.unpersist()
    }
    {
      val testHalf = corpusFull(1).filter(col("doc_id") % 2 === 1)
        .localCheckpoint()
      for (f <- Seq(1, factor, 3 * factor)) {
        val train = corpusFull(f).filter(col("doc_id") % 2 === 0)
          .localCheckpoint()
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          val n = df.count()
          println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
        }
        time("nb_predict_inline") {
          operators.Classify.nbPredict(testHalf,
            operators.Classify.nbModel(train, "text", "lang"),
            operators.Classify.nbClassBase(train, "doc_id", "text", "lang"),
            "doc_id", "text")
        }
        val nPath = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_probe_nb_$f").getAbsolutePath
        val tb = System.nanoTime()
        operators.Classify.writeNbStore(train, "doc_id", "text", "lang", nPath)
        println(f"""{"probe":"nb_store_build","factor":$f,"sec":${(System.nanoTime() - tb) / 1e9}%.2f}""")
        val (model, nbase) = operators.Classify.readNbStore(spark, nPath)
        time("nb_predict_stored") {
          operators.Classify.nbPredict(testHalf, model, nbase, "doc_id", "text")
        }
        train.unpersist()
      }
      testHalf.unpersist()
    }
    // winnow matching: replicas are verbatim copies, so every replica
    // pair shares every fingerprint — the f²-pair regime the bucket cap
    // exists for. Probe cap-on with the audit (graded query is cap-off
    // to mirror its oracle; the subset contract is WinnowSpec's).
    for (f <- Seq(1, factor); cap <- Seq(1000, 100)) {
      val docs = corpus(f)
      run("d_winnow_matches_capped", f, cap) { obs =>
        operators.Dedup.winnowMatches(docs, "doc_id", "text",
          maxBucketSize = cap, dropAudit = Some(obs))
      }
      docs.unpersist()
    }
    // CDC family (round 8, fused-kernel boundary scan): chunk-stat scan
    // is linear map-side work; the block ingest gate chunks ONLY the
    // batch against a stored index, so gate time should stay flat in
    // history size — the winnow/LSH gate claim at chunk granularity.
    for (f <- Seq(1, factor, 3 * factor)) {
      val history = corpus(f)
      val batch = base.select((col("doc_id") + lit(f * shift)).as("doc_id"),
        col("text")).localCheckpoint()
      def time(name: String)(df: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
      }
      if (f == 1 || f == factor) time("d_cdc_chunks") {
        operators.TextAnalysis.cdcChunkStats(history, "doc_id", "text")
      }
      val cPath = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_probe_cdc_$f").getAbsolutePath
      val tb = System.nanoTime()
      operators.TextAnalysis.cdcChunks(history, "doc_id", "text")
        .select(col("fp")).distinct()
        .repartition(32, col("fp")).sortWithinPartitions(col("fp"))
        .write.mode("overwrite").parquet(cPath)
      println(f"""{"probe":"cdc_store_build","factor":$f,"sec":${(System.nanoTime() - tb) / 1e9}%.2f}""")
      time("cdc_gate_stored") {
        operators.TextAnalysis.cdcIngest(batch,
          spark.read.parquet(cPath), "doc_id", "text")
      }
      history.unpersist(); batch.unpersist()
    }

    // per-language heavy hitters (ONE grouped MG sketch pass — linear,
    // driver state |langs|·k) and grouped exact quantiles (shared
    // histogram refinement, no per-group sort — passes grow with the
    // value-range refinement, not row count)
    for (f <- Seq(1, factor, 3 * factor)) {
      val docs = corpusFull(f)
      def time(name: String)(df: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
      }
      time("d_token_hh_lang") {
        operators.HeavyHitters.exactPerGroup(
          docs.select(col("lang"), explode(operators.TextAnalysis.tokens(
            lower(trim(col("text"))))).as("term")),
          "lang", "term", minShare = 0.01, k = 256)
      }
      locally {
        val t0 = System.nanoTime()
        val rows = operators.OrderStats.groupedExactQuantiles(
          docs.withColumn("n_chars", length(col("text"))),
          "lang", "n_chars", Seq(0.5, 0.9)).size
        println(f"""{"probe":"d_length_quantiles_exact","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$rows}""")
      }
      docs.unpersist()
    }

    // round-8-late families. Span-clean rewrite: fixed-width md5 window
    // keys and a map-side rebuild — should be linear in f like the
    // dup-span audit it completes. Triangle census on the derived
    // modular graph (+34 chord): degree orientation keeps wedge counts
    // ~linear here (bounded degree), so time must track n, not n².
    for (f <- Seq(1, factor)) {
      val docs = corpus(f)
      def time(name: String)(df: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
      }
      time("d_span_clean") {
        operators.Dedup.duplicatedSpanClean(docs, "doc_id", "text")
      }
      locally {
        val ids = docs.select(col("doc_id"))
        val cnt = ids.agg(count(lit(1)).as("n"))
        val edges = ids.crossJoin(broadcast(cnt))
          .select(col("doc_id").as("src"), explode(array(
            pmod(col("doc_id") + 17, col("n")),
            pmod(col("doc_id") + 101, col("n")),
            pmod(col("doc_id") + 34, col("n")),
            pmod(col("doc_id") * 3 + 7, col("n")))).as("dst"))
          .filter(col("src") =!= col("dst"))
        val t0 = System.nanoTime()
        val r = operators.LinkRank.triangles(edges).collect()(0)
        println(f"""{"probe":"d_triangles","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,""" +
          s""""edges":${r.getAs[Long]("n_edges")},"wedges":${r.getAs[Long]("n_wedges")},"triangles":${r.getAs[Long]("n_triangles")}}""")
      }
      docs.unpersist()
    }

    // keyless interval-overlap join: sessions replicated by user shift,
    // fixed campaign windows. The bucketed spelling must stay linear in
    // f; the theta-join spelling it replaces is timed at f=1 only (its
    // pair loop is |sessions|·|campaigns|) with a row-count equality
    // check — the parity the RangeJoinSpec property test pins on longs.
    locally {
      val ev = Tables(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      def sessionsOf(f: Int): DataFrame =
        (0 until f).map(k => ev.select(
            (col("user_id") + lit(k * 100000L)).as("user_id"),
            col("event_id"), col("ts_us")))
          .reduce(_ union _)
          .withColumn("new_s", when(lag(col("ts_us"), 1).over(w).isNull ||
            col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800000000L, 1)
            .otherwise(0))
          .withColumn("sidx", sum(col("new_s")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("sidx"))
          .agg(min(col("ts_us")).as("s_start"), max(col("ts_us")).as("s_end"))
          .localCheckpoint()
      val camp = spark.range(0, 20)
        .select(col("id").as("campaign_id"),
          (lit(1704067200000000L) + col("id") * lit(129600000000L)).as("c_start"),
          (lit(1704067200000000L) + col("id") * lit(129600000000L) +
            lit(86400000000L)).as("c_end"))
      for (f <- Seq(1, factor)) {
        val sess = sessionsOf(f)
        val t0 = System.nanoTime()
        val nB = operators.RangeJoin.overlapJoin(sess, "s_start", "s_end",
          camp, "c_start", "c_end", 86400000000L).count()
        println(f"""{"probe":"overlap_bucketed","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"pairs":$nB}""")
        if (f == 1) {
          val t1 = System.nanoTime()
          val nT = sess.crossJoin(camp)
            .filter(col("s_start") <= col("c_end") &&
              col("c_start") <= col("s_end")).count()
          println(f"""{"probe":"overlap_theta","factor":$f,"sec":${(System.nanoTime() - t1) / 1e9}%.2f,"pairs":$nT}""")
          require(nB == nT, s"overlap parity broke: $nB != $nT")
        }
        sess.unpersist()
      }
    }
    // round-8-new families. Prefix-filter join: replicating a corpus
    // verbatim makes every replica pair an exact dup, so the OUTPUT
    // grows ~f² on the planted cliques — the probe checks time tracks
    // pairs (the inherent cost of emit-all-pairs semantics), not worse;
    // the 3×factor rung makes the output-bound classification explicit.
    // CMS: strictly linear, the counter matrix stays <= depth*width.
    // Global row numbering: linear, the offsets window stays |days| rows.
    for (f <- Seq(1, factor, 3 * factor)) {
      val docs = corpus(f)
      def time(name: String)(df: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
      }
      time("d_setjoin_ppjoin") {
        operators.Dedup.prefixFilterJoin(docs, "doc_id", "text", 3, 5)
      }
      time("d_cms_cells") {
        operators.HeavyHitters.cmsCells(
          docs.select(explode(operators.Dedup.portableTokens(col("text")))
            .as("term")), "term")
      }
      docs.unpersist()
    }
    locally {
      val ev = Tables(spark, sfDir, "events").select(col("event_id"), col("ts"))
      for (f <- Seq(1, factor)) {
        val e = (0 until f).map(k => ev.select(
            (col("event_id") + lit(k * 10000000L)).as("event_id"), col("ts")))
          .reduce(_ union _).localCheckpoint()
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          val n = df.count()
          println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
        }
        time("q_global_rownum") {
          operators.OrderStats.globalRowNumbers(e, "ts", "event_id")
        }
        // sweep-line concurrency: 2f·|events| endpoints through ONE
        // day-partitioned window — linear, output stays |days| rows
        time("q_max_concurrency") {
          operators.TimeSeries.maxConcurrencyDaily(
            e.withColumnRenamed("event_id", "k"), "ts")
        }
        e.unpersist()
      }
      // gap-fill: replication multiplies VALUES per (key, day) but the
      // grid is |keys|·|span| — constant here, so time should be flat-ish
      val evk = Tables(spark, sfDir, "events").select(col("user_id"), col("ts"))
      for (f <- Seq(1, factor)) {
        val e = (0 until f).map(_ => evk).reduce(_ union _).localCheckpoint()
        val t0 = System.nanoTime()
        val n = operators.TimeSeries.gapFillDaily(e, "user_id", "ts").count()
        println(f"""{"probe":"q_gap_fill","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
        e.unpersist()
      }
    }
    // graph family on the derived modular graph at f×: |V| = f·n docs,
    // |E| ≈ 3|V|, sources |V|/97. BFS/SSSP frontiers saturate in ≤4
    // rounds; LPA is 3 fixed rounds of join+2 groupBys — all linear in
    // edges, nothing quadratic to guard
    locally {
      val base = Tables(spark, sfDir, "documents").select(col("doc_id"))
      val n0 = base.count()
      val shiftG = ((n0 + 249) / 250) * 250
      for (f <- Seq(1, factor)) {
        val docs = (0 until f).map(k => base.select(
            (col("doc_id") + lit(k * shiftG)).as("doc_id")))
          .reduce(_ union _).localCheckpoint()
        val cnt = docs.agg(count(lit(1)).as("n"))
        val edges = docs.crossJoin(broadcast(cnt))
          .select(col("doc_id").as("src"), explode(array(
            pmod(col("doc_id") + 17, col("n")),
            pmod(col("doc_id") + 101, col("n")),
            pmod(col("doc_id") * 3 + 7, col("n")))).as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct().localCheckpoint()
        val sources = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
          .select(col("doc_id").as("node"))
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          val nn = df.count()
          println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$nn}""")
        }
        time("d_graph_bfs")(operators.LinkRank.bfsHops(edges, sources, 4))
        time("d_graph_sssp") {
          operators.LinkRank.ssspDistances(
            edges.select(col("src"), col("dst"),
              (pmod(col("src") + lit(2) * col("dst"), lit(7)) + 1).as("w")),
            sources, 4)
        }
        time("d_lpa_communities")(operators.LinkRank.labelPropagation(edges, 3))
        edges.unpersist(); docs.unpersist()
      }
    }
    // final round-8 families: Mondrian (depth windows over region
    // partitions — per-level cost is one corpus pass), exact-integer
    // Lloyd (map-side assignment, k·d-cell updates: flat-ish in f once
    // overhead amortizes, linear at most), Hamilton apportionment (one
    // corpus groupBy, windows only over the bounded strata table),
    // curriculum NTILE interleave (coarse-prefix offsets — the offsets
    // window is |distinct token counts|, not corpus-sized), and golden
    // record survivorship (broadcast registry, entity-key windows)
    locally {
      val docsBase = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      val n0 = docsBase.count()
      val shiftD = ((n0 + 249) / 250) * 250
      val custBase = Tables(spark, sfDir, "customer")
      val nc = custBase.count()
      for (f <- Seq(1, factor, 3 * factor)) {
        val docs = (0 until f).map(k => docsBase.select(
            (col("doc_id") + lit(k * shiftD)).as("doc_id"), col("text"),
            col("lang"), col("source"), col("n_chars")))
          .reduce(_ union _).localCheckpoint()
        val cust = (0 until f).map(k => custBase.select(
            (col("c_custkey") + lit(k * nc)).as("c_custkey"), col("c_name"),
            col("c_nationkey"), col("c_acctbal")))
          .reduce(_ union _).localCheckpoint()
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          val nn = df.count()
          println(f"""{"probe":"$name","factor":$f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$nn}""")
        }
        time("d_kanon_mondrian") {
          operators.Mondrian.classes(operators.Mondrian.partition(
            docs.select(col("doc_id"), col("n_chars"),
              pmod(col("doc_id"), lit(50)).as("age")),
            "doc_id", "n_chars", "age", k = 25, depth = 3))
        }
        // deeper-tree rung: per-level cost is one corpus pass, so depth 5
        // should cost ~5/3 of depth 3 at the same factor — recorded so the
        // depth-linearity claim is a measured row, not prose
        time("d_kanon_mondrian_d5") {
          operators.Mondrian.classes(operators.Mondrian.partition(
            docs.select(col("doc_id"), col("n_chars"),
              pmod(col("doc_id"), lit(50)).as("age")),
            "doc_id", "n_chars", "age", k = 25, depth = 5))
        }
        time("s_kmeans_lloyd") {
          // vectors replicate with the doc corpus factor: synthesize a
          // deterministic 8-dim int vector per doc id so the assignment
          // kernel sees f× rows (the graded query's embeddings table is
          // fixed-size; the probe wants the corpus-scaling shape)
          val vecs = docs.select(col("doc_id").as("vec_id"),
            array((0 until 8).map(i =>
              pmod(col("doc_id") * (i * 2 + 3) + i, lit(1000))
                .cast("double") / 1000.0): _*).as("embedding"))
          operators.Clustering.kmeans(vecs, "vec_id", "embedding",
            k = 4, iters = 2)
        }
        time("d_sample_apportion") {
          val budget = 1000L
          val strata = docs.groupBy(col("lang"), col("source"))
            .agg(count(lit(1)).as("n"))
          val tot = strata.agg(sum(col("n")).as("nn"))
          strata.crossJoin(broadcast(tot))
            .select(col("lang"), col("source"), col("n"),
              expr(s"(n * $budget) div nn").as("q_floor"),
              expr(s"(n * $budget) % nn").as("rem"))
        }
        time("d_curriculum_order") {
          val dd = docs.select(col("doc_id"),
            operators.TextAnalysis.tokenStats(col("text"))
              .getField("n_tokens").as("n_tokens"))
          operators.OrderStats.globalNtile(dd, col("n_tokens"),
            col("n_tokens"), "doc_id", 10)
        }
        time("q_golden_record") {
          val base2 = cust.select(col("c_custkey").as("bkey"),
            col("c_name").as("bname"), col("c_nationkey").as("bnat"),
            col("c_acctbal").as("bbal"))
          val twins = cust.filter(col("c_custkey") % 7 === 0)
            .select((col("c_custkey") + 100000000L).as("tkey"),
              concat(substring(col("c_name"), 1, 17),
                ((substring(col("c_name"), 18, 1).cast("int") + 1) % 10)
                  .cast("string")).as("tname"),
              col("c_nationkey").as("tnat"),
              (col("c_acctbal") + lit(1.0)).as("tbal"))
          broadcast(twins)
            .join(base2, col("tnat") === col("bnat") &&
              substring(col("tname"), 1, 16) === substring(col("bname"), 1, 16))
            .withColumn("lev", levenshtein(col("tname"), col("bname")))
            .filter(col("lev") <= 1)
        }
        // blocking-key audit for the linkage/golden-record family: the
        // scale claim is that a (nation, 16-char-prefix) block stays
        // bounded as the registry grows — record max/avg block size so
        // the claim is a measured number at every rung
        locally {
          val t0 = System.nanoTime()
          val r = cust.groupBy(col("c_nationkey"),
              substring(col("c_name"), 1, 16).as("pfx"))
            .agg(count(lit(1)).as("bn"))
            .agg(count(lit(1)).as("n_blocks"), max(col("bn")).as("max_block"),
              round(avg(col("bn")), 2).as("avg_block"))
            .collect()(0)
          println(f"""{"probe":"linkage_block_audit","factor":$f,""" +
            f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f,""" +
            s""""n_blocks":${r.getLong(0)},"max_block":${r.getLong(1)},""" +
            s""""avg_block":${r.getDouble(2)}}""")
        }
        cust.unpersist(); docs.unpersist()
      }
    }
    // round-9 families. No-split packing: one shuffle on shard + a linear
    // per-shard fold — time must track n (shards fixed), and the fold is
    // embarrassing across shards, so raising `shards` with the corpus
    // keeps per-shard streams constant (recorded via max_shard_docs).
    // JW linkage: blocked candidates only — candidate count, not corpus
    // size squared, is the cost driver (same claim as the lev linkage).
    for (f <- Seq(1, factor, 3 * factor)) {
      val docs = corpus(f)
      locally {
        val t0 = System.nanoTime()
        val packed = operators.Splits.packGreedy(docs, "doc_id",
          operators.TextAnalysis.tokenCount(col("text")),
          budget = 512, shards = 8)
        val r = packed.groupBy(col("shard")).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("shards"), max(col("n")).as("max_shard_docs"),
            sum(col("n")).as("docs")).collect()(0)
        println(f"""{"probe":"pack_greedy","factor":$f,""" +
          f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f,""" +
          s""""docs":${r.getLong(2)},"max_shard_docs":${r.getLong(1)}}""")
      }
      locally {
        // scaled-shards rung: shards grow with the corpus (8·f), so the
        // per-shard stream length stays ~constant — the 100 TB spelling
        val t0 = System.nanoTime()
        val n = operators.Splits.packGreedy(docs, "doc_id",
          operators.TextAnalysis.tokenCount(col("text")),
          budget = 512, shards = 8 * f).count()
        println(f"""{"probe":"pack_greedy_scaled_shards","factor":$f,""" +
          f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f,"docs":$n}""")
      }
      locally {
        // k-core peeling on the f-scaled derived graph + planted clique:
        // per round two survivor semi-joins + a degree groupBy — time
        // should track edges (linear), never paths; the planted clique
        // grows with the corpus so the extracted core does too
        val ids = docs.select(col("doc_id"))
        val n = ids.count()
        val edges = ids
          .select(col("doc_id").as("src"), explode(array(
            pmod(col("doc_id") + 17, lit(n)),
            pmod(col("doc_id") + 101, lit(n)),
            pmod(col("doc_id") * 3 + 7, lit(n)))).as("dst"))
          .filter(col("src") =!= col("dst")).distinct()
        val planted = ids.filter(col("doc_id") % 500 === 0)
        val clique = planted.select(col("doc_id").as("src"))
          .crossJoin(planted.select(col("doc_id").as("dst")))
          .filter(col("src") < col("dst"))
        val t0 = System.nanoTime()
        val core = operators.LinkRank.kCore(
          edges.unionByName(clique), k = 8, rounds = 4).count()
        println(f"""{"probe":"d_kcore","factor":$f,""" +
          f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f,"core":$core}""")
      }
      docs.unpersist()
    }
    // t-closeness on the f-replicated customer table: the grid stays
    // |classes|×|bands| regardless of rows, so time should be one-scan
    // bound (FLAT-ish) — the same shape as the chi² and k-anon audits
    locally {
      val cbase = Tables(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
          col("c_acctbal"))
      val cn = cbase.count()
      for (f <- Seq(1, factor, 3 * factor)) {
        val cust = (0 until f).map(k => cbase.select(
            (col("c_custkey") + lit(k * cn)).as("c_custkey"),
            col("c_mktsegment"), col("c_nationkey"), col("c_acctbal")))
          .reduce(_ unionAll _).localCheckpoint()
        val t0 = System.nanoTime()
        val rows = {
          val cu = cust.select(col("c_mktsegment"), col("c_nationkey"),
            floor(col("c_acctbal") / 1000).cast("bigint").as("band"))
          val cb = cu.groupBy(col("c_mktsegment"), col("c_nationkey"), col("band"))
            .agg(count(lit(1)).as("cnt"))
          val classes = cb.groupBy(col("c_mktsegment"), col("c_nationkey"))
            .agg(sum(col("cnt")).as("n_c"))
          val gband = cu.groupBy(col("band")).agg(count(lit(1)).as("g_cnt"))
          val totals = cu.agg(count(lit(1)).as("n_all"),
            countDistinct(col("band")).as("n_bands"))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("c_mktsegment"), col("c_nationkey"))
            .orderBy(col("band"))
          classes.crossJoin(broadcast(gband))
            .join(cb, Seq("c_mktsegment", "c_nationkey", "band"), "left")
            .na.fill(0L, Seq("cnt"))
            .withColumn("cum_c", sum(col("cnt")).over(w))
            .withColumn("cum_g", sum(col("g_cnt")).over(w))
            .crossJoin(totals)
            .groupBy(col("c_mktsegment"), col("c_nationkey"), col("n_c"),
              col("n_all"), col("n_bands"))
            .agg(sum(abs(col("cum_c") * col("n_all") -
              col("cum_g") * col("n_c"))).as("num"))
            .count()
        }
        println(f"""{"probe":"q_tcloseness_audit","factor":$f,""" +
          f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f,"classes":$rows}""")
        cust.unpersist()
      }
    }
    // round-10 text additions on the replicated documents corpus: the
    // sliding chunker is map-side (expect FLAT-to-linear scan cost), the
    // adaptive gate is one source-keyed window shuffle (expect linear)
    locally {
      val dbase = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
      val dn = dbase.count()
      for (f <- Seq(1, factor, 3 * factor)) {
        val docs = (0 until f).map(k => dbase.select(
            (col("doc_id") + lit(k * dn)).as("doc_id"),
            col("text"),
            concat(lit("src"), pmod(col("doc_id"), lit(8))).as("source")))
          .reduce(_ unionAll _).localCheckpoint()
        locally {
          val t0 = System.nanoTime()
          val n = operators.TextAnalysis.slidingChunks(docs, "doc_id", "text",
            size = 16, stride = 8).count()
          println(f"""{"probe":"d_chunk_sliding","factor":$f,""" +
            f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f,"chunks":$n}""")
        }
        locally {
          val t0 = System.nanoTime()
          val n = operators.TextAnalysis.adaptiveQualityGate(docs, "doc_id",
            "source", "text").count()
          println(f"""{"probe":"d_adaptive_quality","factor":$f,""" +
            f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f,"kept":$n}""")
        }
        locally {
          // chunk→retrieval composition: BM25 over the f× CHUNK corpus
          // (the chunker itself is proven FLAT above; this prices the
          // scorer on its output). The candidate bound that decides the
          // growth class is cand_rows = Σ_{t ∈ query terms} df(t) over
          // chunks — the (chunk, term) rows reaching the scoring join.
          // With a fixed 5-doc query set every query term's df grows
          // ∝ f, so expect sec to track cand_rows LINEARLY; anything
          // super-linear indicts the corpus-stats aggregates, not the
          // scoring join.
          val chunks = operators.TextAnalysis.slidingChunks(docs,
              "doc_id", "text", size = 16, stride = 8)
            .select((shiftleft(col("doc_id"), 20) + col("chunk_id"))
              .as("cid"), col("chunk_text"))
          val queries = docs.filter(col("doc_id") < 5)
          val t0 = System.nanoTime()
          val n = operators.Retrieval.bm25TopK(chunks, queries,
            "cid", "chunk_text", "doc_id", "text").count()
          val sec = (System.nanoTime() - t0) / 1e9
          val qterms = queries.select(explode(operators.TextAnalysis.tokens(
              lower(trim(col("text"))))).as("term")).distinct()
          val cand = chunks.select(col("cid"),
              explode(array_distinct(operators.TextAnalysis.tokens(
                lower(trim(col("chunk_text")))))).as("term"))
            .join(qterms, Seq("term")).count()
          println(f"""{"probe":"d_chunk_bm25","factor":$f,"sec":$sec%.2f,""" +
            s""""topk_rows":$n,"cand_rows":$cand}""")
        }
        locally {
          // round-12 composed training-example row: anchors FIXED (the
          // co-chunk pairs of 5 docs), negatives mined off the f× chunk
          // store — the same cand_rows = Σ df(t) driver as d_chunk_bm25
          // (fixed anchor term set, per-term df ∝ f), so expect LINEAR;
          // store build priced separately (ingest-time cost)
          val chunks = operators.TextAnalysis.slidingChunks(docs,
              "doc_id", "text", size = 16, stride = 8)
            .select((shiftleft(col("doc_id"), 20) + col("chunk_id"))
              .as("cid"), col("chunk_text"))
          val cPath = new java.io.File(System.getProperty("java.io.tmpdir"),
            s"graft_probe_chunkstore_$f").getAbsolutePath
          val tb = System.nanoTime()
          operators.Retrieval.writeBm25Store(chunks, "cid", "chunk_text",
            cPath)
          println(f"""{"probe":"chunk_store_build","factor":$f,"sec":${(System.nanoTime() - tb) / 1e9}%.2f}""")
          val store = operators.Retrieval.readBm25Store(spark, cPath)
          val t0 = System.nanoTime()
          val n = operators.Retrieval.contrastiveExamples(
            docs.filter(col("doc_id") < 5), store, "doc_id", "text").count()
          println(f"""{"probe":"d_contrastive_examples","factor":$f,""" +
            f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
        }
        docs.unpersist()
      }
    }
    forgetProbes(spark, sfDir, factor)
    feederProbe(spark, sfDir, factor)
    spark.stop()
  }

  /** The two erasure receipts, standalone-runnable (graft.ForgetProbe)
    * so the forget arms can refresh without the full probe sweep. */
  def forgetProbes(spark: SparkSession, sfDir: String, factor: Int): Unit = {
    def duBytes(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
    }
    // round-12 vector-store deletion probe: a FIXED 20-id tombstone
    // batch against a growing auto-codebook IVF store. The claim under
    // probe: compaction rewrites only the HIT directories' survivors —
    // ~20·(N/C) = 20·√N rows at C = √N — SUB-LINEAR in store size, and
    // the directories touched stay ≤20 while the directory count grows.
    // Round 13 adds the FINDER claim: with the id sidecar the erasure
    // batch READS only its tombstones' id-hash sidecar directories plus
    // the hit centroid directories (bytes_read, measured off the task
    // input metrics — NOTE it also counts the survivors' checkpoint
    // blocks re-read at uncompressed size during the rewrite, so it
    // bounds file reads from above) — never the store's full
    // (id, centroid_id) columns. hit_dir_bytes is the deterministic
    // on-disk size of everything the pruned scans CAN touch.
    locally {
      val emb = embReplicator(spark, sfDir)
      for (f <- Seq(1, factor, 3 * factor)) {
        val corpus = emb.corpus(f)
        val seeds = operators.Similarity.autoCoarseCodebook(
          corpus, "vec_id", "embedding")
        val path = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_probe_ivfforget_$f").getAbsolutePath
        operators.Similarity.writeIvfStore(corpus, "vec_id", "embedding",
          seeds, path)
        val store = spark.read.parquet(path)
        val tomb = corpus.filter(col("vec_id") < 20).select(col("vec_id"))
          .localCheckpoint()
        val hitDirs = store.join(tomb, Seq("vec_id"), "left_semi")
          .select(col("centroid_id")).distinct().count()
        val hitRows = store.join(
            store.join(tomb, Seq("vec_id"), "left_semi")
              .select(col("centroid_id")).distinct(), Seq("centroid_id"),
            "left_semi").count()
        val total = store.count()
        val hitDirBytes = store.join(tomb, Seq("vec_id"), "left_semi")
          .select(col("centroid_id").cast("int")).distinct().collect()
          .map(r => duBytes(s"$path/centroid_id=${r.getInt(0)}")).sum
        val storeBytes = duBytes(path)
        val sidecarBytes = duBytes(s"$path/_graft_ids")
        val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (te.taskMetrics != null)
              bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
        }
        spark.sparkContext.addSparkListener(listener)
        // event delivery is ASYNC: the store-build jobs above may still
        // be draining through the bus when the listener attaches, and
        // their task-end events would inflate the receipt by the build's
        // own (scale-proportional) reads — drain the queue
        // DETERMINISTICALLY (waitUntilEmpty, not a fixed sleep that
        // merely makes the race unlikely), then zero the counter so only
        // the forget's tasks count
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        bytesRead.set(0)
        val t0 = System.nanoTime()
        operators.Similarity.forgetIvfStoreAt(spark, path, tomb, "vec_id")
        val sec = (System.nanoTime() - t0) / 1e9
        // drain again so the forget's own late task-end events land
        // before the counter is read
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        spark.sparkContext.removeSparkListener(listener)
        println(f"""{"probe":"ivf_forget","factor":$f,"sec":$sec%.2f,""" +
          f""""dirs_hit":$hitDirs,"dirs_total":${seeds.size},""" +
          s""""rows_in_hit_dirs":$hitRows,"rows_total":$total,""" +
          s""""hit_dir_bytes":$hitDirBytes,""" +
          s""""task_input_bytes":${bytesRead.get()},"store_bytes":$storeBytes,""" +
          s""""sidecar_bytes":$sidecarBytes}""")
        corpus.unpersist(); tomb.unpersist()
      }
    }
    // round-14 postings-erasure probe: a FIXED 3-doc tombstone batch
    // against an f× BM25 store whose bucket count scales with the corpus
    // (the production sizing rule — a frozen modulus would leave every
    // bucket directory growing ∝ corpus). The claim under probe: with the
    // tbuckets id sidecar the forget FINDER reads only the tombstoned
    // docs' OWN term-hash bucket directories (plus the tombstones'
    // id-hash sidecar directories and the vocabulary-bounded df table it
    // rewrites), never all postings — so hit buckets track the
    // tombstones' distinct terms while the bucket count grows, and the
    // on-disk bytes the forget can touch (hit_postings_bytes +
    // docs_hit_bytes + dfreq_bytes) FALL as a fraction of store bytes at
    // 10×/30×. task_input_bytes is the listener total — it additionally
    // counts the survivors' checkpoint blocks re-read at UNCOMPRESSED
    // size (keep-set collect + rewrite write), so it is an upper bound
    // on file reads, not comparable to the compressed store_bytes.
    locally {
      // the synthetic test corpus has a 31-WORD vocabulary — every doc
      // contains essentially every term, so every bucket is hit by any
      // tombstone and byte-level postings pruning is structurally
      // untestable on it as-is. Widen the vocabulary deterministically
      // (suffix = id mod 211 → |V| ≈ 6.5k) to reach the regime the
      // pruning claim addresses (|V| ≫ buckets ≫ per-doc distinct
      // terms); per-doc term counts and the Zipf weights within each
      // suffix class are unchanged.
      val base0 = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val base = base0.select(col("doc_id"),
        concat_ws(" ", transform(
          split(lower(trim(col("text"))), "\\s+"),
          t => concat(t, lit("x"),
            pmod(col("doc_id"), lit(211)).cast("string")))).as("text"))
      val n = base.count()
      val shift = ((n + 249) / 250) * 250
      def corpus(f: Int): DataFrame =
        (0 until f).map(k => base.select(
            (col("doc_id") + lit(k * shift)).as("doc_id"), col("text")))
          .reduce(_ union _).localCheckpoint()
      for (f <- Seq(1, factor, 3 * factor)) {
        val docs = corpus(f)
        val buckets = 64 * f
        val path = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_probe_bm25forget_$f").getAbsolutePath
        operators.Retrieval.writeBm25Store(docs, "doc_id", "text", path,
          buckets = buckets)
        val tomb = docs.filter(col("doc_id") < 3).select(col("doc_id"))
          .localCheckpoint()
        val side = spark.read.parquet(s"$path/docs")
          .join(tomb, Seq("doc_id"), "left_semi").localCheckpoint()
        val hitB = side.select(explode(col("tbuckets")).as("b"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val hitPostingsBytes =
          hitB.map(b => duBytes(s"$path/postings/bucket=$b")).sum
        val docsHitBytes = side.select(col("dbucket").cast("int"))
          .distinct().collect().map(_.getInt(0))
          .map(b => duBytes(s"$path/docs/dbucket=$b")).sum
        val dfreqBytes = duBytes(s"$path/dfreq")
        val storeBytes = duBytes(path)
        val postingsBytes = duBytes(s"$path/postings")
        val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (te.taskMetrics != null)
              bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
        }
        spark.sparkContext.addSparkListener(listener)
        // deterministic drain at both edges (see the ivf_forget arm)
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        bytesRead.set(0)
        val t0 = System.nanoTime()
        operators.Retrieval.forgetBm25StoreAt(spark, path, tomb, "doc_id")
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
        spark.sparkContext.removeSparkListener(listener)
        println(f"""{"probe":"bm25_forget_finder","factor":$f,"sec":$sec%.2f,""" +
          s""""buckets_hit":${hitB.size},"buckets_total":$buckets,""" +
          s""""hit_postings_bytes":$hitPostingsBytes,""" +
          s""""docs_hit_bytes":$docsHitBytes,"dfreq_bytes":$dfreqBytes,""" +
          s""""task_input_bytes":${bytesRead.get()},""" +
          s""""store_bytes":$storeBytes,"postings_bytes":$postingsBytes}""")
        docs.unpersist(); tomb.unpersist()
      }
    }
    // round-15 winnow-erasure probe: a FIXED 3-doc tombstone batch
    // against an f× refcounted winnow store whose directory moduli scale
    // with the corpus (fpB = 32·f, docB = 16·f — the production sizing
    // rule, possible because the moduli are FROZEN in _graft_layout and
    // every mutation reads them back). The claim: the forget reads only
    // the tombstones' own id-hash sidecar directories plus the hit fp
    // directories their fingerprints live in — hit fp dirs track the
    // tombstones' ~n_tokens/w selected fingerprints while the directory
    // count grows, so the on-disk bytes the forget can touch FALL as a
    // fraction of store bytes at 10×/30×. Widened vocabulary (suffix =
    // id mod 211) for the same reason as the bm25 arm: with 31 distinct
    // words every doc's shingles collide into every fp bucket.
    locally {
      val base0 = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val base = base0.select(col("doc_id"),
        concat_ws(" ", transform(
          split(lower(trim(col("text"))), "\\s+"),
          t => concat(t, lit("x"),
            pmod(col("doc_id"), lit(211)).cast("string")))).as("text"))
      val n = base.count()
      val shift = ((n + 249) / 250) * 250
      def corpus(f: Int): DataFrame =
        (0 until f).map(k => base.select(
            (col("doc_id") + lit(k * shift)).as("doc_id"), col("text")))
          .reduce(_ union _).localCheckpoint()
      for (f <- Seq(1, factor, 3 * factor)) {
        val docs = corpus(f)
        val path = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_probe_winnowforget_$f").getAbsolutePath
        operators.Dedup.writeWinnowStoreAt(spark, path, docs,
          "doc_id", "text", fpBuckets = 32 * f, docBuckets = 16 * f)
        val (_, _, fpB, docB) = operators.Dedup.winnowLayoutAt(spark, path)
        val tomb = docs.filter(col("doc_id") < 3).select(col("doc_id"))
          .localCheckpoint()
        // everything the pruned forget CAN touch, deterministically on
        // disk: the tombstones' sidecar directories + their fps' dirs
        val side = spark.read.parquet(s"$path/docs")
        val tombDb = tomb.select(
            pmod(xxhash64(col("doc_id")), lit(docB)).cast("int").as("b"))
          .distinct().collect().map(_.getInt(0))
        val hitFb = side.filter(col("dbucket").isInCollection(tombDb.toSeq))
          .join(tomb, Seq("doc_id"), "left_semi")
          .select(pmod(xxhash64(col("fp")), lit(fpB)).cast("int").as("b"))
          .distinct().collect().map(_.getInt(0))
        val docsHitBytes = tombDb.map(b => duBytes(s"$path/docs/dbucket=$b")).sum
        val fpsHitBytes = hitFb.map(b => duBytes(s"$path/fps/fbucket=$b")).sum
        val storeBytes = duBytes(path)
        val fpsBytes = duBytes(s"$path/fps")
        val t0 = System.nanoTime()
        operators.Dedup.forgetWinnowStoreAt(spark, path, tomb, "doc_id")
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"winnow_forget","factor":$f,"sec":$sec%.2f,""" +
          s""""fp_dirs_hit":${hitFb.length},"fp_dirs_total":$fpB,""" +
          s""""doc_dirs_hit":${tombDb.length},"doc_dirs_total":$docB,""" +
          s""""fps_hit_bytes":$fpsHitBytes,"docs_hit_bytes":$docsHitBytes,""" +
          s""""fps_bytes":$fpsBytes,"store_bytes":$storeBytes}""")
        docs.unpersist(); tomb.unpersist()
      }
    }
    // round-15 NB-unlearning probe: a FIXED 3-doc tombstone batch (WITH
    // content — the unlearning contract) against an f× trained store
    // whose sidecar modulus scales with the corpus (docB = 16·f, frozen
    // in _graft_layout). The claim: the membership probe reads only the
    // tombstones' own sidecar directories, and the rewrite side is
    // VOCABULARY-BOUNDED (model = |V|·|classes| rows, base = |classes|)
    // regardless of corpus size — so the bytes the forget can touch fall
    // as a fraction of the store while the sidecar grows ∝ corpus.
    locally {
      val base = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val n = base.count()
      val shift = ((n + 249) / 250) * 250
      def corpus(f: Int): DataFrame =
        (0 until f).map(k => base.select(
            (col("doc_id") + lit(k * shift)).as("doc_id"),
            col("text"), col("lang")))
          .reduce(_ union _).localCheckpoint()
      for (f <- Seq(1, factor, 3 * factor)) {
        val docs = corpus(f)
        val path = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_probe_nbforget_$f").getAbsolutePath
        operators.Classify.writeNbStore(docs, "doc_id", "text", "lang",
          path, docBuckets = 16 * f)
        val docB = operators.Classify.nbLayoutAt(spark, path)
        val tomb = docs.filter(col("doc_id") < 3).localCheckpoint()
        val tombDb = tomb.select(
            pmod(xxhash64(col("doc_id")), lit(docB)).cast("int").as("b"))
          .distinct().collect().map(_.getInt(0))
        val docsHitBytes = tombDb.map(b => duBytes(s"$path/docs/dbucket=$b")).sum
        val modelBytes = duBytes(s"$path/model")
        val baseBytes = duBytes(s"$path/base")
        val storeBytes = duBytes(path)
        val t0 = System.nanoTime()
        operators.Classify.forgetNbStoreAt(spark, path, tomb,
          "doc_id", "text", "lang")
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"probe":"nb_forget","factor":$f,"sec":$sec%.2f,""" +
          s""""doc_dirs_hit":${tombDb.length},"doc_dirs_total":$docB,""" +
          s""""docs_hit_bytes":$docsHitBytes,"model_bytes":$modelBytes,""" +
          s""""base_bytes":$baseBytes,"store_bytes":$storeBytes}""")
        docs.unpersist(); tomb.unpersist()
      }
    }
  }

  /** Two-level codebook GROWTH probe (the `grow` feeder arm): build the
    * auto two-level store at f×, then force splits with a LOW share bar
    * and audit the rewrite scope — the claim is rewritten rows =
    * Σ|affected tops' rows| (each affected top ≈ N/T rows), never the
    * store; with flagged children spread over a few tops the rewrite is
    * a T-th-fraction multiple of the store while the untouched
    * directories never re-read.
    */
  def growProbe(spark: SparkSession, sfDir: String, factor: Int): Unit = {
    val emb = embReplicator(spark, sfDir)
    for (f <- Seq(1, factor, 3 * factor)) {
      val corpus = emb.corpus(f)
      val path = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_probe_ivf2grow_$f").getAbsolutePath
      val cb = operators.Similarity.writeIvfStoreTwoLevelAuto(
        corpus, "vec_id", "embedding", path)
      val store = spark.read.parquet(path)
      val total = store.count()
      // share bar low enough to flag the fattest few children: the
      // auto codebook balances to ~1/C shares, so 2/C (as a pct) flags
      // roughly the above-median-by-2x tail
      val bar = 200.0 / cb.size
      val t0 = System.nanoTime()
      val grown = operators.Similarity.splitHotChildrenAt(spark, path,
        "vec_id", "embedding", cb, maxSharePct = bar)
      val sec = (System.nanoTime() - t0) / 1e9
      val added = grown.size - cb.size
      // rewrite scope audit AFTER the fact: rows now living under the
      // affected tops (identical count to what was rewritten — a split
      // moves rows between a top's own directories only)
      val affectedTops = grown.gids.indices.filter(t =>
        grown.gids(t).size > cb.gids(t).size)
      val affectedGids = affectedTops.flatMap(grown.gids)
      val rewritten =
        if (added == 0) 0L
        else spark.read.parquet(path)
          .filter(col("centroid_id").isInCollection(affectedGids)).count()
      println(f"""{"probe":"ivf2_grow","factor":$f,"sec":$sec%.2f,""" +
        f""""c_before":${cb.size},"children_added":$added,""" +
        f""""tops_affected":${affectedTops.size},"tops_total":${cb.tops.size},""" +
        s""""rows_rewritten":$rewritten,"rows_total":$total}""")
      corpus.unpersist()
    }
  }

  /** ivfSelfTopK mutual-kNN feeder probe: its Σ_cluster
    * |members|×|probers| bound is the whole 100 TB story and it
    * DEGENERATES under cluster imbalance — a fixed-size codebook on a
    * growing corpus makes every cluster grow ∝ N, so in-cluster
    * candidate work grows ∝ N² even though the plan never goes
    * cartesian. Three arms per factor:
    *   fixed_codebook  — the 8-seed graded-query codebook on an f×
    *                     corpus: expect SUPER-LINEAR time (the audit
    *                     column `sumsq` = Σ|members|² names the cause).
    *   scaled_codebook — 8·f seeds (one 8-seed family per replica), so
    *                     per-cluster membership stays ~flat: the
    *                     documented mitigation with replica knowledge.
    *   auto_codebook   — autoCoarseCodebook's √N policy, no replica
    *                     knowledge: sumsq should track N^1.5.
    * Replicas are cyclic coordinate ROTATIONS of the base embeddings
    * (norms and within-replica geometry preserved, no cross-replica
    * collapse), so scaled-arm seeds genuinely separate the replicas.
    * Re-runnable in isolation via `runMain graft.FeederProbe [sfDir]
    * [factor] [arm,...]` — single-shot timings on this VM carry stall
    * risk, so a suspicious arm gets its own clean rerun.
    */
  def feederProbe(spark: SparkSession, sfDir: String, factor: Int,
                  arms: Set[String] = Set("fixed", "scaled", "auto")): Unit = {
    locally {
      val emb = embReplicator(spark, sfDir)
      val embBase = emb.base
      val dim = emb.dim
      def embCorpus(f: Int): DataFrame = emb.corpus(f)
      def unitSeedsOf(df: DataFrame, n: Int): Seq[Seq[Double]] =
        df.orderBy(col("vec_id")).limit(n)
          .select(col("embedding")).collect()
          .map(_.getSeq[Double](0).toSeq).toSeq
          .map { v =>
            val nn = math.sqrt(v.map(x => x * x).sum)
            if (nn == 0.0) v else v.map(_ / nn)
          }
      val baseSeeds = unitSeedsOf(embBase, 8)
      def probeArm(arm: String, f: Int, seeds: Seq[Seq[Double]]): Unit = {
        val corpus = embCorpus(f)
        val store = operators.Similarity.assignCentroids(
            operators.Similarity.normalized(
              corpus.withColumn("__u", col("embedding")), "__u"),
            "__u", seeds)
          .drop("__u").localCheckpoint()
        val hist = store.groupBy(col("centroid_id"))
          .agg(count(lit(1)).as("m"))
          .agg(count(lit(1)).as("clusters"), max(col("m")).as("max_m"),
            sum(col("m") * col("m")).as("sumsq"), sum(col("m")).as("rows"))
          .head()
        val t0 = System.nanoTime()
        val out = operators.Similarity.ivfSelfTopK(store, "vec_id",
          "embedding", k = 5, coarse = seeds, nprobe = 3).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val maxShare = 100.0 * hist.getLong(1) / hist.getLong(3)
        println(f"""{"probe":"mutual_knn_feeder_$arm","factor":$f,""" +
          f""""sec":$sec%.2f,"rows":${hist.getLong(3)},""" +
          f""""clusters":${hist.getLong(0)},"max_share_pct":$maxShare%.1f,""" +
          s""""sumsq":${hist.getLong(2)},"topk_rows":$out}""")
        store.unpersist(); corpus.unpersist()
      }
      // fixed arm CLAMPS at 10x regardless of the requested factor: its
      // N² candidate volume is the finding, not a number worth minutes
      // of probe time at 30x (the scaled/auto arms carry the big factors)
      if (arms("fixed"))
        for (f <- Seq(1, 3, math.min(factor, 10)))
          probeArm("fixed_codebook", f, baseSeeds)
      if (arms("scaled"))
        for (f <- Seq(1, factor, 3 * factor)) {
          val seeds = (0 until f).flatMap(k => baseSeeds.map { s =>
            val sh = k % dim
            s.drop(sh) ++ s.take(sh)
          })
          probeArm("scaled_codebook", f, seeds)
        }
      // auto arm: the sizing POLICY itself under probe — no replica
      // knowledge, just autoCoarseCodebook's sqrt(N) + hash-stride +
      // share-audit split on the raw f-times corpus. Expect ~N^1.5-or-
      // better time growth (per-row work ∝ sqrt(N)) and max_share_pct
      // staying low without anyone telling it the replica count.
      if (arms("auto"))
        for (f <- Seq(1, factor, 3 * factor)) {
          val corpus = embCorpus(f)
          val t0 = System.nanoTime()
          val seeds = operators.Similarity.autoCoarseCodebook(
            corpus, "vec_id", "embedding")
          val sizingSec = (System.nanoTime() - t0) / 1e9
          println(f"""{"probe":"mutual_knn_feeder_auto_sizing","factor":$f,""" +
            f""""sec":$sizingSec%.2f,"codebook":${seeds.size}}""")
          probeArm("auto_codebook", f, seeds)
          corpus.unpersist()
        }
      // clamped arm — the BEFORE picture of the hierarchical quantizer:
      // the sqrt(N) policy with cMax scaled DOWN (64) so the probe hits
      // the clamp boundary at probeable N (the production clamp's 4096
      // needs N > 16.7M to bind — same mechanism, unreachable wall-clock
      // on this VM). Under the clamp C pins, so sumsq = Σ|m|² must leave
      // the N^1.5 track by exactly sqrt(N)/cMax — the departure factor
      // the README table names per rung.
      if (arms("clamped"))
        for (f <- Seq(1, factor, 3 * factor)) {
          val corpus = embCorpus(f)
          val seeds = operators.Similarity.autoCoarseCodebook(
            corpus, "vec_id", "embedding", cMax = 64)
          println(f"""{"probe":"mutual_knn_feeder_clamped_sizing","factor":$f,""" +
            s""""codebook":${seeds.size},"cmax":64}""")
          probeArm("clamped_codebook", f, seeds)
          corpus.unpersist()
        }
      // twolevel arm — the AFTER picture: autoTwoLevelCodebook keeps C
      // tracking sqrt(N) PAST any flat clamp because assignment runs the
      // O(2·sqrtC·d) kernel instead of C literal expressions. Per rung:
      // sizing cost, a head-to-head assignment pass over the SAME C
      // centroids (flat literal-array vs two-level kernel — the wall
      // being removed, isolated from everything else), then the full
      // feeder with sumsq/max-share audits (expect the N^1.5 track).
      if (arms("twolevel"))
        for (f <- Seq(1, factor, 3 * factor)) {
          val corpus = embCorpus(f)
          val t0 = System.nanoTime()
          val cb = operators.Similarity.autoTwoLevelCodebook(
            corpus, "vec_id", "embedding")
          val sizingSec = (System.nanoTime() - t0) / 1e9
          println(f"""{"probe":"mutual_knn_feeder_twolevel_sizing","factor":$f,""" +
            f""""sec":$sizingSec%.2f,"codebook":${cb.size},"tops":${cb.tops.size}}""")
          val unit = operators.Similarity.normalized(
            corpus.select(col("vec_id"),
              col("embedding").cast("array<double>").as("__u")), "__u")
            .localCheckpoint()
          // head-to-head assignment over the SAME centroids
          val tf0 = System.nanoTime()
          val nFlat = operators.Similarity.assignCentroids(unit, "__u", cb.flat)
            .select(col("centroid_id")).filter(col("centroid_id") >= 0).count()
          val flatSec = (System.nanoTime() - tf0) / 1e9
          val t20 = System.nanoTime()
          val n2 = unit.select(element_at(
              graft.functions.VectorFunctions.two_level_probes(
                col("__u"), cb.tops, cb.children, 1, 1), 1).as("g"))
            .filter(col("g") >= 0).count()
          val twoSec = (System.nanoTime() - t20) / 1e9
          println(f"""{"probe":"mutual_knn_feeder_twolevel_assign","factor":$f,""" +
            f""""rows":$n2,"flat_sec":$flatSec%.2f,"twolevel_sec":$twoSec%.2f,""" +
            f""""c":${cb.size},"flat_rows":$nFlat}""")
          // the full feeder through the kernel probes
          val store = unit
            .withColumn("centroid_id", element_at(
              graft.functions.VectorFunctions.two_level_probes(
                col("__u"), cb.tops, cb.children, 1, 1), 1))
            .select(col("vec_id"),
              col("__u").as("embedding"), col("centroid_id"))
            .localCheckpoint()
          val hist = store.groupBy(col("centroid_id"))
            .agg(count(lit(1)).as("m"))
            .agg(count(lit(1)).as("clusters"), max(col("m")).as("max_m"),
              sum(col("m") * col("m")).as("sumsq"), sum(col("m")).as("rows"))
            .head()
          val tq0 = System.nanoTime()
          val out = operators.Similarity.ivfSelfTopKTwoLevel(store, "vec_id",
            "embedding", k = 5, cb, nprobeTop = 2, nprobe = 3).count()
          val sec = (System.nanoTime() - tq0) / 1e9
          val maxShare = 100.0 * hist.getLong(1) / hist.getLong(3)
          println(f"""{"probe":"mutual_knn_feeder_twolevel","factor":$f,""" +
            f""""sec":$sec%.2f,"rows":${hist.getLong(3)},""" +
            f""""clusters":${hist.getLong(0)},"max_share_pct":$maxShare%.1f,""" +
            s""""sumsq":${hist.getLong(2)},"topk_rows":$out}""")
          store.unpersist(); unit.unpersist(); corpus.unpersist()
        }
    }
  }
}

/** Isolated rerun of the mutual-kNN feeder arms (see
  * [[ScaleProbe.feederProbe]]): `runMain graft.FeederProbe [sfDir]
  * [factor] [arm,arm...]` with arms from fixed|scaled|auto.
  */
object FeederProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val validArms = Set("fixed", "scaled", "auto", "clamped", "twolevel",
      "grow")
    val arms = if (args.length > 2) args(2).split(",").map(_.trim).toSet
               else validArms
    // free-form names run ZERO arms (feederProbe tests membership), so a
    // typo like "autos" would silently measure nothing — fail loudly
    val unknown = arms -- validArms
    if (unknown.nonEmpty) {
      System.err.println(s"unknown arm(s): ${unknown.mkString(", ")} — " +
        s"valid arms: ${validArms.toSeq.sorted.mkString("|")}")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (arms("grow")) ScaleProbe.growProbe(spark, sfDir, factor)
    ScaleProbe.feederProbe(spark, sfDir, factor, arms - "grow")
    spark.stop()
  }
}

/** Standalone runner for the four erasure receipts ([[ScaleProbe.forgetProbes]])
  * — refresh the forget receipts without the full probe sweep.
  * Usage: `runMain graft.ForgetProbe [sfDir] [factor]`.
  */
object ForgetProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleProbe.forgetProbes(spark, sfDir, factor)
    spark.stop()
  }
}
