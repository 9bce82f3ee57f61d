package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators._

/** Plan-shape regression guards for the scale claims in README: these
  * assertions fail if a future edit re-introduces a cartesian product, an
  * extra exchange, or un-pushed filters into the audited operators. The
  * sf0.001 tables are real parquet, so pushdown shows up exactly as it
  * would on a cluster.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString
  private def exchanges(p: String): Int =
    p.linesIterator.count(l => l.contains("Exchange hashpartitioning") ||
      l.contains("Exchange rangepartitioning"))

  test("bucketed embedding near-dup has no cartesian product") {
    val p = plan(SparkEntry.queries("s_embed_neardup_bucketed")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("stored mutual-kNN: shuffle join on centroid_id, no cartesian, no corpus broadcast") {
    // the production mutual-kNN feeder (ivfSelfTopK) must never plan the
    // N² cartesian the brute-force truth twin pays: candidates come from
    // a hash equi-join on centroid_id, and the corpus-sized query side is
    // NOT broadcast (a corpus broadcast is the other 100 TB killer)
    val p = plan(SparkEntry.queries("s_mutual_knn_stored")(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("centroid_id"), p)
    // the truth twin IS the cartesian — that contrast is the point
    val truth = plan(SparkEntry.queries("s_mutual_knn")(spark, dir))
    assert(truth.contains("BroadcastNestedLoopJoin") || truth.contains("CartesianProduct"), truth)
  }

  test("as-of join: one hash exchange feeds the window (union+window, no range blowup)") {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val p = plan(AsofJoin.asof(purchases, clicks, "user_id", "ts", "ts",
      rightCols = Seq("event_id", "value"), prefix = "prior_"))
    // event_type filter pushed to the parquet scan on both sides
    assert(p.contains("PushedFilters") && p.contains("event_type"), p)
    assert(exchanges(p) == 1, p)
  }

  test("stored index gates read the store; no historical-corpus scan survives") {
    // the scale claim behind every *_stored twin: the historical side
    // comes from the write-once physical index, so NO scan of the
    // historical corpus slice (pushed filter doc_id < 250) remains in
    // the plan — every documents scan is the arriving batch (>= 250).
    // The inline twins carry the < 250 scan the store removes.
    def historicalScan(p: String): Boolean = p.contains("LessThan(doc_id,250)")
    val lshStored = plan(SparkEntry.queries("d_lsh_incremental_stored")(spark, dir))
    assert(lshStored.contains("graft_lshindex"), lshStored)
    assert(!historicalScan(lshStored), lshStored)
    assert(historicalScan(plan(
      SparkEntry.queries("d_lsh_incremental")(spark, dir))))
    val fpStored = plan(SparkEntry.queries("d_dedup_incremental_stored")(spark, dir))
    assert(fpStored.contains("graft_fpindex"), fpStored)
    assert(!historicalScan(fpStored), fpStored)
    assert(historicalScan(plan(
      SparkEntry.queries("d_dedup_incremental")(spark, dir))))
    val wStored = plan(SparkEntry.queries("d_winnow_ingest_stored")(spark, dir))
    assert(wStored.contains("graft_winnowindex"), wStored)
    assert(!historicalScan(wStored), wStored)
  }

  test("stored NB model scores without re-reading the train split") {
    // the inline twin tokenizes the even-doc_id train half on every run;
    // the stored twin reads frozen weights, so no doc_id%2=0 text scan
    // survives — every documents scan is the odd (test) half
    val p = plan(SparkEntry.queries("d_nb_predict_stored")(spark, dir))
    assert(p.contains("graft_nbmodel"), p)
    def trainFilter(s: String) = s.replace(" ", "").contains("%2)=0")
    assert(p.contains("documents.parquet") && !trainFilter(p), p)
    // the inline twin still carries the even-half (train) filter scans
    assert(trainFilter(plan(SparkEntry.queries("d_nb_predict")(spark, dir))))
  }

  test("stored BM25 scores from postings parquet; only the query side reads text") {
    val p = plan(SparkEntry.queries("d_bm25_topk_stored")(spark, dir))
    assert(p.contains("graft_bm25"), p)
    // round 13: the postings scan is DIRECTORY-pruned to the query
    // terms' hash buckets — the broadcast term set carries each term's
    // bucket and the equi-join on the partition column drives DPP, the
    // ivfTopKStored probe mechanism applied to lexical retrieval
    val postScan = p.linesIterator.filter(l =>
      l.contains("graft_bm25") && l.contains("Scan")).toList
    assert(postScan.exists(_.contains("dynamicpruning")),
      s"postings scan not DPP-pruned:\n${postScan.mkString("\n")}")
    // every scan of documents.parquet is the 5-row query side: the
    // doc_id < 5 predicate is pushed into it, and no un-filtered corpus
    // text scan survives anywhere in the plan
    val docScans = p.linesIterator.filter(l =>
      l.contains("documents.parquet")).toList
    assert(docScans.nonEmpty && docScans.forall(_.contains("LessThan(doc_id,5)")), p)
    // the inline twin still pays the full-corpus tokenize (an unfiltered
    // documents scan) — exactly what the store displaces to ingest
    val inline = plan(SparkEntry.queries("d_bm25_topk")(spark, dir))
    assert(inline.linesIterator.exists(l =>
      l.contains("documents.parquet") && !l.contains("LessThan(doc_id,5)")), inline)
  }

  test("fielded incremental merge never re-scans the historical corpus") {
    // the d_bm25f_incremental scale claim: the < 250 slice lives ONLY in
    // the written fielded store, so the merged-store query's documents
    // scans are the arriving batch (>= 250) and the 5-row query side —
    // no historical re-tokenize, no field re-split. Since optimization
    // round 16 the query path localCheckpoints its delta postings and tft
    // frames, which truncates the DEFAULT executed plan to LogicalRDD
    // leaves — audit the full lineage with the materialization gate OFF
    // (results identical; the gate exists for exactly this audit).
    spark.conf.set("spark.graft.retrieval.materialize", "off")
    try {
      val p = plan(SparkEntry.queries("d_bm25f_incremental")(spark, dir))
      assert(p.contains("graft_bm25f"), p)
      assert(!p.contains("LessThan(doc_id,250)"), p)
      assert(p.contains("GreaterThanOrEqual(doc_id,250)"), p)
    } finally spark.conf.unset("spark.graft.retrieval.materialize")
    // and the default (materialized) plan still carries no historical
    // scan anywhere — the checkpointed frames were built from the store
    // plus the arriving batch only
    val pd = plan(SparkEntry.queries("d_bm25f_incremental")(spark, dir))
    assert(!pd.contains("LessThan(doc_id,250)"), pd)
  }

  test("fielded stored scoring keeps its DPP-pruned postings scan") {
    // round 16 moved the fielded hit stream inside a tft checkpoint, so
    // the DEFAULT executed plan no longer shows the store scan (PLANS.md
    // lost the DPP-PRUNED flag on bm25f rows) — assert under the audit
    // gate that the directory pruning still drives the scan
    spark.conf.set("spark.graft.retrieval.materialize", "off")
    try {
      val p = plan(SparkEntry.queries("d_bm25f_stored")(spark, dir))
      val postScan = p.linesIterator.filter(l =>
        l.contains("graft_bm25f") && l.contains("Scan")).toList
      assert(postScan.exists(_.contains("dynamicpruning")),
        s"fielded postings scan not DPP-pruned:\n${postScan.mkString("\n")}")
    } finally spark.conf.unset("spark.graft.retrieval.materialize")
  }

  test("stored PRF: both passes and the mining read postings, not corpus text") {
    // every documents.parquet scan in the stored-PRF plan is the pushed
    // 5-row query side; feedback tf and candidate idf come from the
    // store's postings/dfreq integers (the inline twin re-tokenizes the
    // whole corpus)
    val p = plan(SparkEntry.queries("d_bm25_prf_stored")(spark, dir))
    assert(p.contains("graft_bm25"), p)
    val docScans = p.linesIterator.filter(_.contains("documents.parquet")).toList
    assert(docScans.nonEmpty && docScans.forall(_.contains("LessThan(doc_id,5)")), p)
    val inline = plan(SparkEntry.queries("d_bm25_prf")(spark, dir))
    assert(inline.linesIterator.exists(l =>
      l.contains("documents.parquet") && !l.contains("LessThan(doc_id,5)")), inline)
  }

  test("contrastive examples: negatives come from the store, anchors from the 5-row side") {
    // the composed training-example row keeps the stored-index shape:
    // chunk postings parquet supplies every negative candidate, and the
    // only text scans are the pushed doc_id < 5 anchor side
    val p = plan(SparkEntry.queries("d_contrastive_examples")(spark, dir))
    assert(p.contains("graft_bm25chunks"), p)
    val docScans = p.linesIterator.filter(_.contains("documents.parquet")).toList
    assert(docScans.nonEmpty && docScans.forall(_.contains("LessThan(doc_id,5)")), p)
    // the only nested-loop joins are the BM25 family's documented 1-row
    // stats broadcasts (PLANS.md legend) — never a data-sized cross
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bucketed fact join: per-order rollup and merge join run with zero exchanges") {
    val df = SparkEntry.queries("q_bucketed_join")(spark, dir)
    val p = plan(df)
    // both scans are the bucketed layouts, the join is a sort-merge over
    // them, and the ONLY exchange in the whole plan is the final 3-row
    // status rollup — the per-order aggregate and the fact-to-fact join
    // ride the ingest-time bucketing
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("graft_bktli") && p.contains("graft_bktord"), p)
    // exactly one hash exchange (the 3-row rollup); the range exchange is
    // the final ORDER BY presentation sort
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
    // SelectedBucketsCount appears on bucketed scans; both sides read 8/8
    assert(p.linesIterator.count(_.contains("Bucketed: true")) == 2, p)
  }

  test("bucketed layout survives a session re-attach via CLUSTERED BY DDL") {
    // the metastore-registration claim made physical: a LATER session does
    // not rewrite the bucketed files — it re-declares them with
    // CREATE TABLE ... CLUSTERED BY ... LOCATION and the zero-exchange
    // SMJ must survive. Simulate: build once, DROP both tables (external
    // tables — files stay), re-run in a FRESH session (own SessionState)
    // so the ensure() path takes the re-attach branch, and pin the plan.
    SparkEntry.queries("q_bucketed_join")(spark, dir).collect()
    val tables = spark.catalog.listTables().collect().map(_.name)
      .filter(t => t.startsWith("graft_bktli") || t.startsWith("graft_bktord"))
    assert(tables.length == 2, tables.mkString(","))
    tables.foreach(t => spark.sql(s"DROP TABLE $t"))
    val fresh = spark.newSession()
    tables.foreach(t => assert(!fresh.catalog.tableExists(t), t))
    val p = plan(SparkEntry.queries("q_bucketed_join")(fresh, dir))
    assert(p.contains("SortMergeJoin"), p)
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
    assert(p.linesIterator.count(_.contains("Bucketed: true")) == 2, p)
    // and the re-attached tables answer identically to the original build
    val rows = SparkEntry.queries("q_bucketed_join")(fresh, dir).collect()
    assert(rows.nonEmpty)
  }

  test("day-partitioned events scan prunes to the queried week's directories") {
    val p = plan(SparkEntry.queries("q_partitioned_scan")(spark, dir))
    val scan = p.linesIterator.filter(_.contains("FileScan")).toList
    assert(scan.nonEmpty, p)
    // the date predicate lands in PartitionFilters (directory pruning),
    // not in PushedFilters over row groups — the scan never lists the
    // other ~23 day directories
    assert(scan.exists(l => l.contains("PartitionFilters") &&
      l.contains("day#") && l.contains("2024-01-08")), p)
  }

  test("minhash signature stage is shuffle-free (kernels are map-side)") {
    val docs = Tables(spark, dir, "documents")
    val p = plan(Dedup.minhashSignatures(docs, "doc_id", "text"))
    assert(exchanges(p) == 0, p)
  }

  test("PQ re-rank against the vector store is DPP-pruned to shortlist partitions") {
    val emb = Tables(spark, dir, "embeddings")
    val store = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_vs_audit").getAbsolutePath
    Similarity.writeVectorStore(emb, "vec_id", "embedding", store, parts = 8)
    // parts round-trips through the persisted layout config — a reader
    // can never pair the store with a wrong modulus
    val vs = Similarity.readVectorStore(spark, store)
    assert(vs._2 == 8)
    val seeds = emb.filter(col("vec_id") < 16).orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val sub = seeds.head.size / 8
    val codebooks = (0 until 8).map(s0 => seeds.map(_.slice(s0 * sub, (s0 + 1) * sub)))
    val df = Similarity.pqTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3, codebooks, shortlist = 10,
      vectorStore = Some(vs))
    val p = plan(df)
    // the fetch scan carries a dynamic pruning filter on vs_part: the
    // shortlist broadcast is reused to skip directories with no survivor
    val storeScan = p.linesIterator.filter(l =>
      l.contains("FileScan") && l.contains("vs_part")).toSeq
    assert(storeScan.nonEmpty, p)
    assert(storeScan.exists(_.contains("dynamicpruning")),
      s"re-rank store scan not DPP-pruned:\n${storeScan.mkString("\n")}")
    // and the pruned path returns the same rows as the flat-corpus path
    val flat = Similarity.pqTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3, codebooks, shortlist = 10)
    assert(df.orderBy("q_id", "rank").collect().toSeq ==
      flat.orderBy("q_id", "rank").collect().toSeq)
  }

  test("stored IVF: probe pruning is DPP on the centroid-partitioned scan") {
    val emb = Tables(spark, dir, "embeddings")
    val store = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_ivf_audit").getAbsolutePath
    val seeds = emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val unit = seeds.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    Similarity.writeIvfStore(emb, "vec_id", "embedding", unit, store)
    val df = Similarity.ivfTopKStored(spark.read.parquet(store),
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 3,
      coarse = unit, nprobe = 2)
    val p = plan(df)
    val storeScan = p.linesIterator.filter(l =>
      l.contains("FileScan") && l.contains("centroid_id")).toSeq
    assert(storeScan.nonEmpty, p)
    assert(storeScan.exists(_.contains("dynamicpruning")),
      s"stored-IVF scan not DPP-pruned:\n${storeScan.mkString("\n")}")
    // semantics, not just shape: the DPP-pruned stored path must return
    // EXACTLY the rows the flat in-query IVF computes with the same
    // codebook and probe count — a pruning bug that returned the right
    // COUNT of wrong rows would fail here
    val flat = Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3, unit, nprobe = 2)
    assert(df.orderBy("q_id", "rank").collect().toSeq ==
      flat.orderBy("q_id", "rank").collect().toSeq)
  }

  test("stored IVF-PQ: codes scan is DPP-pruned; rows identical to the flat path") {
    val emb = Tables(spark, dir, "embeddings")
    val seeds = emb.filter(col("vec_id") < 16).orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val unit = seeds.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val sub = unit.head.size / 8
    val codebooks = (0 until 8).map(s0 => unit.map(_.slice(s0 * sub, (s0 + 1) * sub)))
    val pqStore = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_pq_audit").getAbsolutePath
    val vsStore = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_pq_audit_vs").getAbsolutePath
    Similarity.writePqStore(emb, "vec_id", "embedding",
      coarse = unit.take(8), codebooks, pqStore)
    Similarity.writeVectorStore(emb, "vec_id", "embedding", vsStore, parts = 8)
    val df = Similarity.ivfPqTopKStored(spark.read.parquet(pqStore),
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 3,
      coarse = unit.take(8), codebooks,
      vectorStore = Similarity.readVectorStore(spark, vsStore),
      nprobe = 2, shortlist = 10)
    val p = plan(df)
    // BOTH stored scans prune dynamically: the codes store on its
    // centroid_id directories (probe pruning) and the vector store on
    // vs_part (re-rank fetch)
    val codesScan = p.linesIterator.filter(l =>
      l.contains("FileScan") && l.contains("pq_codes")).toSeq
    assert(codesScan.nonEmpty, p)
    assert(codesScan.exists(_.contains("dynamicpruning")),
      s"stored-PQ codes scan not DPP-pruned:\n${codesScan.mkString("\n")}")
    val vsScan = p.linesIterator.filter(l =>
      l.contains("FileScan") && l.contains("vs_part")).toSeq
    assert(vsScan.exists(_.contains("dynamicpruning")),
      s"re-rank store scan not DPP-pruned:\n${vsScan.mkString("\n")}")
    // row-identical to the flat path (per-run encode, array_contains
    // probing) — the ingest-time encode cannot drift from the query-time
    // encode because both run the same pqCodesExpr/assignCentroids kernels
    val flat = Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 3, coarse = unit.take(8), codebooks,
      nprobe = 2, shortlist = 10)
    assert(df.orderBy("q_id", "rank").collect().toSeq ==
      flat.orderBy("q_id", "rank").collect().toSeq)
  }

  test("brute-force ANN broadcasts the query side; corpus is never shuffled before the join") {
    val emb = Tables(spark, dir, "embeddings")
    val p = plan(Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", k = 3))
    assert(p.contains("BroadcastExchange"), p)
    // the only hash/range exchange is the per-query top-k window
    assert(exchanges(p) <= 1, p)
    // partial top-k pruning before the shuffle
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("decontamination broadcasts eval grams; the corpus side never pre-shuffles") {
    val docs = Tables(spark, dir, "documents")
    val p = plan(Dedup.decontaminate(
      docs.filter(col("doc_id") % 100 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 100 === 0), "text", n = 4))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    // exchanges: eval-side distinct + the per-doc hit count — the corpus
    // gram stream itself joins map-side (2 would become 3+ if the join
    // ever degraded to sort-merge)
    assert(exchanges(p) <= 2, p)
  }

  test("sequence packing shuffles once on shard, then one window per shard") {
    val docs = Tables(spark, dir, "documents")
    val p = plan(Splits.packSequences(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), budget = 512, shards = 8))
    assert(exchanges(p) == 1, p) // hashpartitioning(shard) only — no global sort
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q1 pushes the shipdate filter and prunes columns at the scan") {
    val p = plan(SparkEntry.queries("q1_pricing_summary")(spark, dir))
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
    // only the 7 referenced columns are read, not the full lineitem schema
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"), readSchema)
    // partial aggregation happens before the single exchange
    assert(p.contains("partial_sum"), p)
  }

  test("pivot: explicit values → no distinct pre-scan; map-side partial agg") {
    val p = plan(SparkEntry.queries("q_pivot_events")(spark, dir))
    // Spark pivots in two phases — groupBy(cohort, type) partial-agg'd
    // map-side (the 100 TB reducer), then a tiny pivotfirst reshape keyed
    // by cohort — plus the final sort: exactly 3 exchanges. The explicit
    // value list keeps a distinct-scan job from running before the plan.
    assert(exchanges(p) == 3, p)
    assert(p.contains("partial_sum") && p.contains("partial_pivotfirst"), p)
  }

  test("rollup computes all grouping levels from one Expand + one shuffle") {
    val p = plan(SparkEntry.queries("q_rollup_revenue")(spark, dir))
    assert(p.contains("Expand"), p)
    // nation+region broadcast; orders⋈customer is the only big join — a
    // per-level re-aggregation would add exchanges beyond: join shuffles
    // (≤2) + rollup agg (1) + final sort (1)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(exchanges(p) <= 4, p)
  }

  test("boilerplate: gram stream aggregates partial before both exchanges") {
    val docs = Tables(spark, dir, "documents")
    val p = plan(Dedup.boilerplate(docs, "doc_id", "text"))
    // two wide stages only: gram-frequency groupBy + per-doc score groupBy
    // (AQE may broadcast the common set; sort-merge fallback adds sorts,
    // not extra hash exchanges beyond the join's own)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("domain mixture touches the corpus once; totals broadcast back") {
    val docs = Tables(spark, dir, "documents")
    val p = plan(Splits.domainMixture(docs, "source",
      TextAnalysis.tokenCount(col("text")), budgetDocs = 10000L))
    // the per-domain rollup is checkpointed, so the final plan reads the
    // materialized rows — the corpus parquet never re-enters the DAG
    assert(!p.contains("FileScan"), p)
    // 1-row totals come back via broadcast cross joins (intended)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("exact dedup shuffles digests, not documents") {
    val docs = Tables(spark, dir, "documents")
    val p = plan(Dedup.exact(docs, "doc_id", "text"))
    // the text column is consumed map-side by the fingerprint; the exchange
    // carries only (fp, id) — text never appears after the first project
    val afterExchange = p.substring(0, p.indexOf("Exchange"))
    assert(afterExchange.contains("partial_min") || p.contains("partial_min"), p)
    assert(exchanges(p) == 1, p)
  }

  test("semi join pushes the date filter to the orders scan; no row duplication") {
    val p = plan(SparkEntry.queries("q_semi_join")(spark, dir))
    assert(p.contains("LeftSemi"), p)
    // the 1997 predicate reaches the parquet scan, not a post-join filter
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("line dedup: frequency pass partial-aggregates; no cartesian") {
    val docs = Tables(spark, dir, "documents")
    val p = plan(Dedup.lineDedupStats(docs, "doc_id", "text", minDocs = 20))
    // line-frequency groupBy collapses per-partition repeats map-side
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("portable minhash: ZERO exchanges; tokens projected OUTSIDE the window lambda") {
    val docs = Tables(spark, dir, "documents")
    val p = plan(Dedup.portableMinhash(docs, "doc_id", "text", k = 8))
    // the md5 slice-mins are computed per row by the compiled kernel —
    // no explode, no groupBy: the signature stage must be a pure scan
    assert(exchanges(p) == 0, p)
    assert(p.contains("portable_minhash"), p)
    // the regression this guards: if the tokenizer ever moves back inside
    // the transform() lambda, regex split re-runs per window index (27×
    // measured). The split must appear in a projection, where its output
    // feeds lambda element reads — i.e. exactly one `split(` site that is
    // NOT inside a lambdafunction(...) rendering
    val splitSites = "split\\(".r.findAllIn(p).size
    assert(splitSites >= 1, p)
    // per-LINE scan, not `[^)]*` (which cannot cross the first ')' of the
    // lambda rendering and so missed any split( nested past a closed call
    // like element_at(...)): a `split(` anywhere AFTER a `lambdafunction(`
    // on its plan line means the tokenizer leaked into a lambda body.
    // (portableTokens renders as filter(split(...), lambdafunction(...)) —
    // split BEFORE the lambda — so legit projections don't trip this.)
    val leaked = p.linesIterator.filter { l =>
      val lam = l.indexOf("lambdafunction(")
      lam >= 0 && l.indexOf("split(", lam) >= 0
    }.toSeq
    assert(leaked.isEmpty,
      s"tokenizer leaked into a lambda body:\n${leaked.mkString("\n")}")
  }

  test("duplicated-span stats: shuffles carry md5 keys, never raw grams") {
    val docs = Tables(spark, dir, "documents")
    val df = Dedup.duplicatedSpanStats(docs, "doc_id", "text")
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // every hash exchange partitions on gh (the md5) or the doc id — a
    // shuffle keyed on the raw gram text would show `sh` here
    val exchangeLines = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty, p)
    exchangeLines.foreach { l =>
      assert(l.contains("gh") || l.contains("doc_id"), s"shuffle not keyed on digest/id: $l")
    }
  }

  test("shard shuffle: one hash exchange on shard, no global sort, no single partition") {
    val docs = Tables(spark, dir, "documents")
    val p = plan(Splits.shuffleShards(docs, "doc_id", "epoch0", shards = 16))
    assert(exchanges(p) == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("Exchange rangepartitioning"), p) // windows are per-shard
  }

  test("global row numbering: one day-keyed exchange over events; no single-partition window touches them") {
    val df = SparkEntry.queries("q_global_rownum")(spark, dir)
    val p = plan(df)
    // the events-sized side is numbered under a hashpartitioning(day)
    // window; the only partitionless window runs over the ~30-row per-day
    // count table feeding the broadcast
    assert(p.contains("Exchange hashpartitioning(__day"), p)
    assert(p.contains("BroadcastExchange"), p)
    // ranks are the contiguous 1..n sequence in (ts, event_id) order
    val n = df.count()
    val mm = df.agg(min(col("grank")), max(col("grank")), count(lit(1))).collect()(0)
    assert(mm.getLong(0) == 1L && mm.getLong(1) == n && mm.getLong(2) == n)
  }
  test("gap-fill and sweep-line windows are key-partitioned; never single-partition") {
    for (q <- Seq("q_gap_fill", "q_max_concurrency")) {
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(p.contains("Exchange hashpartitioning"), s"$q\n$p")
      assert(!p.contains("Exchange SinglePartition,"), s"$q\n$p")
    }
  }

  test("distributed NTILE: metric windows run under the coarse prefix; rank sum is exact") {
    val p = plan(SparkEntry.queries("q_rfm_segments")(spark, dir))
    // every customer-sized window hashes on __pfx; the only partitionless
    // window is each metric's tiny per-prefix offsets table (broadcast)
    assert(p.contains("Exchange hashpartitioning(__pfx"), p)
    assert(p.contains("BroadcastExchange"), p)
    // every customer lands in exactly one (r,f,m) cell
    val nCust = Tables(spark, dir, "orders")
      .select(col("o_custkey")).distinct().count()
    val total = SparkEntry.queries("q_rfm_segments")(spark, dir)
      .agg(sum(col("n_customers"))).collect()(0).getLong(0)
    assert(total == nCust)
  }

  test("frequent pairs: no cartesian product; the only nested-loop join is the 1-row totals") {
    val p = plan(SparkEntry.queries("q_freq_pairs")(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    // crossJoin(broadcast(n_baskets)) — the documented benign 1-row
    // totals pattern (d_tfidf_terms etc.); nothing else may nest
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1, p)
  }

  test("z-order box query pushes the z ranges into the store scan") {
    val df = SparkEntry.queries("q_zorder_box")(spark, dir)
    val p = plan(df)
    // the OR-of-BETWEENs on zkey must reach the parquet reader (row-group
    // min/max pruning happens below this line), and the scan must read
    // the zkey column — a plan that filters post-scan would show empty
    // PushedFilters
    assert(p.contains("PushedFilters") && p.contains("zkey"), p)
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("zkey"), pushed)
  }

  test("filtered ANN: the label predicate is pushed into the DPP-pruned store scan") {
    val p = plan(SparkEntry.queries("s_ann_filtered")(spark, dir))
    val storeScans = p.linesIterator.filter(l =>
      l.contains("FileScan") && l.contains("ivfmetastore")).toList
    assert(storeScans.nonEmpty, p)
    // pre-filter lands in the parquet scan (PushedFilters on label) AND
    // composes with centroid-directory probe pruning (dynamicpruning on
    // the partition column)
    assert(storeScans.exists(l => l.contains("PushedFilters") &&
      l.contains("label")), p)
    assert(storeScans.exists(_.contains("dynamicpruning")), p)
  }

}

/** Row-level invariants tying the relational query surface together. */
class JoinOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("semi and anti joins partition the customer table exactly") {
    val semi = SparkEntry.queries("q_semi_join")(spark, dir).count()
    val anti = SparkEntry.queries("q_anti_join")(spark, dir).count()
    val all = Tables(spark, dir, "customer").count()
    assert(semi > 0 && anti > 0, s"degenerate split: semi=$semi anti=$anti")
    assert(semi + anti == all, s"semi=$semi + anti=$anti != customers=$all")
  }

  test("unpivot emits one long row per (group, measure)") {
    val out = SparkEntry.queries("q_unpivot")(spark, dir)
    val flags = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag")).distinct().count()
    assert(out.count() == flags * 3)
    assert(out.columns.toSeq == Seq("l_returnflag", "measure", "val"))
  }

}
