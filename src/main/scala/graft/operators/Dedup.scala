package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Exact dedup is a hash-groupBy: the md5 fingerprint is computed map-side,
  * so the shuffle carries (digest, id) pairs only — at 100 TB the shuffle
  * volume is ~50 bytes/doc regardless of document size.
  *
  * Near-dup follows the standard MinHash + LSH banding pipeline:
  * shingle → k minhashes → b bands → band-hash bucket groupBy →
  * in-bucket pair expansion → exact Jaccard verification on candidates
  * only. Pair expansion happens INSIDE the bucket group (collect_set +
  * higher-order-function combinations), so there is no self-join at all —
  * one shuffle keyed by band hash, and bucket blowup is capped by
  * `maxBucketSize` (boilerplate buckets are dropped, the standard
  * large-corpus practice).
  */
object Dedup {

  /** Exact dedup: lowest-id row per canonical fingerprint. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(TextAnalysis.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Incremental dedup: drop new-batch docs whose canonical fingerprint
    * already exists in the corpus — the steady-state ingest path (the full
    * corpus is never rescanned; only its fingerprint column, which at
    * 100 TB lives as its own parquet/bucketed table of ~50 B rows, joins
    * against the batch). Anti-join on the map-side fingerprint; also drops
    * in-batch duplicates (keep lowest id) so the surviving set is clean.
    */
  def incremental(newDocs: DataFrame, knownFingerprints: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    val fp = newDocs.select(col(idCol), col(textCol),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col(idCol))
    fp.join(knownFingerprints.select(col("fp")), Seq("fp"), "left_anti")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("fp"))
  }

  /** Word n-gram shingles of a text column — the codegen'd
    * [[graft.functions.WordShingles]] kernel (one pass: tokenize + window +
    * join; ~10× the interpreted higher-order-function chain).
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.WordShingles(text, n)

  /** k MinHash values per row via the codegen'd
    * [[graft.functions.MinHashSignature]] kernel (xxhash64 double-hashing,
    * one pass over the shingle set). Emits `id, signature: array<long>`.
    * Rows with no shingles are dropped (they cannot collide meaningfully).
    *
    * Entirely map-side — NO shuffle, versus the explode + k-way groupBy
    * formulation which shuffles |docs|·|shingles| rows. At 100 TB the
    * signature stage is a pure scan; the only shuffle in the LSH pipeline
    * is the band-hash bucket groupBy (k longs per doc).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 64, shingleLen: Int = 3): DataFrame =
    df.select(col(idCol).as("id"),
        array_distinct(shingles(col(textCol), shingleLen)).as("ss"))
      .filter(size(col("ss")) > 0)
      .select(col("id"),
        graft.functions.MinHashSignature(col("ss"), k).as("signature"))

  /** LSH banding: one (band_id, band_hash) bucket key per band. */
  def lshBuckets(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val r = k / bands
    val bandHashes = array((0 until bands).map { b =>
      xxhash64(lit(b), slice(col("signature"), b * r + 1, r))
    }: _*)
    sigs.select(col("id"), posexplode(bandHashes).as(Seq("band_id", "band_hash")))
  }

  /** Candidate pairs (a < b) from LSH buckets, expanded inside the bucket
    * group — no self-join. Buckets larger than `maxBucketSize` are dropped
    * (degenerate boilerplate).
    */
  def candidatePairs(buckets: DataFrame, maxBucketSize: Int = 1000): DataFrame = {
    val grouped = buckets
      .groupBy(col("band_id"), col("band_hash"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucketSize)
    grouped
      .select(explode(ArrayPairs.pairStructs(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** Exact Jaccard over the shingle sets of candidate pairs only.
    *
    * Shape (the round-10 two-join tail, measured on the calibration
    * audit): each side is a plain equi-join of the pair frame against the
    * corpus with the shingle set projected AFTER the join — sets are
    * built ONLY for join survivors (candidates), corpus text never
    * shuffles, and no checkpoint/candidate-id barrier exists (the
    * round-9 semi-join-first spelling cost 3 extra jobs of pure
    * scheduling on KB-sized frames). AQE broadcasts the pair frame at
    * runtime when it is small (any banded candidate set); a pathological
    * pair set degrades to a shuffle join instead of an OOM.
    */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, shingleLen: Int = 3,
                    threshold: Double = 0.8): DataFrame = {
    val txt = docs.select(col(idCol).as("__vid"), col(textCol).as("__vtext"))
    val withA = txt.join(pairs, col("__vid") === col("a"))
      .select(col("a"), col("b"),
        array_distinct(shingles(col("__vtext"), shingleLen)).as("sa"))
    txt.join(withA, col("__vid") === col("b"))
      .withColumn("sb", array_distinct(shingles(col("__vtext"), shingleLen)))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("uni", size(array_union(col("sa"), col("sb"))))
      .withColumn("jaccard", when(col("uni") === 0, lit(0.0))
        .otherwise(col("inter").cast("double") / col("uni")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Containment verification over candidate pairs — the ASYMMETRIC
    * cousin of [[verifyJaccard]] for subset-duplicates: a short doc
    * quoted whole inside a long one has low Jaccard (the union is big)
    * but containment |A∩B|/|A| ≈ 1, which is why large-scale dedup
    * recipes check containment alongside symmetric overlap. Emits both
    * directions (c_ab = overlap/|A|, c_ba = overlap/|B|), keeps pairs
    * where either reaches `threshold` (raw IEEE compare, like
    * [[verifyJaccard]]'s — rounding only in the output columns). Same
    * candidates-only scale shape: shingle sets are built for pair
    * members alone. Caveat carried from LSH: banding recalls JACCARD
    * neighbors, so extreme containment-only pairs (tiny A in huge B)
    * need a containment-aware blocker upstream; with a shared-band
    * candidate set this is the verify stage, not the finder.
    */
  def verifyContainment(pairs: DataFrame, docs: DataFrame, idCol: String,
                        textCol: String, shingleLen: Int = 3,
                        threshold: Double = 0.8): DataFrame = {
    // same two-join candidates-only tail as [[verifyJaccard]]
    val txt = docs.select(col(idCol).as("__vid"), col(textCol).as("__vtext"))
    val withA = txt.join(pairs, col("__vid") === col("a"))
      .select(col("a"), col("b"),
        array_distinct(shingles(col("__vtext"), shingleLen)).as("sa"))
    txt.join(withA, col("__vid") === col("b"))
      .withColumn("sb", array_distinct(shingles(col("__vtext"), shingleLen)))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .withColumn("ca", col("inter") / size(col("sa")))
      .withColumn("cb", col("inter") / size(col("sb")))
      .filter(col("ca") >= threshold || col("cb") >= threshold)
      .select(col("a"), col("b"),
        round(col("ca"), 4).as("c_ab"), round(col("cb"), 4).as("c_ba"))
  }

  /** Full MinHash-LSH near-dup pipeline → (a, b, jaccard) above threshold. */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 64, bands: Int = 16, shingleLen: Int = 3,
                 threshold: Double = 0.8): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, k, shingleLen)
    // the two-join verify consumes the pair set ONCE (as the build side of
    // the first join), so no checkpoint is needed — the signature pipeline
    // runs exactly once inside the single plan
    val pairs = candidatePairs(lshBuckets(sigs, k, bands))
    verifyJaccard(pairs, df, idCol, textCol, shingleLen, threshold)
  }

  /** Connected components over an undirected pair set (`a`, `b` columns) —
    * the clustering step that turns near-dup PAIRS into dedup GROUPS (every
    * doc labeled with the smallest id reachable through any chain of
    * near-dup relations; transitivity is exactly what pairwise output
    * lacks).
    *
    * Iterative min-label propagation: each round every node takes the min
    * of its own label and its neighbors' labels — one join + one groupBy
    * per round, `localCheckpoint` per round to keep lineage flat, stop on
    * fixpoint (or `maxIter`). Pointer jumping contracts chains in
    * O(log diameter) rounds; for adversarial graphs at 100 TB where even
    * that is too many label-table joins, use
    * [[connectedComponentsLargeSmallStar]] (edge-set contraction,
    * diameter-independent O(log² n) rounds).
    *
    * Returns (id, cluster_id) for every id appearing in a pair; singleton
    * docs never enter a pair and keep themselves by definition.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val (labels, _, converged) = connectedComponentsWithStats(pairs, maxIter)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not reach a fixpoint within maxIter=$maxIter " +
          "rounds — labels would be WRONG (docs mis-clustered, dedup would drop " +
          "the wrong documents). Raise maxIter; pointer jumping needs only " +
          "O(log diameter) rounds, so a graph that exhausts 20 is adversarial.")
    labels
  }

  /** [[connectedComponents]] plus (rounds used, converged) — the loud
    * variant: callers that want to proceed on a non-fixpoint exit must
    * check the flag explicitly instead of silently consuming wrong labels.
    */
  def connectedComponentsWithStats(pairs: DataFrame,
                                   maxIter: Int = 20): (DataFrame, Int, Boolean) = {
    val edges = pairs.select(col("a").as("x"), col("b").as("y"))
      .union(pairs.select(col("b").as("x"), col("a").as("y")))
      .localCheckpoint()
    // seed = least(self, min neighbor): the first propagation round for free
    var labels = edges.groupBy(col("x").as("id"))
      .agg(min(col("y")).as("m"))
      .select(col("id"), least(col("id"), col("m")).as("cluster_id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges.join(labels, edges("y") === labels("id"))
        .groupBy(col("x")).agg(min(col("cluster_id")).as("nbr_min"))
      val l1 = labels.join(nbrMin, col("id") === col("x"), "left")
        .select(col("id"), col("cluster_id").as("prev"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("l1"))
      // pointer jump (path halving): follow the label's own label so chains
      // contract in O(log diameter) rounds instead of O(diameter)
      val jump = l1.select(col("id").as("jid"), col("l1").as("l2"))
      val updated = l1.join(jump, l1("l1") === jump("jid"), "left")
        .select(col("id"), col("prev"),
          coalesce(col("l2"), col("l1")).as("cluster_id"))
        .localCheckpoint()
      // prev rode along, so convergence reads the checkpoint — no join
      val changed = updated
        .filter(col("cluster_id") =!= col("prev")).limit(1).count()
      labels = updated.select(col("id"), col("cluster_id"))
      converged = changed == 0L
      i += 1
    }
    (labels, i, converged)
  }

  /** One-call fuzzy dedup: MinHash-LSH candidates → exact-Jaccard verify
    * (inside [[minhashLsh]]) → connected components → keep the best-scoring
    * member per cluster. Returns the KEPT rows of `df` (winners plus all
    * docs that never entered a near-dup pair) — i.e. the deduplicated
    * corpus, ready to write.
    *
    * `ccAlgorithm`: "minlabel" (pointer-jumping label propagation — the
    * default; rounds ~ O(log diameter)) or "largestar" (large-star/
    * small-star edge contraction — diameter-independent, for adversarial
    * duplicate chains). Both are loud on non-convergence and produce
    * identical labels ([[graft]] DedupSpec pins them to a union-find
    * model).
    *
    * `scoreCol` picks the cluster representative (highest wins, ties to
    * smallest id); defaults to token count — keep the longest version of a
    * duplicated document.
    */
  def fuzzyDedup(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 64, bands: Int = 16, shingleLen: Int = 3,
                 threshold: Double = 0.8,
                 scoreCol: Option[Column] = None,
                 ccAlgorithm: String = "minlabel"): DataFrame = {
    // validate BEFORE the LSH stage runs — minhashLsh eagerly materializes
    // the candidate pairs (localCheckpoint), which at scale is the bulk of
    // the pipeline's cost; a typo'd algorithm name must fail in ms
    require(ccAlgorithm == "minlabel" || ccAlgorithm == "largestar",
      s"unknown ccAlgorithm '$ccAlgorithm' (minlabel | largestar)")
    val pairs = minhashLsh(df, idCol, textCol, k, bands, shingleLen, threshold)
      .select(col("a"), col("b"))
    val clusters =
      if (ccAlgorithm == "minlabel") connectedComponents(pairs)
      else connectedComponentsLargeSmallStar(pairs)
    val score = scoreCol.getOrElse(TextAnalysis.tokenCount(col(textCol)))
    // score only the clustered docs (a sliver of the corpus) — same
    // semi-join-first rule as verifyJaccard: never tokenize 100 TB to pick
    // winners among the few docs that actually entered a cluster
    val quality = df
      .join(clusters.select(col("id").as("__cid")), df(idCol) === col("__cid"), "left_semi")
      .select(col(idCol).as("id"), score.as("__score"))
    val keepers = keepBest(clusters, quality, "__score")
      .select(col("keep_id").as("__keep"))
    // kept = winners ∪ never-paired docs = df minus (paired docs that lost)
    val losers = clusters.join(keepers, clusters("id") === keepers("__keep"), "left_anti")
      .select(col("id").as("__lose"))
    df.join(losers, df(idCol) === col("__lose"), "left_anti")
  }

  /** Eval-set decontamination: find training documents sharing any word
    * n-gram with a benchmark/eval document — the standard guard against
    * test-set leakage into LLM training data (n-gram overlap flagging, à
    * la the 8-gram checks in public LM training reports). Returns
    * (id, hits) where hits = how many of the doc's DISTINCT n-grams occur
    * anywhere in the eval set; callers anti-join flagged ids to drop, or
    * threshold on hits.
    *
    * Scale shape: both sides shingle map-side (codegen'd
    * [[graft.functions.WordShingles]]); the eval side — benchmarks are
    * thousands of docs, the training corpus is the 100 TB side — collapses
    * to a distinct gram set that BROADCASTS, so training grams are
    * filtered in the scan stage and only matching (doc, gram) rows reach
    * the per-doc count. No shuffle of the corpus, no join explosion
    * (grams are distinct per side).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    evalDocs: DataFrame, evalTextCol: String,
                    n: Int = 8): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(array_distinct(shingles(col(evalTextCol), n))).as("gram"))
      .distinct()
    docs.select(col(idCol), explode(array_distinct(shingles(col(textCol), n))).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol)).agg(count(lit(1)).as("hits"))
  }

  /** The EVAL-side contamination audit — [[decontaminate]] reports which
    * TRAINING docs to drop; this reports which BENCHMARK ITEMS are
    * burned: per eval doc, how many distinct corpus docs share an n-gram
    * with it and the total overlapping-gram incidence. Zero rows are
    * kept (a benchmark audit needs "clean" confirmed, not just leaks
    * listed). Same scale shape as the gate: eval grams broadcast with
    * their ids, the corpus side explodes map-side and never shuffles
    * text; the rollup groups by eval id (bounded by the benchmark size,
    * so even countDistinct's two-phase agg is tiny).
    */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
                          evalDocs: DataFrame, evalIdCol: String,
                          evalTextCol: String, n: Int = 8): DataFrame = {
    val evalGrams = evalDocs.select(col(evalIdCol).as("eval_id"),
      explode(array_distinct(shingles(col(evalTextCol), n))).as("gram"))
    val hits = docs
      .select(col(idCol), explode(array_distinct(shingles(col(textCol), n))).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("eval_id"))
      .agg(countDistinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_hits"))
    evalDocs.select(col(evalIdCol).as("eval_id"))
      .join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** Bloom-filter decontamination — the scale path for when even the eval
    * side outgrows an exact broadcast set (a multi-GB benchmark suite's
    * distinct 8-grams): build a Bloom filter over the eval grams with
    * `DataFrame.stat.bloomFilter` (a distributed aggregate — the sketch is
    * built executor-side and merged), broadcast the fixed-size filter, and
    * count might-contain grams per corpus doc ENTIRELY map-side — no
    * explode, no join, no shuffle of the 100 TB side at all (the exact
    * [[decontaminate]] still shuffles matching (doc, gram) rows to a
    * per-doc count).
    *
    * One-sided error, the direction that matters: NO false negatives —
    * every document sharing a real n-gram with the eval set is flagged
    * (DedupSpec pins flagged ⊇ exact-flagged); `fpp` only over-flags,
    * trading a sliver of clean data for leakage safety. `hits` here counts
    * might-contain grams (≥ the exact overlap count). The membership
    * lambda is a justified UDF: the filter lives in a broadcast variable,
    * unreachable from column expressions.
    *
    * Returns (idCol, hits) for flagged docs, like [[decontaminate]].
    */
  def decontaminateBloom(docs: DataFrame, idCol: String, textCol: String,
                         evalDocs: DataFrame, evalTextCol: String,
                         n: Int = 8, expectedGrams: Long = 10000000L,
                         fpp: Double = 0.01): DataFrame = {
    val bf = evalDocs
      .select(explode(array_distinct(shingles(col(evalTextCol), n))).as("gram"))
      .stat.bloomFilter("gram", expectedGrams, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bf)
    val bloomHits = udf((gs: Seq[String]) =>
      if (gs == null) 0 else gs.count(bc.value.mightContainString))
    docs
      .select(col(idCol),
        bloomHits(array_distinct(shingles(col(textCol), n))).as("hits"))
      .filter(col("hits") > 0)
  }

  /** Bloom-prefiltered EXACT decontamination — the production composition
    * of the two paths above: the Bloom filter trims each corpus doc's gram
    * array map-side (no false negatives, so no real overlap is lost), and
    * only the surviving sliver of (doc, candidate-gram) rows is exploded
    * and verified against the exact eval gram set. Output is therefore
    * identical to [[decontaminate]] — Bloom false positives die in the
    * verify join — which makes this variant DuckDB-oracle-checkable while
    * keeping the 100 TB-side economics of the Bloom path: the full corpus
    * gram explosion (~n× the corpus bytes) never materializes, only
    * bloom-positive grams leave the scan stage.
    *
    * The verify join is deliberately unhinted: the eval gram set
    * broadcasts when it fits and AQE falls back to a shuffled join (of
    * the already-tiny candidate stream) when it doesn't — the case where
    * Bloom was needed in the first place.
    */
  def decontaminateBloomVerified(docs: DataFrame, idCol: String, textCol: String,
                                 evalDocs: DataFrame, evalTextCol: String,
                                 n: Int = 8, expectedGrams: Long = 10000000L,
                                 fpp: Double = 0.01): DataFrame = {
    val evalGramFrame = evalDocs
      .select(explode(array_distinct(shingles(col(evalTextCol), n))).as("gram"))
    val bf = evalGramFrame.stat.bloomFilter("gram", expectedGrams, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bf)
    val bloomKeep = udf((gs: Seq[String]) =>
      if (gs == null) Seq.empty[String] else gs.filter(bc.value.mightContainString))
    docs
      .select(col(idCol),
        bloomKeep(array_distinct(shingles(col(textCol), n))).as("cand"))
      .filter(size(col("cand")) > 0)
      .select(col(idCol), explode(col("cand")).as("gram"))
      .join(evalGramFrame.distinct(), "gram")
      .groupBy(col(idCol)).agg(count(lit(1)).as("hits"))
  }

  /** Cross-corpus boilerplate n-gram scoring — the C4-style pattern: word
    * n-grams recurring across many DISTINCT documents are template text
    * (headers, footers, licence blurbs), not content. Pass 1 computes each
    * n-gram's document frequency (grams are distinct within a doc, so one
    * `count(*)` groupBy IS the doc frequency); pass 2 re-shingles and
    * scores every doc by the fraction of its distinct n-grams that are
    * corpus-common. Callers threshold `boilerplate_frac` to drop template
    * pages, or anti-join the common-gram set to strip the text itself.
    *
    * Scale shape: shingling is the map-side codegen'd
    * [[graft.functions.WordShingles]] kernel in BOTH passes — recomputing
    * it beats materializing the full (id, gram) explosion, which at
    * 100 TB is ~30× the corpus. The wide ops are the gram-frequency
    * groupBy (partial aggregation collapses per-partition repeats before
    * the exchange) and the per-doc score groupBy keyed by id. The
    * common-set join back is left to Catalyst: broadcast when it fits
    * (AQE sizes it at runtime), else a shuffled join on gram — the
    * standard C4 two-pass shape — with Spark's runtime Bloom-filter
    * injection pruning the gram stream map-side. At 100 TB raise
    * `minDocs` with corpus size (an absolute doc-frequency threshold at
    * fixed recall shrinks the common set as the corpus grows; df >= 5 is
    * a small-corpus setting) so the common set stays far below the gram
    * stream.
    *
    * Returns (id, n_grams, n_common, boilerplate_frac).
    */
  def boilerplate(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, minDocs: Long = 5): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
      explode(array_distinct(shingles(col(textCol), n))).as("gram"))
    val common = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("gram"), lit(1).as("hit"))
    grams.join(common, Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_common"))
      .withColumn("boilerplate_frac",
        round(col("n_common").cast("double") / col("n_grams"), 4))
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14 — a public MapReduce-era algorithm) — the
    * adversarial-diameter alternative to [[connectedComponents]]'s
    * min-label propagation. Each round rewrites the EDGE set itself (no
    * separate label table): large-star hangs every strictly-larger
    * neighbor off the neighborhood minimum, small-star re-roots each
    * node's smaller neighbors the same way; long chains contract
    * geometrically, converging in O(log² n) rounds regardless of
    * diameter, and the fixpoint is a forest of stars rooted at each
    * component's minimum id.
    *
    * Per round: two groupBy+join passes over edges, `localCheckpoint` to
    * keep lineage flat, convergence = edge-set signature (count +
    * bit_xor(xxhash64)) unchanged. Same contract as
    * [[connectedComponents]]: (a, b) pairs in, (id, cluster_id =
    * component-min id) out, loud on non-fixpoint exit.
    */
  def connectedComponentsLargeSmallStar(pairs: DataFrame,
                                        maxIter: Int = 30): DataFrame = {
    var edges = pairs.select(least(col("a"), col("b")).as("x"),
        greatest(col("a"), col("b")).as("y"))
      .filter(col("x") =!= col("y")).distinct().localCheckpoint()
    val nodes = pairs.select(col("a").as("id"))
      .union(pairs.select(col("b").as("id"))).distinct().localCheckpoint()

    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(x, y))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // large-star: for each u, m = min(Γ(u) ∪ {u}); edges (v, m) ∀ v∈Γ(u), v>u
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("x").as("u"), col("y").as("v"))
        .union(e.select(col("y").as("u"), col("x").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      sym.join(mins, "u").filter(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("x"),
          greatest(col("v"), col("m")).as("y"))
        .filter(col("x") =!= col("y")).distinct()
    }
    // small-star: key by the LARGER endpoint u (edges are canonical x<y);
    // m = min(Γ⁻(u)); edges (v, m) ∀ v∈Γ⁻(u)\{m}, plus (u, m)
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("y").as("u")).agg(min(col("x")).as("m"))
      e.join(mins, e("y") === mins("u"))
        .select(least(col("x"), col("m")).as("x"),
          greatest(col("x"), col("m")).as("y"))
        .filter(col("x") =!= col("y"))
        .union(mins.select(col("m").as("x"), col("u").as("y")))
        .distinct()
    }

    var (prevN, prevH) = signature(edges)
    var converged = edges.isEmpty
    var i = 0
    while (!converged && i < maxIter) {
      edges = smallStar(largeStar(edges)).localCheckpoint()
      val (n, h) = signature(edges)
      converged = n == prevN && h == prevH
      prevN = n; prevH = h
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"large-star/small-star did not reach a fixpoint within maxIter=$maxIter " +
          "rounds — labels would be WRONG. The bound is O(log² n) rounds; raise maxIter.")
    // fixpoint = stars rooted at component minima: every non-root appears
    // as y with its root as x; roots (and any node that never entered an
    // edge) label themselves
    val roots = edges.groupBy(col("y").as("rid")).agg(min(col("x")).as("root"))
    nodes.join(roots, nodes("id") === roots("rid"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster_id"))
  }

  /** Line-level exact dedup (the C4 cleaning rule): a LINE occurring in at
    * least `minDocs` distinct documents is boilerplate (navigation chrome,
    * cookie banners, licence footers) and is dropped from every document;
    * unique-enough lines survive. Returns per-document stats
    * (id, n_lines, n_kept, kept_chars) — callers re-assemble cleaned text
    * with [[lineDedup]]'s kept-lines frame when they need the text itself.
    *
    * Scale shape: explode is map-side; the line-frequency groupBy partial-
    * aggregates per-partition repeats before its exchange (same shape as
    * [[boilerplate]]'s gram pass). The common set after `HAVING >= minDocs`
    * is tiny relative to the corpus — AQE broadcasts it, so the second
    * pass over the lines never shuffles; the per-doc rollup is one hash
    * exchange keyed by id. Raise `minDocs` with corpus size, exactly like
    * [[boilerplate]]'s `minDocs`.
    */
  def lineDedupStats(df: DataFrame, idCol: String, textCol: String,
                     minDocs: Long): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      explode(split(col(textCol), "\n")).as("line"))
    // doc frequency over DISTINCT (doc, line): a line repeated inside one
    // document counts once
    val common = lines.distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("line"), lit(1).as("hit"))
    lines.join(common, Seq("line"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        (count(lit(1)) - count(col("hit"))).as("n_kept"),
        sum(when(col("hit").isNull, length(col("line"))).otherwise(lit(0)))
          .cast("bigint").as("kept_chars"))
  }

  /** The line-dedup TRANSFORM — [[lineDedupStats]] reports, this
    * rewrites: every line occurring in >= `minDocs` distinct documents
    * is dropped from every document, original line order preserved, and
    * documents left empty disappear (C4's actual boilerplate-removal
    * step, not just its audit). Same two-shuffle shape as the stats op
    * (distinct (doc, line) → doc-frequency groupBy; tiny common set
    * joins back, AQE-broadcast); the rebuild is one per-doc
    * collect_list sorted by position — lines of one doc, never the
    * corpus.
    */
  /** The frozen boilerplate set on its own: lines occurring in >=
    * `minDocs` distinct documents. [[lineDedupRewrite]] derives it
    * inline; the standalone form is what a production pipeline freezes
    * after a corpus pass so later batches (or a stream —
    * [[graft.streaming.EventStream.streamingLineClean]]) rewrite against
    * it with no frequency pass.
    */
  def commonLines(df: DataFrame, idCol: String, textCol: String,
                  minDocs: Long): DataFrame =
    df.select(col(idCol).as("id"),
        explode(split(col(textCol), "\n")).as("line"))
      .distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("line"))

  def lineDedupRewrite(df: DataFrame, idCol: String, textCol: String,
                       minDocs: Long): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val common = commonLines(df, idCol, textCol, minDocs)
      .withColumn("hit", lit(1))
    lines.join(common, Seq("line"), "left")
      .filter(col("hit").isNull)
      .groupBy(col("id"))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("clean_text"))
      .filter(length(col("clean_text")) > 0)
      .select(col("id").as(idCol), col("clean_text"))
  }

  /** Canonical selection: given cluster labels (id, cluster_id) and a
    * per-id score, keep the best-scoring member of every cluster (ties
    * break to the smallest id — deterministic). The final step of fuzzy
    * dedup: clusters → one kept representative each, everything else
    * dropped. One windowed top-1 per cluster; `WindowGroupLimit` prunes
    * map-side before the shuffle.
    */
  def keepBest(labels: DataFrame, scores: DataFrame, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(desc(scoreCol), asc("id"))
    labels.join(scores, Seq("id"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("cluster_id"), col("id").as("keep_id"), col(scoreCol))
  }

  /** 64-bit SimHash per document via the codegen'd
    * [[graft.functions.SimHash64]] kernel: each token's xxhash64 casts ±1
    * votes on all 64 bit positions, signs assemble the hash — one map-side
    * pass, NO shuffle (the relational explode + double-groupBy version
    * materialized 64·|tokens| vote rows per doc and shuffled twice).
    * Docs with no tokens are dropped, matching the explode semantics.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        graft.functions.WordShingles(col(textCol), 1).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("id"), graft.functions.SimHash64(col("toks")).as("simhash"))

  /** Hamming distance between two simhash values (for near-dup banding on
    * the 64-bit hash).
    */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64-bit hash into four 16-bit chunks
    * (pigeonhole: any pair within hamming distance 3 shares at least one
    * exact band), bucket by (band index, band value), expand in-bucket
    * candidate pairs, verify exact hamming ≤ `maxHamming`. Same shuffle
    * shape as MinHash-LSH: hashes are map-side, ONE groupBy keyed by band,
    * pair expansion inside the bucket, dedup across bands at the end.
    */
  def simhashNearDup(df: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame =
    bandedHammingPairs(simhash(df, idCol, textCol), "id", "simhash",
      maxHamming, maxBucketSize)

  /** Hamming-banded near-dup pairs over ANY 64-bit hash column — the
    * banding core shared by text SimHash ([[simhashNearDup]]) and image
    * perceptual hashes ([[graft.multimodal.Multimodal.dHash64]]): band the
    * hash into four 16-bit chunks (pigeonhole: any pair within hamming
    * distance 3 shares at least one exact band), bucket by (band index,
    * band value), expand in-bucket candidate pairs, verify exact
    * hamming ≤ `maxHamming`. Same shuffle shape as MinHash-LSH: hashes
    * are map-side, ONE groupBy keyed by band, pair expansion inside the
    * bucket, dedup across bands at the end.
    *
    * `maxBucketSize` is the scale guard: a hot (band_id, band_val) key —
    * e.g. the all-zero band that every flat/black image hashes to — makes
    * the in-bucket expansion k²/2 pairs, so production keeps the cap on.
    * Dropping a bucket loses recall for pairs whose ONLY shared band is
    * the dropped one (capped pairs ⊆ uncapped pairs — DedupSpec pins the
    * subset), so pass `dropAudit` to make a binding cap loud: an
    * `observe` metric rides the same action (zero extra jobs) and after
    * any action `dropAudit.get` has `dropped_buckets` (buckets over the
    * cap) and `max_bucket_size` (the [[UsageStats.coOccurrence]]
    * `dropped_groups` contract).
    */
  def bandedHammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
                         maxHamming: Int = 3,
                         maxBucketSize: Int = 1000,
                         dropAudit: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole only guarantees recall for hamming <= 3")
    val bands = hashes.select(col(idCol).as("id"), col(hashCol).as("__h"),
      posexplode(array((0 until 4).map { b =>
        shiftrightunsigned(col(hashCol), b * 16).bitwiseAND(lit(0xFFFFL))
      }: _*)).as(Seq("band_id", "band_val")))
    val grouped = bands
      .groupBy(col("band_id"), col("band_val"))
      .agg(sort_array(collect_set(struct(col("id"), col("__h")))).as("ms"))
    val audited = dropAudit.fold(grouped)(obs => grouped.observe(obs,
      sum(when(size(col("ms")) > maxBucketSize, 1L).otherwise(0L))
        .as("dropped_buckets"),
      max(size(col("ms"))).as("max_bucket_size")))
    val buckets = audited
      .filter(size(col("ms")).between(2, maxBucketSize))
    buckets
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(slice(col("ms"), i + 2, size(col("ms"))),
          y => struct(x.getField("id").as("a"), y.getField("id").as("b"),
            bit_count(x.getField("__h").bitwiseXOR(y.getField("__h")))
              .as("hamming")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---------------------------------------------------------------------
  // Engine-portable near-dup kernels (md5-based, SQL-expressible)
  //
  // The production minhash/simhash path hashes with the codegen'd xxhash64
  // kernels above — fastest, but no other engine reproduces the buckets,
  // so those stages grade rows-only. The `portable*` variants express the
  // SAME algorithms over md5: every engine's md5 hex agrees bit-for-bit
  // and binary-collation MIN over lowercase hex strings is deterministic,
  // so signatures, band buckets, and candidate pairs are reproducible in
  // DuckDB/Trino/any SQL engine — the cross-engine audit path that lets
  // the dedup pipeline be oracle-checked end to end.
  // ---------------------------------------------------------------------

  /** All positional 3-word shingle windows over an ALREADY-MATERIALIZED
    * token-array column (lowercase `\s+` tokens; repeats kept).
    *
    * Takes the token column, not the text: Catalyst substitutes whatever
    * expression you pass into the `transform` lambda body, so handing the
    * tokenizer itself here re-evaluates regex split + filter once PER
    * WINDOW INDEX — measured 27× slower at sf0.1 (11 s vs 0.4 s for the
    * same 260k windows). Callers project the tokens first
    * ([[portableTokens]]) so the lambda only does O(1) element reads.
    */
  def portableShingleWindows(tk: Column): Column =
    // guard: Spark's sequence(1, n) runs DESCENDING for n < 1, so a short
    // doc must yield an empty set explicitly (DuckDB's range(1, n) is
    // simply empty there)
    when(size(tk) >= 3,
        transform(sequence(lit(1), size(tk) - 2), i =>
          concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
            element_at(tk, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Portable tokenization: lowercase, `\s+` split, empties dropped —
    * matches `regexp_split_to_array(lower(trim(x)), '\s+')` + filter in
    * any SQL engine. */
  def portableTokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), x => length(x) > 0)

  /** Exploded per-doc shingle stream `(idCol, sh)` — the shared front end
    * of every portable kernel. Tokens are materialized in their own
    * projection BEFORE the window lambda (see [[portableShingleWindows]]
    * for why), and per-doc dedup happens map-side via `array_distinct`,
    * not a (shuffling) `.distinct()`.
    */
  private def portableShingleStream(df: DataFrame, idCol: String,
                                    textCol: String,
                                    distinctPerDoc: Boolean): DataFrame = {
    val win = portableShingleWindows(col("tk"))
    df.select(col(idCol), portableTokens(col(textCol)).as("tk"))
      .select(col(idCol),
        explode(if (distinctPerDoc) array_distinct(win) else win).as("sh"))
  }

  /** k engine-portable MinHash signatures: the 32 hex chars of
    * `md5("<j>:<shingle>")` split into four independent 32-bit hashes
    * (md5 bits are uniform and independent, so the slices are k distinct
    * hash functions from k/4 digests), and `sig_p` = MIN of slice p over
    * the doc's shingle set, as a BIGINT. Docs with no shingles drop out,
    * matching [[minhashSignatures]].
    *
    * Scale shape: ENTIRELY map-side — the compiled
    * [[graft.functions.PortableMinHash]] kernel takes each doc's shingle
    * window array and emits the k mins in one pass, so the signature
    * stage has ZERO shuffle (same shape as the production xxhash64 path).
    * The relational spelling the DuckDB oracles run — explode + groupBy
    * with `min(conv(substr(md5(...))))` — produces bit-identical values
    * by definition of md5; it cost one full shuffle of the corpus's
    * shingle stream per audit run (measured 1.4 s → map-side at sf0.1).
    * Duplicates in the window array don't affect a MIN, so no per-doc
    * distinct is needed.
    */
  def portableMinhash(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 8): DataFrame = {
    require(k % 4 == 0, s"k=$k must be a multiple of 4 (md5 yields 4 slices)")
    // the empty-doc gate must be size(tk) >= 3, NOT size(ss) > 0: a
    // predicate on ss would be pushed below the projections with ss (and
    // tk inside it) inlined into the filter condition — re-running the
    // tokenizer inside the window lambda per index, the exact 27x trap
    // PlanAuditSpec's lambda guard flags (it caught this rewrite's first
    // draft). On tk the pushed-down condition re-runs only the tokenizer
    // itself once in the Filter node.
    val sigs = df
      .select(col(idCol), portableTokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col(idCol), portableShingleWindows(col("tk")).as("ss"))
      .select(col(idCol), graft.functions.PortableMinHash(col("ss"), k).as("mh"))
    sigs.select(col(idCol) +:
      (0 until k).map(p => element_at(col("mh"), p + 1).as(s"sig$p")): _*)
  }

  /** LSH banding over portable signatures: `bands` bands of `k/bands`
    * consecutive sigs, band key = md5 of their ':'-joined decimal forms
    * (the separator keeps (1, 23) and (12, 3) distinct; bigint→string is
    * plain decimal in every engine). Emits `(id, band_id, band_hash)`
    * ready for [[candidatePairs]]. */
  def portableBands(sigs: DataFrame, idCol: String, k: Int,
                    bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val r = k / bands
    val keys = array((0 until bands).map { b =>
      md5(concat_ws(":", (0 until r).map(i => col(s"sig${b * r + i}")): _*))
    }: _*)
    sigs.select(col(idCol).as("id"),
      posexplode(keys).as(Seq("band_id", "band_hash")))
  }

  /** Incremental perceptual-hash ingest gate — [[lshIngest]] for 64-bit
    * hashes (image dHash, audio fingerprints): a batch item survives iff
    * NO stored-index hash lies within `maxHamming` of it. Candidates via
    * the 16-bit-band pigeonhole (exact-band equi-join of batch bands
    * against the stored index's bands — co-locatable by band value at
    * scale, like the LSH index), then hamming-verified, then anti-joined
    * back. Decisions depend only on the static index, so the gate is
    * batch-split invariant (the streaming parity pin in
    * [[graft.streaming.EventStream.streamingPerceptualIngest]]).
    *
    * Skew guard: the index side is collapsed to DISTINCT (band, hash)
    * rows first — exact (a stored hash repeated a million times adds
    * nothing to the gate) and it flattens the most common hot-band case,
    * a popular image stored many times. For buckets that stay hot with
    * genuinely DISTINCT hashes (e.g. the all-zero band every flat image
    * shares), `maxBucketSize` caps the per-(band_id, band_val) distinct
    * index hashes the join may touch. Dropping a bucket WEAKENS the gate
    * — batch items skip comparison against that bucket's hashes and may
    * survive as false non-dups — so a binding cap must be loud: pass
    * `dropAudit` and read `dropped_buckets` / `max_bucket_size` after an
    * action (the [[bandedHammingPairs]] contract). Default cap is off;
    * graded parity queries run exact.
    */
  def perceptualIngest(batch: DataFrame, index: DataFrame, idCol: String,
                       hashCol: String, maxHamming: Int = 3,
                       maxBucketSize: Int = Int.MaxValue,
                       dropAudit: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole only guarantees recall for hamming <= 3")
    def asBands(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"${side}_id"), col(hashCol).as(s"${side}_h"),
        posexplode(array((0 until 4).map { b =>
          shiftrightunsigned(col(hashCol), b * 16).bitwiseAND(lit(0xFFFFL))
        }: _*)).as(Seq("band_id", "band_val")))
    val idxBands = asBands(index, "i")
      .select(col("band_id"), col("band_val"), col("i_h")).distinct()
    val gated =
      if (maxBucketSize == Int.MaxValue && dropAudit.isEmpty) idxBands
      else {
        val stats = idxBands.groupBy(col("band_id"), col("band_val"))
          .agg(count(lit(1)).as("__bn"))
        val audited = dropAudit.fold(stats)(obs => stats.observe(obs,
          sum(when(col("__bn") > maxBucketSize, 1L).otherwise(0L))
            .as("dropped_buckets"),
          max(col("__bn")).as("max_bucket_size")))
        idxBands.join(audited.filter(col("__bn") <= maxBucketSize)
          .select(col("band_id"), col("band_val")),
          Seq("band_id", "band_val"), "left_semi")
      }
    val hits = asBands(batch, "b")
      .join(gated, Seq("band_id", "band_val"))
      .filter(bit_count(col("b_h").bitwiseXOR(col("i_h"))) <= maxHamming)
      .select(col("b_id").as("id")).distinct()
    batch.select(col(idCol))
      .join(hits, col(idCol) === hits("id"), "left_anti")
  }

  /** Incremental LSH ingest gate: which batch docs survive against a STORED
    * band index. A doc survives iff NONE of its band keys collides with the
    * index — no pair expansion at all: one semi-join of the batch's bands
    * against the index (both sides keyed by (band_id, band_hash)), then an
    * anti-join back to batch ids. At 100 TB the index is a stored table
    * bucketed by band_hash ([[Layout.writeBucketed]]), so the semi-join
    * co-locates without a fresh shuffle of the index side. Per-doc decisions
    * depend ONLY on the static index — never on other batch docs — so the
    * gate is batch-split invariant: any partition of an ingest stream into
    * micro-batches yields the same survivor set (the streaming parity pin
    * in [[graft.streaming.EventStream.streamingLshIngest]]).
    */
  def lshIngest(batch: DataFrame, indexBands: DataFrame, idCol: String,
                textCol: String, k: Int = 8, nBands: Int = 4): DataFrame = {
    val hits = portableBands(portableMinhash(batch, idCol, textCol, k),
        idCol, k, nBands)
      .join(indexBands, Seq("band_id", "band_hash"), "left_semi")
      .select(col("id")).distinct()
    batch.select(col(idCol))
      .join(hits, col(idCol) === hits("id"), "left_anti")
  }

  /** MinHash calibration audit: for every LSH candidate pair, the sketch
    * ESTIMATE (matching signature components / k) next to the EXACT
    * Jaccard over the same lowercase shingle space the signatures
    * summarize — the "is my sketch lying to me" check run before trusting
    * a threshold choice at scale (the estimator is unbiased with stddev
    * ≈ sqrt(J(1−J)/k), so a systematic gap flags a broken hash or
    * tokenization drift between pipeline stages).
    *
    * Scale shape: signatures map-side (and carried into the band buckets,
    * so n_match falls out of the in-bucket pair expansion); exact shingle
    * sets built ONLY for candidate ids (projected after the pair join, so
    * non-candidates never shingle). Returns
    * (a, b, n_match, est_j, jaccard, abs_err).
    */
  def minhashCalibration(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, bands: Int = 4,
                         maxBucketSize: Int = 1000): DataFrame = {
    // FUSED estimate path (round 10 — the Md5Slices treatment applied to
    // the per-pair signature replay the round-9 finding left open): the k
    // signature longs ride INTO the band buckets alongside the id (k·8
    // bytes of extra shuffle per band row — the bucket key itself is an
    // md5 string, so the sigs roughly double an already tiny row), and
    // n_match is computed DURING in-bucket pair expansion from the two
    // member structs. The signature table never materializes, never
    // checkpoints, and never joins back per pair — that replay (sigs
    // checkpoint + a 3-frame join assembly) was the ~1.3 s gap between
    // this audit and d_containment, which shares every other stage.
    val sigs = portableMinhash(docs, idCol, textCol, k)
    val r = k / bands
    val keys = array((0 until bands).map { b =>
      md5(concat_ws(":", (0 until r).map(i => col(s"sig${b * r + i}")): _*))
    }: _*)
    val member = struct(col(idCol).as("id") +:
      (0 until k).map(p => col(s"sig$p")): _*)
    // ids are unique, so sorting (id, sig…) structs orders buckets exactly
    // as candidatePairs' sort_array over bare ids — pair (a, b) emission
    // order (a < b) is unchanged
    val buckets = sigs
      .select(member.as("m"), posexplode(keys).as(Seq("band_id", "band_hash")))
      .groupBy(col("band_id"), col("band_hash"))
      .agg(sort_array(collect_set(col("m"))).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxBucketSize)
    // The production bucket cap bounds the audited pair set the same way
    // it bounds the dedup candidate set (capped ⊆ uncapped); the graded
    // query passes Int.MaxValue to mirror its uncapped oracle.
    def nMatchOf(x: Column, y: Column): Column = (0 until k).map(p =>
      when(x.getField(s"sig$p") === y.getField(s"sig$p"), 1).otherwise(0))
      .reduce(_ + _)
    // distinct on (a, b, n_match) dedupes multi-band collisions exactly as
    // the bare (a, b) distinct did: n_match is a function of the pair
    val pairs = buckets
      .select(explode(flatten(transform(col("ms"), (x, i) =>
        transform(slice(col("ms"), i + 2, size(col("ms"))), y =>
          struct(x.getField("id").as("a"), y.getField("id").as("b"),
            nMatchOf(x, y).as("n_match")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.n_match").as("n_match"))
      .distinct()
    // Exact-Jaccard verify: two plain equi-joins of the pair frame against
    // the corpus, shingle sets projected AFTER each join so they are built
    // ONLY for join survivors (candidates) — corpus text never shuffles
    // and never shingles outside the candidate sliver. No broadcast hint
    // and no checkpoint: the pair frame is consumed once per side, and AQE
    // sees its post-shuffle size (KBs for any capped audit) and converts
    // both joins to broadcast at runtime — while an uncapped pathological
    // pair set degrades to a shuffle join instead of an OOM. Replacing the
    // round-9 checkpoint chain (pairs → candidateIds → semi-join → perId →
    // 3-frame assembly, 3 lazy checkpoints) with this two-join tail took
    // the audit from ~2.8 s to ~1.0 s at sf0.1. Half that win was a latent
    // instance of the 27× lambda trap ([[portableShingleWindows]]): the
    // round-9 perId frame spelled array_distinct(windows(tokens(text)))
    // in ONE projection, inlining the tokenizer into the window lambda —
    // ~2 ms/doc instead of ~70 µs/doc. Tokens are now projected in their
    // own select stage on each side, like every other portable caller.
    val txt = docs.select(col(idCol).as("__vid"), col(textCol).as("__vtext"))
    val withA = txt.join(pairs, col("__vid") === col("a"))
      .select(col("a"), col("b"), col("n_match"),
        portableTokens(col("__vtext")).as("__tka"))
      .select(col("a"), col("b"), col("n_match"),
        array_distinct(portableShingleWindows(col("__tka"))).as("__sa"))
    txt.join(withA, col("__vid") === col("b"))
      .withColumn("__tkb", portableTokens(col("__vtext")))
      .withColumn("__sb", array_distinct(portableShingleWindows(col("__tkb"))))
      .withColumn("__i", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("__u", size(col("__sa")) + size(col("__sb")) - col("__i"))
      .withColumn("__j", when(col("__u") === 0, lit(0.0))
        .otherwise(col("__i").cast("double") / col("__u").cast("double")))
      .select(col("a"), col("b"), col("n_match"),
        round(col("n_match") / lit(k.toDouble), 4).as("est_j"),
        round(col("__j"), 4).as("jaccard"),
        round(abs(col("n_match") / lit(k.toDouble) - col("__j")), 4).as("abs_err"))
  }

  /** Cross-source duplicate-overlap matrix — the provenance audit behind
    * a data card's "which sources copy from which" section: for every
    * source pair, how many canonical fingerprints appear in BOTH. High
    * overlap between two crawls means their union double-counts content
    * (and their dedup savings estimate); overlap with a licensed source
    * is a compliance flag.
    *
    * Scale shape: text collapses to (source, fp) map-side and
    * deduplicates; ONE groupBy on fp collects the per-fingerprint source
    * set (bounded by the source count, not the corpus — the in-bucket
    * expansion is |sources|²/2 at worst), then pairs aggregate to the
    * S×S matrix. The corpus never shuffles; only 16-byte digests do.
    *
    * `prefixChars` > 0 switches to a NEAR-dup key: the fingerprint is
    * taken over only the first N characters of the canonical form, so
    * documents that share an opening but diverge later (template reuse,
    * syndicated ledes, suffix-edited near-dups) still collide — the
    * coarse screen a provenance audit wants when exact cross-source
    * copies are rare. 0 (default) keeps the exact full-text key.
    */
  def sourceOverlap(docs: DataFrame, textCol: String,
                    srcCol: String, prefixChars: Int = 0): DataFrame = {
    val canon = graft.functions.CanonicalizeText(col(textCol))
    val key =
      if (prefixChars > 0) md5(substring(canon, 1, prefixChars)) else md5(canon)
    val fps = docs.select(col(srcCol).as("source"), key.as("fp")).distinct()
    fps.groupBy(col("fp"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(ArrayPairs.pairStructs(col("ss"))).as("p"))
      .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Incremental winnowing ingest gate: which batch docs survive a
    * span-reuse check against a STORED fingerprint index — the
    * plagiarism-gate sibling of [[lshIngest]]. A doc is rejected iff it
    * shares >= `minShared` selected fingerprints with ANY historical
    * content (the [[winnowMatches]] evidence threshold); by the winnowing
    * guarantee, any copied run of w+k-1 tokens surfaces at least one
    * shared fingerprint, so long verbatim reuse cannot slip through.
    *
    * Scale shape: ONLY the batch is shingled/winnowed; the index side is
    * a stored distinct-fp table (bucketable by fp — the [[lshIngest]]
    * store contract) consumed by one semi-join, then a count per batch
    * doc and an anti-join back. Decisions depend only on the static
    * index, so the gate is batch-split invariant like the other ingest
    * gates.
    */
  def winnowIngest(batch: DataFrame, indexFps: DataFrame, idCol: String,
                   textCol: String, k: Int = 4, w: Int = 4,
                   minShared: Int = 2): DataFrame = {
    val hits = winnowFingerprints(batch, idCol, textCol, k, w)
      .join(indexFps.select(col("fp")), Seq("fp"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col(idCol))
    batch.select(col(idCol)).join(hits, Seq(idCol), "left_anti")
  }

  /** DEFAULT directory moduli of the winnow store. These are code
    * constants at build time, but every store FREEZES the counts it was
    * built with inside `_graft_layout` (alongside k/w) and every later
    * mutation reads them back from the store — the
    * [[Retrieval.writeLayoutMeta]] discipline. Without that, raising
    * the constant (the obvious dial when stores grow) would make every
    * mutation recompute buckets under the NEW modulus and prune the
    * WRONG directories of every EXISTING store: missed decrements,
    * silent refcount corruption. fp buckets key the REFCOUNT table (fp
    * is an md5 hex STRING, so the hash is type-stable by construction);
    * doc buckets key the attribution sidecar on the id hash.
    */
  private val WinnowFpBuckets = 32
  private val WinnowDocBuckets = 16

  private def winnowFpBucket(fpBuckets: Int): Column =
    pmod(xxhash64(col("fp")), lit(fpBuckets)).cast("int")

  /** The winnow store's frozen geometry: (k, w, fpBuckets, docBuckets),
    * read back from `_graft_layout`. Stores written before the bucket
    * counts were persisted (2-column layout) fall back to the code
    * defaults they were necessarily built under — documented-weaker:
    * they adopt the full record on their next rebuild.
    */
  def winnowLayoutAt(spark: org.apache.spark.sql.SparkSession,
                     path: String): (Int, Int, Int, Int) = {
    val df = spark.read.parquet(s"$path/_graft_layout")
    val row = df.head()
    if (df.columns.contains("fbuckets"))
      (row.getInt(df.columns.indexOf("k")),
        row.getInt(df.columns.indexOf("w")),
        row.getInt(df.columns.indexOf("fbuckets")),
        row.getInt(df.columns.indexOf("dbuckets")))
    else (row.getInt(0), row.getInt(1), WinnowFpBuckets, WinnowDocBuckets)
  }

  /** The ERASABLE winnow-fingerprint store — the span-reuse (plagiarism)
    * gate's index, with the doc attribution a bare DISTINCT-fp set
    * cannot have:
    *
    *  - `path/docs`: one (id, fp) row per selected fingerprint,
    *    id-hash-bucketed directories (`dbucket`) — the attribution
    *    sidecar a right-to-erasure batch reads (only its tombstones'
    *    buckets) to learn WHICH fingerprints the erased docs contributed.
    *  - `path/fps`: (fp, refs) refcounts — refs = how many stored docs
    *    selected fp — fp-hash-bucketed (`fbucket`), written LAST (commit
    *    signal). The gate ([[winnowIngest]]) consumes `.select("fp")`
    *    unchanged; refs exist so erasure can DECREMENT instead of
    *    guessing, and fps reaching zero LEAVE the gate — a rebuilt store
    *    would not carry them, and the gate stops rejecting resubmissions
    *    whose only match was erased content (the GDPR obligation the
    *    distinct-fp layout could not meet).
    *
    * Scale shape: winnowing runs once over the ingested docs (one
    * explode + per-doc window min); both tables are bucketed directories
    * so erasure mutates per-directory like every other store.
    */
  def writeWinnowStoreAt(spark: org.apache.spark.sql.SparkSession,
                         path: String, docs: DataFrame, idCol: String,
                         textCol: String, k: Int = 4, w: Int = 4,
                         fpBuckets: Int = WinnowFpBuckets,
                         docBuckets: Int = WinnowDocBuckets): Unit = {
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
      .localCheckpoint()
    // a zero-fingerprint corpus (every doc under w+k-1 tokens) must not
    // build: partitionBy over zero rows writes _SUCCESS with no data
    // files, and every later read of the "existing" store would throw
    // unable-to-infer-schema — leave the path untouched instead (the
    // gate's missing-store semantics keep applying, and a later batch
    // with real fingerprints builds normally)
    if (fps.isEmpty) return
    fps.withColumn("dbucket",
        pmod(xxhash64(col(idCol)), lit(docBuckets)).cast("int"))
      .repartition(4, col("dbucket"))
      .sortWithinPartitions(col("dbucket"), col(idCol))
      .write.mode("overwrite").partitionBy("dbucket")
      .parquet(s"$path/docs")
    // freeze the winnowing geometry AND the directory moduli INSIDE the
    // store (the _graft_index_config discipline): a later batch gating
    // or merging under different k/w would fingerprint a different
    // shingle/window space — matching nothing and corrupting refcounts
    // with no error — and a mutation recomputing buckets under a changed
    // code constant would prune the wrong directories just as silently
    import spark.implicits._
    Seq((k, w, fpBuckets, docBuckets))
      .toDF("k", "w", "fbuckets", "dbuckets").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_graft_layout")
    fps.groupBy(col("fp")).agg(count(lit(1)).as("refs"))
      .withColumn("fbucket", winnowFpBucket(fpBuckets))
      .repartition(4, col("fbucket"))
      .sortWithinPartitions(col("fbucket"), col("fp"))
      .write.mode("overwrite").partitionBy("fbucket")
      .parquet(s"$path/fps")
  }

  /** Reject a gate/merge whose (k, w) differs from what the store was
    * built with — mixed geometries match nothing and corrupt refcounts
    * silently. Stores written before the config existed pass (nothing to
    * compare; they adopt on their next rebuild).
    */
  def requireWinnowLayout(spark: org.apache.spark.sql.SparkSession,
                          path: String, k: Int, w: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_graft_layout")
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      return
    val row = spark.read.parquet(s"$path/_graft_layout").head()
    require(row.getInt(0) == k && row.getInt(1) == w,
      s"$path was winnowed with (k=${row.getInt(0)}, w=${row.getInt(1)}) " +
        s"but this batch is configured (k=$k, w=$w) — mixed geometries " +
        "match nothing and silently corrupt refcounts. Align the config " +
        "or rebuild the index.")
  }

  /** The gate-facing handle onto a written winnow store: the (fp, refs)
    * refcount table — feed `.select("fp")`-compatible consumers
    * ([[winnowIngest]]) directly. */
  def readWinnowStoreFps(spark: org.apache.spark.sql.SparkSession,
                         path: String): DataFrame =
    spark.read.parquet(s"$path/fps")

  /** Whether `path` holds a winnow store (the fps table's _SUCCESS is
    * the commit signal — it is written LAST on build and rewritten LAST
    * on merge). */
  def winnowStoreExistsAt(spark: org.apache.spark.sql.SparkSession,
                          path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/fps/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Fold a batch of NEW documents into a written winnow store — the
    * steady-state ingest behind the winnow-gate: the batch's (id, fp)
    * attribution rows APPEND into their id-hash sidecar directories, and
    * refcounts integer-add via one outer join over ONLY the batch's fp
    * directories (new fps insert with their add count — they hash into
    * the same hit-directory set by construction). Builds the store when
    * `path` is empty. Refcount arithmetic is a pure multiset add, so the
    * merge is associative/batch-split invariant and merged ≡ rebuild on
    * the combined corpus (spec-pinned). Same arriving-batch contract as
    * every incremental gate (ids DISJOINT from the store — chain a
    * dedup-gate upstream when re-deliveries are possible) and the same
    * staged single-writer marker; sidecar appends BEFORE the fps rewrite
    * so a crash between the two refuses loudly rather than leaving an
    * uncounted attribution row.
    */
  def mergeWinnowStoreAt(spark: org.apache.spark.sql.SparkSession,
                         path: String, batch: DataFrame, idCol: String,
                         textCol: String, k: Int = 4, w: Int = 4): Unit = {
    // refuse BEFORE the build-vs-merge dispatch (the mergeNbStoreAt
    // rationale: a crashed mutation may have destroyed the fps commit
    // signal this dispatch keys on, and the build branch would
    // static-overwrite away the accumulated refcounts)
    Layout.refuseIfPending(spark, path)
    if (!winnowStoreExistsAt(spark, path)) {
      writeWinnowStoreAt(spark, path, batch, idCol, textCol, k, w)
      return
    }
    requireWinnowLayout(spark, path, k, w)
    // bucket moduli come from the STORE's frozen record, never the code
    // constants — a changed constant must not re-home existing buckets
    val (_, _, fpB, docB) = winnowLayoutAt(spark, path)
    // a batch with no fingerprints (all docs under w+k-1 tokens, or an
    // empty gate output) merges nothing — skip the marker round-trip
    val bfps0 = winnowFingerprints(batch, idCol, textCol, k, w)
      .localCheckpoint()
    if (bfps0.isEmpty) return
    Layout.withPendingMarkerStaged(spark, path)({
      val bfps = bfps0
      val adds = bfps.groupBy(col("fp")).agg(count(lit(1)).as("__add"))
      val hitDirs = adds.select(winnowFpBucket(fpB).as("b")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      val fpsRaw = spark.read.parquet(s"$path/fps")
      val newRows = fpsRaw.filter(col("fbucket").isInCollection(hitDirs))
        .select(col("fp"), col("refs"))
        .join(adds, Seq("fp"), "full_outer")
        .select(col("fp"),
          (coalesce(col("refs"), lit(0L)) + coalesce(col("__add"), lit(0L)))
            .as("refs"))
        .withColumn("fbucket", winnowFpBucket(fpB))
      val fpsPlan = Layout.planDirRewrite(spark, s"$path/fps", "fbucket",
        newRows, hitDirs, fpsRaw, sortCols = Seq("fp"))
      (bfps, fpsPlan)
    }) { case (bfps, fpsPlan) =>
      bfps.withColumn("dbucket",
          pmod(xxhash64(col(idCol)), lit(docB)).cast("int"))
        .repartition(2, col("dbucket"))
        .sortWithinPartitions(col("dbucket"), col(idCol))
        .write.mode("append").partitionBy("dbucket")
        .parquet(s"$path/docs")
      // fps rewrite LAST — its _SUCCESS is the commit signal
      Layout.execDirRewrite(spark, fpsPlan)
    }
  }

  /** Right-to-erasure for the winnow store, IN PLACE: the tombstoned
    * docs' fingerprints come off the attribution sidecar (reading only
    * the ≤ |tombstones| id-hash directories they can live in), refcounts
    * decrement by the per-fp hit counts via one outer join over ONLY the
    * hit fp directories, fps at zero are dropped (the gate stops
    * rejecting what only erased docs matched), and the sidecar compacts
    * by the standard per-directory rule. Forget ≡ rebuild-on-survivors
    * is what the d_winnow_forget_stored oracle hash-checks; idempotent
    * (a second run finds no attribution rows and no-ops); staged pending
    * marker like every store mutation. Tombstone ids cast to the
    * sidecar's id type before hashing (the [[Similarity.forgetIvfStoreAt]]
    * type-sensitivity rule).
    */
  def forgetWinnowStoreAt(spark: org.apache.spark.sql.SparkSession,
                          path: String, tombstones: DataFrame,
                          idCol: String): Unit = {
    Layout.refuseIfPending(spark, path)
    // bucket moduli from the store's frozen record (the merge rationale)
    val (_, _, fpB, docB) = winnowLayoutAt(spark, path)
    val side = spark.read.parquet(s"$path/docs")
    val idType = side.schema(idCol).dataType
    val tomb = tombstones
      .select(expr(s"try_cast(`$idCol` AS ${idType.sql})").as(idCol))
      .filter(col(idCol).isNotNull).distinct()
    val tombBuckets = tomb
      .select(pmod(xxhash64(col(idCol)), lit(docB)).cast("int")
        .as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val hits = side.filter(col("dbucket").isInCollection(tombBuckets))
      .join(broadcast(tomb), Seq(idCol), "left_semi")
      .localCheckpoint()
    if (hits.isEmpty) return
    Layout.withPendingMarkerStaged(spark, path)({
      val dec = hits.groupBy(col("fp")).agg(count(lit(1)).as("__dec"))
      // hit fp directories recomputed from the fp STRING — md5 hex, so
      // the hash is type-stable (no numeric-type drift possible)
      val hitFpDirs = dec.select(winnowFpBucket(fpB).as("b")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      val fpsRaw = spark.read.parquet(s"$path/fps")
      val newRows = fpsRaw.filter(col("fbucket").isInCollection(hitFpDirs))
        .join(dec, Seq("fp"), "left_outer")
        .select(col("fp"),
          (col("refs") - coalesce(col("__dec"), lit(0L))).as("refs"),
          col("fbucket"))
        .filter(col("refs") > 0)
      val fpsPlan = Layout.planDirRewrite(spark, s"$path/fps", "fbucket",
        newRows, hitFpDirs, fpsRaw, sortCols = Seq("fp"))
      val docsPlan = Layout.planCompaction(spark, s"$path/docs", "dbucket",
        side, tomb, idCol, Layout.partitionHits(hits, "dbucket"),
        sortCols = Seq(idCol))
      (fpsPlan, docsPlan)
    }) { case (fpsPlan, docsPlan) =>
      Layout.execDirRewrite(spark, fpsPlan)
      docsPlan.foreach(Layout.execDirRewrite(spark, _))
    }
  }

  /** Right-to-erasure index compaction: drop every index row belonging to
    * a tombstoned document. Applies uniformly to ALL the stored dedup/ANN
    * layouts in this engine — the exact-dup fingerprint index, the LSH
    * band index, the perceptual-hash index, and the id/centroid-
    * partitioned vector stores — because each of their rows derives from
    * exactly ONE source document. That per-doc independence is the
    * compaction theorem: anti-join removal is row-identical to rebuilding
    * the index from the surviving corpus (the `d_index_forget` oracle IS
    * the rebuild), so a deletion request never forces a corpus rescan.
    * One anti-join keyed by id; the tombstone side is a deletion-request
    * batch — tiny in practice, AQE broadcasts it — and partitioned stores
    * stay valid in place since removals never move surviving rows.
    */
  def forgetDocs(index: DataFrame, tombstones: DataFrame,
                 idCol: String): DataFrame =
    index.join(tombstones.select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Corpus snapshot diff — the dataset-versioning audit between two
    * releases of a training corpus: per id, `added` (v2 only), `removed`
    * (v1 only), `changed` (both, canonical fingerprint differs) or
    * `unchanged`. The columns a data card's "what moved since v1" section
    * and an incremental re-train decision both read. Scale shape: each
    * side collapses to (id, md5 fingerprint) map-side — text never
    * shuffles — and ONE full-outer join on id classifies every row; at
    * 100 TB both sides are ingest-time fingerprint indexes
    * ([[incremental]]'s store), so the diff never rescans either corpus.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val a = v1.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("fp_a"))
    val b = v2.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("fp_b"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** SCD2 (slowly-changing-dimension type 2) history materialization
    * from two snapshots — the warehouse-style versioned table a corpus
    * registry keeps: one row per (id, content version) with a validity
    * interval. Version tags are the snapshot ordinals (1, 2); an open
    * interval (`valid_to` null, `is_current` 1) marks rows live in v2.
    *   unchanged → (fp, 1, null, current)
    *   changed   → (fp₁, 1, 2, closed) + (fp₂, 2, null, current)
    *   removed   → (fp₁, 1, 2, closed)
    *   added     → (fp₂, 2, null, current)
    * One full-outer join on id over map-side fingerprints (the
    * [[snapshotDiff]] shape) then a per-row interval expansion — the
    * corpus never shuffles, and at scale both inputs are the ingest-time
    * fingerprint indexes.
    */
  def scd2Merge(v1: DataFrame, v2: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val a = v1.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("fp_a"))
    val b = v2.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("fp_b"))
    val j = a.join(b, Seq(idCol), "full_outer")
    val closedV1 = j.filter(col("fp_a").isNotNull &&
        (col("fp_b").isNull || col("fp_a") =!= col("fp_b")))
      .select(col(idCol), col("fp_a").as("fp"),
        lit(1).as("valid_from"), lit(2).cast("int").as("valid_to"),
        lit(0L).as("is_current"))
    val openV1 = j.filter(col("fp_a").isNotNull && col("fp_b").isNotNull &&
        col("fp_a") === col("fp_b"))
      .select(col(idCol), col("fp_a").as("fp"),
        lit(1).as("valid_from"), lit(null).cast("int").as("valid_to"),
        lit(1L).as("is_current"))
    val openV2 = j.filter(col("fp_b").isNotNull &&
        (col("fp_a").isNull || col("fp_a") =!= col("fp_b")))
      .select(col(idCol), col("fp_b").as("fp"),
        lit(2).as("valid_from"), lit(null).cast("int").as("valid_to"),
        lit(1L).as("is_current"))
    closedV1.unionByName(openV1).unionByName(openV2)
  }

  /** Per-doc duplicated-span coverage — the audit stage of exact-substring
    * dedup (the "how much of this document is copied from elsewhere"
    * signal): for each doc, the fraction of its positional 3-gram windows
    * whose gram also occurs in at least one OTHER document. Docs above a
    * coverage threshold are what a substring-dedup pass would trim.
    *
    * Scale shape: grams are md5-hashed map-side so both shuffles carry
    * fixed-width 32-char keys instead of raw text: (1) distinct(doc, gram)
    * → gram groupBy with partial agg for the ≥2-docs common set; (2) the
    * common set left-joins back to the window stream keyed by gram. Both
    * are plain hash exchanges; no window function, no self-join. Boilerplate
    * grams concentrate on single keys but only carry (gh) after the
    * distinct — AQE skew-split handles the join side.
    */
  def duplicatedSpanStats(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    // collapse the window stream to per-(doc, gram) counts FIRST: one
    // explode + one shuffle, and the collapsed frame (≤ distinct grams
    // per doc) feeds both downstream consumers. It is consumed twice —
    // the ≥2-docs common set and the join back — so localCheckpoint
    // materializes it once instead of re-running the corpus explode per
    // consumer (the verifyJaccard pattern)
    val perDocGram = portableShingleStream(df, idCol, textCol, distinctPerDoc = false)
      .select(col(idCol), md5(col("sh")).as("gh"))
      .groupBy(col("gh"), col(idCol)).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // perDocGram is distinct by (gh, doc), so doc frequency is a plain count
    val common = perDocGram.groupBy(col("gh"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("gh"), lit(1).as("dup"))
    perDocGram.join(common, Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("n")).cast("bigint").as("n_windows"),
        sum(coalesce(col("dup"), lit(0)) * col("n")).cast("bigint").as("n_dup"))
      .withColumn("dup_frac", round(col("n_dup") / col("n_windows"), 4))
  }

  /** Exact duplicated-span REMOVAL — the rewrite stage completing what
    * [[duplicatedSpanStats]] audits (Lee et al. 2022's deduplicate-text-
    * datasets, the line-dedup → line-dedup-clean relationship): every
    * token covered by a 3-gram window that also occurs in some OTHER doc
    * is dropped in place, token order preserved, and the doc is rebuilt
    * whitespace-canonicalized from the survivors. Dedup keys are
    * LOWERCASED grams; the rebuilt text keeps original case (aligned
    * positions — lowercasing never changes the `\s+` token count).
    *
    * Scale shape: one posexplode of md5'd windows (fixed-width keys);
    * the ≥2-docs common set is a partial-agg groupBy; covered positions
    * come back as one join on gh + a bounded 3-row explode + a per-doc
    * collect_set whose size is ≤ the doc's token count; the rebuild is a
    * map-side array_except/transform over the already-held token array.
    * Text never shuffles — only (id, pos, gh) triples do.
    */
  def duplicatedSpanClean(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    // original-case tokens; the lowered twin aligns position-for-position
    val toks = df.select(col(idCol),
        filter(split(trim(col(textCol)), "\\s+"), x => length(x) > 0).as("ot"))
      .localCheckpoint()
    // windows keyed 1-based like the oracle's range(1, len-1): window i
    // covers tokens i, i+1, i+2
    val wins = toks.filter(size(col("ot")) >= 3)
      .select(col(idCol), posexplode(
        transform(sequence(lit(1), size(col("ot")) - 2), i =>
          md5(lower(concat_ws(" ", element_at(col("ot"), i),
            element_at(col("ot"), i + 1), element_at(col("ot"), i + 2)))))))
      .select(col(idCol), (col("pos") + 1).as("w"), col("col").as("gh"))
      .localCheckpoint() // consumed twice: common-set build + join back
    val common = wins.select(col(idCol), col("gh")).distinct()
      .groupBy(col("gh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select(col("gh"))
    val covered = wins.join(common, Seq("gh"))
      .select(col(idCol), explode(sequence(col("w"), col("w") + 2)).as("p"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("p"))).as("cov"))
    toks.join(covered, Seq(idCol), "left")
      .select(col(idCol), size(col("ot")).cast("bigint").as("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("bigint").as("n_removed"),
        // empty-doc guard: sequence(1, 0) runs DESCENDING in Spark (the
        // portableShingleWindows trap), so zero-token docs short-circuit
        when(size(col("ot")) < 1, lit(""))
          .otherwise(concat_ws(" ", transform(
            array_except(sequence(lit(1), size(col("ot"))),
              coalesce(col("cov"), array().cast("array<int>"))),
            p => element_at(col("ot"), p)))).as("clean_text"))
  }

  /** Engine-portable 16-bit SimHash: bit p of the fingerprint is the sign
    * of the ±1 vote sum over the doc's shingles, where a shingle votes +1
    * on bit p iff hex digit p of `md5(shingle)` has its high nibble bit
    * set (digit in '8'..'f'). The same majority-vote construction as the
    * 64-bit production [[simhash]]; md5 hex digits make every bit
    * reproducible in plain SQL. One explode + one 16-column groupBy
    * (partial agg map-side — the DuckDB spelling cross-joins 16 bit
    * positions instead; Spark keeps them as parallel agg columns so rows
    * are not multiplied before the exchange).
    */
  def portableSimhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // map-side kernel (one md5 per DISTINCT shingle, no explode/groupBy) —
    // bit-identical to the relational 16-vote-column spelling the oracle
    // runs; same size(tk)>=3 gate as portableMinhash (see there for the
    // predicate-pushdown trap a gate on the window array would hit)
    df.select(col(idCol), portableTokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col(idCol),
        array_distinct(portableShingleWindows(col("tk"))).as("ss"))
      .select(col(idCol),
        graft.functions.PortableSimHash16(col("ss")).as("simhash16"))

  /** Winnowing (MOSS) fingerprint selection: per doc, hash every k-token
    * shingle (portable md5 hex, so both engines order identically), slide a
    * w-position window over the hash sequence, and keep the minimum of each
    * FULL window. Standard winnowing guarantee: any shared run of at least
    * w + k - 1 tokens contributes at least one shared fingerprint, while
    * the selected set is ~2/(w+1) of all shingles — the density/recall
    * dial for plagiarism-style span matching at corpus scale.
    *
    * Shape: one shingle explode, a per-doc window min (doc-partitioned —
    * no cross-doc shuffle beyond the explode's own), DISTINCT (id, fp).
    * Docs shorter than w + k - 1 tokens have no full window and emit
    * nothing, identically in the SQL twin.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 4, w: Int = 4): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos")).rowsBetween(0, w - 1)
    docs.select(col(idCol),
        graft.functions.WordShingles(lower(trim(col(textCol))), k).as("sh"))
      .select(col(idCol), size(col("sh")).as("ng"),
        posexplode(col("sh")).as(Seq("pos", "g")))
      .withColumn("fp", min(md5(col("g"))).over(win))
      .filter(col("pos") <= col("ng") - w)
      .select(col(idCol), col("fp")).distinct()
  }

  /** Cross-doc winnowing matches: doc pairs sharing >= minShared selected
    * fingerprints, with the shared count. Pair expansion happens inside
    * fingerprint buckets (the LSH in-bucket pattern via ArrayPairs), so a
    * fingerprint shared by m docs costs m^2/2 pairs — `maxBucketSize`
    * drops hotter buckets (weakening recall, never precision) and a
    * binding cap must be loud: pass `dropAudit` and read `dropped_buckets`
    * / `max_bucket_size` after an action, the [[bandedHammingPairs]]
    * contract. Graded parity queries run exact (cap off).
    */
  def winnowMatches(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 4, w: Int = 4, minShared: Int = 2,
                    maxBucketSize: Int = Int.MaxValue,
                    dropAudit: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val buckets = winnowFingerprints(docs, idCol, textCol, k, w)
      .groupBy(col("fp"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
    val gated =
      if (maxBucketSize == Int.MaxValue && dropAudit.isEmpty) buckets
      else {
        val sized = buckets.withColumn("__bn", size(col("ids")))
        val audited = dropAudit.fold(sized)(obs => sized.observe(obs,
          sum(when(col("__bn") > maxBucketSize, 1L).otherwise(0L))
            .as("dropped_buckets"),
          max(col("__bn")).as("max_bucket_size")))
        audited.filter(col("__bn") <= maxBucketSize)
      }
    gated.select(explode(ArrayPairs.pairStructs(col("ids"))).as("p"))
      .select(col("p.a"), col("p.b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
  /** Exact set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08):
    * every pair of docs whose distinct-token Jaccard is >= tauNum/tauDen,
    * found WITHOUT LSH's false negatives and WITHOUT the all-pairs join.
    *
    * Tokens get a global rarity rank (df ASC — rare first); each doc
    * indexes only its first `len - ceil(tau*len) + 1` tokens in that
    * order. Completeness is exact: if J(A,B) >= tau then
    * |A∩B| >= ceil(tau*|A|) and >= ceil(tau*|B|), so the SMALLEST-ranked
    * common token sits within both prefixes — every qualifying pair
    * shares a prefix token and surfaces in the equi-join on it.
    * Candidates are then verified with exact integer arithmetic
    * (inter*tauDen >= uni*tauNum — no float threshold).
    *
    * Scale shape: the prefix index carries the RAREST tokens, so
    * candidate buckets are small by construction (the frequent tokens
    * that would blow up an equi-join are exactly the ones the prefix
    * excludes for high tau); the vocab rank table is vocab-sized and
    * broadcast. One groupBy for df, one doc-keyed window pair for
    * positions, one equi-join on prefix tokens, verification joins
    * bounded by the candidate count.
    */
  def prefixFilterJoin(df: DataFrame, idCol: String, textCol: String,
                       tauNum: Int = 3, tauDen: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tauNum > 0 && tauDen >= tauNum, s"tau must be in (0,1]: $tauNum/$tauDen")
    // set elements are distinct 3-gram SHINGLES, not unigrams: a shared
    // small vocabulary makes most unigram SETS of a synthetic corpus
    // >60% similar (measured: half of all pairs qualified), while
    // trigrams encode local order and keep qualifying pairs to the real
    // near-dups. Tokens are projected before the window lambda
    // (portableShingleWindows scaladoc: inlining the tokenizer into the
    // lambda re-runs it per window index, 27x slower).
    // materialize the shingle sets ONCE: this subtree is consumed four
    // times (the exploded token stream, both sides of the prefix
    // self-join via it, and the two verification fetches) and without
    // the checkpoint every consumer re-runs the tokenize+window lambda
    // chain — measured 47 s → 4 s at sf0.1 from this line alone. At
    // cluster scale the same move is writing the tokenized projection
    // once at ingest (a [[Layout]]-style store) instead of block-manager
    // caching.
    // tk SORTED once per doc (optimization round 16): the verify join
    // below replaces size(array_intersect) — per-pair hash-set build +
    // intersection-array materialization — with the compiled sorted-merge
    // count kernel ([[graft.functions.SortedOverlapCount]]); the one
    // sort_array here amortizes over every candidate pair the doc enters.
    // Order is irrelevant to every other consumer (explode feeds groupBys;
    // prefix positions come from the rarity rank, not array order).
    // Same-JVM A/B on d_setjoin_ppjoin: 4.89 s → 3.33 s min-of-6,
    // row-identical output at sf0.001 and sf0.1 (probes/ScratchPpjoinAB).
    val toks = df.select(col(idCol).as("sid"),
      portableTokens(col(textCol)).as("tk0"))
      .select(col("sid"),
        sort_array(array_distinct(portableShingleWindows(col("tk0"))))
          .as("tk"))
      .localCheckpoint()
    val tok = toks.select(col("sid"), explode(col("tk")).as("token"))
    // global rarity rank: vocab-sized, single small window, broadcast back
    val rk = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .withColumn("r", row_number().over(Window.orderBy(col("df"), col("token"))))
      .select(col("token"), col("r"))
    val wLen = Window.partitionBy(col("sid"))
    val wPos = Window.partitionBy(col("sid")).orderBy(col("r"))
    val pref = tok.join(broadcast(rk), Seq("token"))
      .withColumn("len", count(lit(1)).over(wLen))
      .withColumn("pos", row_number().over(wPos))
      .filter(col("pos") <= col("len") -
        expr(s"(($tauNum * len) + ${tauDen - 1}) div $tauDen") + 1)
      .select(col("token"), col("sid"))
    val cand = pref.select(col("token"), col("sid").as("id1"))
      .join(pref.select(col("token"), col("sid").as("id2")), Seq("token"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
    val ta = toks.select(col("sid").as("id1"), col("tk").as("tk1"))
    val tb = toks.select(col("sid").as("id2"), col("tk").as("tk2"))
    cand.join(ta, Seq("id1")).join(tb, Seq("id2"))
      .withColumn("inter",
        graft.functions.SortedOverlapCount(col("tk1"), col("tk2")))
      .withColumn("uni",
        size(col("tk1")).cast("long") + size(col("tk2")).cast("long") - col("inter"))
      .filter(col("inter") * tauDen >= col("uni") * tauNum)
      .select(col("id1"), col("id2"),
        expr("inter * 1000000 div uni").as("jaccard_ppm"))
  }
}
