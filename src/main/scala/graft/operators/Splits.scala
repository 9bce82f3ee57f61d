package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * Split membership derives from a hash of a KEY, not from `rand()` or row
  * position: the assignment is reproducible across runs, engines, and
  * repartitions, new data lands in stable splits without reshuffling old
  * rows, and grouping the hash by an entity key (user, document source)
  * keeps whole entities inside one split — the standard guard against
  * train/test leakage. md5 is the hash (not xxhash64) so the exact same
  * assignment is computable in any engine with an md5 function.
  */
object Splits {

  /** Stable bucket in [0, buckets) from the md5 of the key's string form. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("bigint") % buckets

  /** Adds a `split` column: train / valid / test by stable hash bucket.
    * `keyCol` should be the LEAKAGE boundary (e.g. user id, not row id) —
    * every row sharing the key lands in the same split.
    */
  def withSplit(df: DataFrame, keyCol: String,
                trainPct: Int = 80, validPct: Int = 10,
                bucketsOf: Int = 100): DataFrame = {
    require(trainPct + validPct < bucketsOf, "train+valid must leave room for test")
    val b = hashBucket(col(keyCol), bucketsOf)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + validPct, lit("valid"))
        .otherwise(lit("test")))
  }

  /** Deterministic per-stratum downsampling: keep a row iff its key's hash
    * bucket falls under the stratum's per-mille rate. The corpus-rebalance
    * step of a training pipeline (e.g. cap boilerplate-heavy languages)
    * done WITHOUT `rand()`/`sampleBy`: the same row survives on every run,
    * on any engine, under any partitioning — so pipelines are replayable
    * and incremental ingests stay consistent. Strata missing from `permille`
    * fall back to `defaultPermille`. Pure map-side filter, no shuffle.
    */
  def sampleStrata(df: DataFrame, strataCol: String, keyCol: String,
                   permille: Map[String, Int],
                   defaultPermille: Int = 1000): DataFrame = {
    val rate = permille.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) =>
        when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 1000) < rate)
  }

  /** Temperature-weighted domain mixture — the corpus-composition step of
    * a pretraining pipeline: given per-domain token masses p_i, sampling
    * weights w_i ∝ p_i^α flatten the natural distribution so small
    * domains are up-sampled (the multilingual/multi-source mixing rule
    * from public LM training reports). α is fixed at 0.5 via `sqrt`:
    * IEEE-754 sqrt is correctly rounded and therefore bit-identical
    * across engines, unlike `pow(x, α)` whose libm results differ in the
    * last ulp — so the weights are oracle-checkable.
    *
    * Scale shape: one groupBy on domain (partial agg map-side; domain
    * cardinality is tiny), then two single-row totals that BROADCAST back
    * — the 100 TB corpus is touched exactly once.
    *
    * Returns per domain: (domain, n_docs, n_tokens, p_raw, weight,
    * budget_docs) where budget_docs apportions `budgetDocs` by weight.
    */
  def domainMixture(df: DataFrame, domainCol: String, tokensCol: Column,
                    budgetDocs: Long): DataFrame = {
    // the per-domain rollup is consumed by four downstream branches (tot,
    // raw, z, final) — localCheckpoint materializes it (domain cardinality
    // rows) so the 100 TB corpus scan runs exactly once, not once per branch
    val per = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).cast("bigint").as("n_tokens"))
      .localCheckpoint()
    val tot = per.agg(sum(col("n_tokens")).as("tot_tokens"))
    val raw = per.crossJoin(broadcast(tot))
      .withColumn("w_raw", sqrt(col("n_tokens").cast("double") / col("tot_tokens")))
    val z = raw.agg(sum(col("w_raw")).as("z"))
    raw.crossJoin(broadcast(z))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("tot_tokens"), 4).as("p_raw"),
        round(col("w_raw") / col("z"), 4).as("weight"),
        round(lit(budgetDocs) * col("w_raw") / col("z"), 0).cast("bigint").as("budget_docs"))
  }

  /** Multi-phase annealed mixture schedule — [[domainMixture]] across a
    * training run's phases instead of a single temperature: τ=1.0 draws
    * proportional to token mass, τ=0.5 flattens by sqrt (the classic
    * multilingual up-sampling), τ=0.0 is uniform — the
    * proportional→flattened→uniform annealing a curriculum applies as
    * training progresses. Everything that sums is an exact BIGINT:
    * τ=0.5's sqrt is pointwise-rounded to integer micro-units BEFORE the
    * normalizer adds them (IEEE sqrt is correctly rounded, so the
    * per-domain value is bit-identical on any engine, and an integer sum
    * is order-independent — the [[domainMixture]] float-z hazard can't
    * arise). Weights come back in ppm plus a per-phase doc budget.
    *
    * Scale shape: ONE corpus scan → per-domain partial-agg rollup
    * (|domains| rows), then a 3× map-side phase explode and a
    * |phases|-row broadcast normalizer — nothing after the first groupBy
    * touches more than |domains|·|phases| rows.
    */
  def mixSchedule(df: DataFrame, domainCol: String, tokensCol: Column,
                  budgetDocs: Long): DataFrame = {
    val per = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).cast("bigint").as("n_tokens"))
      .localCheckpoint()
    val phased = per.select(col("domain"), col("n_docs"), col("n_tokens"),
      explode(map(
        lit("tau_1.0"), col("n_tokens"),
        lit("tau_0.5"),
        round(sqrt(col("n_tokens").cast("double")) * 1e6).cast("bigint"),
        lit("tau_0.0"), lit(1000000L))).as(Seq("phase", "f")))
    val z = phased.groupBy(col("phase")).agg(sum(col("f")).as("z"))
    phased.join(broadcast(z), Seq("phase"))
      .select(col("phase"), col("domain"), col("n_docs"), col("n_tokens"),
        round(lit(1e6) * (col("f").cast("double") / col("z").cast("double")))
          .cast("bigint").as("weight_ppm"),
        round(lit(budgetDocs) * (col("f").cast("double") / col("z").cast("double")))
          .cast("bigint").as("budget_docs"))
  }

  /** Systematic (fixed-interval) weighted sampling per stratum: lay each
    * stratum's rows on a token-mass axis in deterministic id order and
    * take one row per `step = tot_weight / perStratum` tokens — the row
    * whose mass interval crosses a step boundary is picked. Inclusion
    * probability is proportional to weight (the classic PPS/systematic
    * design), yet everything is INTEGER arithmetic on exact token counts:
    * no `rand()`, no `pow()` — the same rows are picked on every run, any
    * engine, any partitioning. This is the deterministic replacement for
    * Efraimidis–Spirakis priority sampling, whose `u^(1/w)` keys are not
    * bit-stable across libm implementations.
    *
    * Scale shape: one groupBy for per-stratum totals (tiny → broadcast
    * back), one window partitioned BY STRATUM for the running mass —
    * strata cumulate in parallel, no global sort. Returns the picked rows
    * as (stratum, id, weight).
    */
  def systematicSample(df: DataFrame, strataCol: String, idCol: String,
                       weightCol: Column, perStratum: Long): DataFrame = {
    require(perStratum > 0, "perStratum must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col(idCol))
    val base = df.select(col(strataCol).as("stratum"), col(idCol),
      weightCol.cast("bigint").as("weight"))
    val tot = base.groupBy(col("stratum")).agg(sum(col("weight")).as("tot_wt"))
    base.join(broadcast(tot), "stratum")
      .withColumn("cum", sum(col("weight")).over(w))
      .withColumn("step", greatest(expr(s"tot_wt div $perStratum"), lit(1L)))
      // picked iff this row's (cum-weight, cum] interval crosses a step
      // boundary — `div` keeps the comparison in exact integer arithmetic
      .filter(expr("cum div step") > expr("(cum - weight) div step"))
      .select(col("stratum"), col(idCol), col("weight"))
  }

  /** Deterministic global shuffle into training shards: shard = md5
    * bucket of `"<id>:<salt>"`, position = rank of that md5 within the
    * shard. Reproduces the "shuffle the corpus once, then shard to N
    * data-loader workers" layout of a pretraining run without `rand()`:
    * the same salt gives the same order on every run and every engine,
    * and a new salt is a fresh epoch permutation.
    *
    * Scale shape: NO global sort — one hash shuffle on shard, then each
    * shard's `row_number` window cumulates independently (a single global
    * ORDER BY would funnel the whole corpus through one task). Shards map
    * 1:1 onto training workers; (shard, pos) is the global order.
    */
  def shuffleShards(df: DataFrame, idCol: String, salt: String,
                    shards: Int = 16): DataFrame = {
    require(shards > 0, "shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    df.select(col(idCol),
        md5(concat(col(idCol).cast("string"), lit(":" + salt))).as("h"))
      .withColumn("shard",
        (conv(substring(col("h"), 1, 8), 16, 10).cast("bigint") % shards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Token-budget sequence packing, concat-and-chunk style: documents are
    * laid out in a deterministic order into a per-shard token stream and
    * the stream is chunked every `budget` tokens; each document's bin is
    * the chunk its FIRST token lands in. This is the packing used to build
    * fixed-length LLM pretraining batches from variable-length documents.
    *
    * Scale shape: a single global ordering would funnel the running sum
    * through one window task, so packing parallelizes across `shards`
    * deterministic shards (`id % shards` — engine-portable, no hash
    * function dependency): one shuffle on shard, each shard's cumulative
    * sum an independent window. Shards map 1:1 onto training workers, so
    * per-shard streams are exactly what a sharded data loader consumes.
    *
    * Returns (id, shard, tokens, bin); deterministic given the id order.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
                    budget: Long, shards: Int = 8): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
    df.select(col(idCol), (col(idCol) % shards).as("shard"),
        tokensCol.cast("bigint").as("tokens"))
      .withColumn("bin",
        floor((sum(col("tokens")).over(w) - col("tokens")) / budget))
  }

  /** No-split greedy (next-fit) sequence packing: documents are laid out
    * per shard in deterministic id order and appended to the current bin
    * while they fit; a document that would overflow `budget` CLOSES the
    * bin and opens the next one. Unlike [[packSequences]]' concat-and-chunk
    * (the pretraining layout, which slices documents across chunk
    * boundaries), no document is ever split — the layout used for
    * SFT / instruction-tuning batches where an example must stay whole.
    * Documents longer than `budget` cannot be packed at all and are
    * EXCLUDED here; [[packEfficiency]] counts them per shard.
    *
    * Scale shape: one hash shuffle on shard, then a LINEAR scan per shard
    * (`sortWithinPartitions` + a per-partition running (bin, used) fold —
    * the running state resets at shard boundaries, so co-resident shards
    * in one task are still independent streams). The fold is inherently
    * sequential PER SHARD — that is the contract (bins are defined by the
    * stream order) — and parallel ACROSS shards; at 100 TB pick `shards`
    * so one shard ≈ one training worker's stream, exactly the parallelism
    * the consumer has anyway.
    *
    * Returns (id, shard, tokens, bin, bin_used) with `bin_used` the running
    * fill AFTER placing the document; deterministic given ids.
    */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: Column,
                 budget: Long, shards: Int = 8): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shards > 0, "shards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val prepped = df
      .select(col(idCol).cast("long").as("id"),
        (col(idCol) % shards).cast("int").as("shard"),
        tokensCol.cast("bigint").as("tokens"))
      .filter(col("tokens") <= budget)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
    prepped.as[(Long, Int, Long)].mapPartitions { it =>
      var curShard = Int.MinValue
      var bin = 0L
      var used = 0L
      it.map { case (id, shard, tokens) =>
        if (shard != curShard) { curShard = shard; bin = 0L; used = 0L }
        if (used + tokens > budget) { bin += 1; used = 0L }
        used += tokens
        (id, shard, tokens, bin, used)
      }
    }.toDF(idCol, "shard", "tokens", "bin", "bin_used")
  }

  /** Per-shard audit of [[packGreedy]]: bins opened, documents packed,
    * token fill percentage (basis points, exact integers), and the count
    * of documents longer than `budget` that no-split packing had to drop.
    * The fill number is the padding waste a trainer pays per shard —
    * next-fit's fill is provably >= 50% (two consecutive bins hold more
    * than `budget` between them), and the audit makes the actual figure
    * visible so a packing budget mismatch (tiny docs, huge budget — or
    * the reverse) is caught before a 100 TB layout job runs.
    */
  def packEfficiency(df: DataFrame, idCol: String, tokensCol: Column,
                     budget: Long, shards: Int = 8): DataFrame = {
    val packed = packGreedy(df, idCol, tokensCol, budget, shards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("packed_docs"),
        (max(col("bin")) + 1).as("bins"),
        sum(col("tokens")).as("packed_tokens"))
    val skipped = df
      .select((col(idCol) % shards).cast("int").as("shard"),
        tokensCol.cast("bigint").as("tokens"))
      .filter(col("tokens") > budget)
      .groupBy(col("shard")).agg(count(lit(1)).as("skipped_long"))
    packed.join(skipped, Seq("shard"), "left")
      .select(col("shard"), col("packed_docs"), col("bins"),
        col("packed_tokens"),
        expr(s"packed_tokens * 10000 div (bins * ${budget}L)").as("fill_bp"),
        coalesce(col("skipped_long"), lit(0L)).as("skipped_long"))
  }

  /** Token-budget mixture sampling — the "data recipe" materialization
    * step of a pretraining pipeline: after [[domainMixture]] decides how
    * many tokens each domain contributes, actually pick the documents.
    * Per domain, documents are laid out in a deterministic pseudo-random
    * order (md5 of `"<id>:<salt>"` — a new salt is a fresh draw, the same
    * salt replays byte-identically on any engine) and kept until the
    * cumulative token count reaches `budgetTokens`; the document that
    * crosses the boundary is kept, so the budget is met, never
    * undershot (domains smaller than the budget are taken whole). All
    * arithmetic is exact integers on token counts — no `rand()`, no
    * floats — so the picked set is oracle-checkable and identical across
    * runs, engines, and partitionings.
    *
    * Scale shape: pure map-side projection, then ONE hash shuffle on
    * domain for the per-domain running-sum window — domains cumulate in
    * parallel, no global sort. Skewed domains put one domain in one
    * window task; at 100 TB feed domains through [[packSequences]]-style
    * sharding first if a single domain dominates the corpus (the budget
    * cut usually bites long before that matters).
    *
    * Returns (domain, id, tokens, cum) for the kept documents.
    */
  def budgetSample(df: DataFrame, domainCol: String, idCol: String,
                   tokensCol: Column, budgetTokens: Long,
                   salt: String = "mix0"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain")).orderBy(col("h"), col(idCol))
    df.select(col(domainCol).as("domain"), col(idCol),
        tokensCol.cast("bigint").as("tokens"),
        md5(concat(col(idCol).cast("string"), lit(s":$salt"))).as("h"))
      .withColumn("cum", sum(col("tokens")).over(w))
      // kept iff the budget was not already met before this row
      .filter(col("cum") - col("tokens") < budgetTokens)
      .select(col("domain"), col(idCol), col("tokens"), col("cum"))
  }

  /** Leakage-safe train/valid/test split: assign splits at the NEAR-DUP
    * CLUSTER level, so no pair of near-duplicate documents ever straddles
    * a split boundary — the eval-set integrity guarantee a plain per-doc
    * hash split cannot give (a doc and its fuzzy copy would land in train
    * and test ~32% of the time at 80/10/10, silently inflating eval
    * scores). `pairs` is any near-dup edge list `(a, b)` — minhash-LSH
    * verified pairs, simhash hamming pairs, embedding near-dups; docs in
    * no pair are singleton clusters keyed by their own id, so the
    * assignment rule degenerates to [[withSplit]] exactly when the pair
    * set is empty.
    *
    * Scale shape: [[Dedup.connectedComponents]] runs on the PAIR GRAPH
    * only (tiny vs the corpus — near-dup rates are single-digit
    * percents), then ONE left broadcast-or-shuffled join decorates the
    * corpus with cluster ids; the split itself is the same map-side md5
    * bucket as [[withSplit]], replayable on any engine.
    *
    * Returns docs' id column + (cluster_id, split).
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    val clusters = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("cluster_id"))
    val withCluster = docs.select(col(idCol))
      .join(clusters, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
    withSplit(withCluster, "cluster_id", trainPct, validPct)
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score raw-pool
    * documents by how much their HASHED-token profile resembles a small
    * curated target corpus rather than the raw pool itself, then keep
    * the top slice per language.
    *
    * Exact-integer rendition of the published recipe: tokens hash into
    * `buckets` md5 buckets (DSIR's hashed n-gram feature space, portable
    * across engines); each distribution is frozen as integer
    * parts-per-million `cnt * 1_000_000 div total`; a doc's score is the
    * exact BIGINT `Σ_b n_b · (ppm_target(b) − ppm_raw(b))` — the
    * linearized importance log-ratio (first-order in the probability
    * gap), chosen over float `Σ n_b · log(p_t/p_r)` so the whole
    * pipeline replays bit-for-bit in any SQL engine. Selection is the
    * CCNet-style per-language quartile: `kept = 1` on the top
    * `keepQuartiles` of 4, ties broken by id.
    *
    * Scale shape: ONE corpus scan tokenizes and partial-aggregates to
    * (doc, bucket, n) — text never shuffles, the doc-bucket profile is
    * the only wide intermediate (≤ min(doc tokens, buckets) rows per
    * doc, localCheckpointed so the distribution pass and the scoring
    * pass share it). The two frozen distributions collapse to a
    * `buckets`-row table that BROADCASTS back onto the profile; per-doc
    * scores are one partial-agg'd groupBy; the quartile window
    * partitions by language (the d_ppl_buckets shape — no global-sort
    * funnel). ppm ≤ 1e6 and per-doc token mass bound the score at
    * ~1e6 · |doc|, overflow-free at any corpus size.
    *
    * Returns (idCol, langCol, score, kept) over the RAW pool (target
    * rows are the reference distribution, not candidates).
    */
  /** Portable md5 token bucket — DSIR's hashed feature space: the first
    * 6 hex chars of md5(token) mod `buckets`, computable bit-identically
    * in any engine (and in the streaming scorer's JVM-side digest).
    */
  def dsirBucket(token: Column, buckets: Int): Column =
    conv(substring(md5(token), 1, 6), 16, 10).cast("bigint") % buckets

  /** The frozen DSIR distribution table on its own: (b, pt, pr) integer
    * parts-per-million of each hashed-token bucket under the target and
    * raw distributions. [[dsirSelect]] derives the same table inline
    * from its doc-bucket profile; this standalone form is what a
    * production pipeline FREEZES after training so later batches (or a
    * stream — [[graft.streaming.EventStream.streamingDsirScore]]) score
    * against it with no count pass, the `d_lm_score_frozen` contract.
    * One token explode + one `buckets`-row groupBy; totals broadcast.
    */
  def dsirDistribution(df: DataFrame, textCol: String, isTarget: Column,
                       buckets: Int = 512): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      x => length(x) > 0)
    val dist = df.select(isTarget.as("is_t"), explode(toks).as("t"))
      .select(col("is_t"), dsirBucket(col("t"), buckets).as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("tc"),
        sum(when(!col("is_t"), 1L).otherwise(0L)).as("rc"))
    val tot = dist.agg(sum(col("tc")).as("tt"), sum(col("rc")).as("tr"))
    dist.crossJoin(broadcast(tot))
      .select(col("b"),
        expr("tc * 1000000 div tt").as("pt"),
        expr("rc * 1000000 div tr").as("pr"))
  }

  def dsirSelect(df: DataFrame, idCol: String, langCol: String,
                 textCol: String, isTarget: Column, buckets: Int = 512,
                 keepQuartiles: Int = 1): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      x => length(x) > 0)
    val profile = df
      .select(col(idCol), isTarget.as("is_t"), explode(toks).as("t"))
      .select(col(idCol), col("is_t"),
        dsirBucket(col("t"), buckets).as("b"))
      .groupBy(col(idCol), col("is_t"), col("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val dist = profile.groupBy(col("b"))
      .agg(sum(when(col("is_t"), col("n")).otherwise(0L)).as("tc"),
        sum(when(!col("is_t"), col("n")).otherwise(0L)).as("rc"))
    val tot = dist.agg(sum(col("tc")).as("tt"), sum(col("rc")).as("tr"))
    val ppm = dist.crossJoin(broadcast(tot))
      .select(col("b"),
        expr("tc * 1000000 div tt").as("pt"),
        expr("rc * 1000000 div tr").as("pr"))
    val scored = df.filter(!isTarget)
      .select(col(idCol), col(langCol))
      .join(profile.filter(!col("is_t")).join(broadcast(ppm), Seq("b"))
          .select(col(idCol), (col("n") * (col("pt") - col("pr"))).as("c")),
        Seq(idCol), "left")
      .groupBy(col(idCol), col(langCol))
      .agg(coalesce(sum(col("c")), lit(0L)).cast("bigint").as("score"))
    val w = Window.partitionBy(col(langCol))
      .orderBy(desc("score"), asc(idCol))
    scored.withColumn("kept",
      (ntile(4).over(w) <= keepQuartiles).cast("int"))
  }
}
