package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesSketch

/** Exact distributed heavy hitters via the two-pass sketch-then-verify
  * pattern: a Misra–Gries candidate pass whose guarantee makes the exact
  * pass provably complete.
  *
  * Pass 1 streams every row through a k-counter [[graft.functions.MisraGries]]
  * sketch — partial aggregation keeps at most k counters per partition, so
  * the shuffle carries 32 sketches, not the token stream. Pass 2 counts
  * EXACTLY, but only rows matching the <= k candidates (an `isin` against a
  * broadcast literal list — map-side filter, partially-aggregated groupBy
  * over <= k distinct keys). Because any item with true frequency
  * > N/(k+1) is guaranteed present in the sketch, choosing a threshold
  * above that bound means the candidate set can't miss a qualifying item:
  * the final answer equals the single-pass exact `GROUP BY ... HAVING
  * count >= threshold` while never shuffling the raw stream.
  *
  * At 100 TB: the raw stream is ~10^13 tokens; the naive exact groupBy
  * shuffles all of it. Here the first pass shuffles k rows per partition
  * and the second shuffles only candidate matches after partial
  * aggregation (<= k keys x partitions).
  */
object HeavyHitters {

  /** One sketch pass: (candidate terms, total row count N). The collect is
    * a single row of <= k candidate strings — bounded driver memory by
    * construction.
    */
  def mgCandidates(rows: DataFrame, termCol: String, k: Int): (Seq[String], Long) = {
    val r = rows.agg(MisraGriesSketch(col(termCol), k).as("sk"),
      count(col(termCol)).as("n")).head()
    val cands = r.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    (cands, r.getLong(1))
  }

  /** Per-group exact heavy hitters — the grouped composition (e.g.
    * per-language stopword discovery): ONE grouped aggregate carries a
    * k-counter sketch per group (partial aggregation still bounds every
    * partition's state at k counters per group seen), the driver reads
    * |groups|·k candidates (bounded — groups are languages/sources, not
    * rows), and the exact pass joins the (group, term) stream against the
    * broadcast candidate table before counting. Thresholds are per-group:
    * ceil(minShare · N_g), each `require`d above N_g/(k+1) so per-group
    * completeness holds by the same argument as [[exact]].
    * Returns (groupCol: string, term, cnt). The group column is cast to
    * string up front (any input type works) and NULL is a real group —
    * both passes join null-safely, so heavy hitters under a null group
    * key are reported with a null `groupCol`, never silently dropped.
    */
  def exactPerGroup(rows: DataFrame, groupCol: String, termCol: String,
                    minShare: Double, k: Int): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast => bcast}
    val spark = rows.sparkSession
    import spark.implicits._
    val grouped = rows.select(
      col(groupCol).cast("string").as(groupCol), col(termCol).as("term"))
    val sk = grouped.groupBy(col(groupCol))
      .agg(MisraGriesSketch(col("term"), k).as("sk"),
        count(col("term")).as("n"))
      .collect()
    def grp(r: org.apache.spark.sql.Row): Option[String] =
      if (r.isNullAt(0)) None else Some(r.getString(0))
    val thresholds = sk.map { r =>
      val n = r.getLong(2)
      val thr = math.ceil(minShare * n).toLong
      require(n == 0 || thr.toDouble > n.toDouble / (k + 1),
        s"group ${r.get(0)}: threshold $thr <= N/(k+1) = ${n.toDouble / (k + 1)}")
      (grp(r), thr)
    }.toSeq
    val cands = sk.flatMap { r =>
      r.getSeq[org.apache.spark.sql.Row](1).map(c => (grp(r), c.getString(0)))
    }.toSeq
    if (cands.isEmpty)
      grouped.select(col(groupCol), col("term"), lit(0L).as("cnt"))
        .filter(lit(false))
    else {
      val candTbl = bcast(cands.toDF(groupCol, "term"))
      val thrTbl = bcast(thresholds.toDF(groupCol, "__thr"))
        .withColumnRenamed(groupCol, "__g")
      grouped
        .join(candTbl, grouped(groupCol) <=> candTbl(groupCol) &&
          grouped("term") === candTbl("term"), "left_semi")
        .groupBy(col(groupCol), col("term"))
        .agg(count(lit(1)).as("cnt"))
        .join(thrTbl, col(groupCol) <=> col("__g"))
        .filter(col("cnt") >= col("__thr"))
        .select(col(groupCol), col("term"), col("cnt"))
    }
  }

  /** Exact heavy hitters: every term whose true count is >= ceil(minShare
    * * N), with its exact count. `require`s the Misra–Gries soundness
    * condition ceil(minShare * N) > N/(k+1) so the candidate set provably
    * contains every qualifying term.
    */
  def exact(rows: DataFrame, termCol: String, minShare: Double,
            k: Int): DataFrame = {
    val (cands, n) = mgCandidates(rows, termCol, k)
    val thr = math.ceil(minShare * n).toLong
    require(n == 0 || thr.toDouble > n.toDouble / (k + 1),
      s"threshold $thr must exceed N/(k+1) = ${n.toDouble / (k + 1)} for " +
        s"the MG candidate set to be provably complete; raise k or minShare")
    if (cands.isEmpty)
      rows.select(col(termCol).as("term"), lit(0L).as("cnt")).filter(lit(false))
    else
      rows.filter(col(termCol).isInCollection(cands))
        .groupBy(col(termCol).as("term"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= thr)
  }
  /** Count-min sketch counter matrix over a term stream: `depth` (≤ 4)
    * rows of `width` counters, each occurrence incrementing one cell per
    * row. Bucket family: the 16 md5 bytes of ONE digest of the term split
    * into four 4-byte big-endian unsigned windows, each mod width — the
    * fused [[graft.functions.Md5Slices]] kernel digests once per
    * occurrence (the salted `md5("<d>:<term>")` spelling paid `depth`
    * digests plus four `conv` base conversions per row, and that chain
    * dominated the estimator's runtime), while staying bit-identical to
    * the relational SQL spelling
    * `conv(substr(md5(term), 8d+1, 8), 16, 10) % width` any engine
    * replays. Cells are RELATIONAL (d, c, n) rows, so the sketch is
    * oracle-checkable, unlike opaque sketch bytes. Scale shape: partial
    * aggregation collapses each partition's stream to ≤ depth·width cells
    * before the one shuffle; the full matrix is depth·width rows
    * (KiB-scale) and broadcastable.
    */
  def cmsCells(rows: DataFrame, termCol: String,
               depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth <= 4, "md5 has 16 bytes = four independent 4-byte slices")
    rows.select(posexplode(slice(graft.functions.Md5Slices(
        col(termCol).cast("string"), width), 1, depth)).as(Seq("d", "c")))
      .groupBy(col("d"), col("c")).agg(count(lit(1)).as("n"))
  }

  /** Point estimates for `terms` (small df with a `term` column) against a
    * cells matrix: cms_n = min over depth rows of the addressed counter
    * (same [[graft.functions.Md5Slices]] bucket family as [[cmsCells]]).
    * The CMS guarantee — an estimate NEVER undercounts — is an invariant a
    * spec asserts against exact counts. The cells side broadcasts.
    * The cells matrix only materializes NONZERO cells, so the probe side
    * LEFT-joins it and coalesces a missing counter to 0: an empty addressed
    * cell must contribute 0 to the min (a term absent from the stream
    * correctly reports cms_n = 0), not silently drop its depth row.
    */
  def cmsEstimate(cells: DataFrame, terms: DataFrame,
                  depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth <= 4, "md5 has 16 bytes = four independent 4-byte slices")
    val passthrough = terms.columns.filter(_ != "term").map(col).toSeq
    val probes = terms.select(col("term") +: passthrough: _*)
      .select((col("term") +: passthrough) :+
        posexplode(slice(graft.functions.Md5Slices(
          col("term").cast("string"), width), 1, depth)).as(Seq("d", "c")): _*)
    probes.join(broadcast(cells), Seq("d", "c"), "left")
      .groupBy((col("term") +: passthrough): _*)
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_n"))
  }
}
