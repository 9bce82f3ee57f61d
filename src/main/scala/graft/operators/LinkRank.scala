package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-based corpus ranking — the PageRank-family signal web-corpus
  * curation uses to pick which pages are worth keeping (harmonic/centrality
  * filtering in Common-Crawl-scale pipelines).
  *
  * Computed in FIXED-POINT INTEGER arithmetic on purpose: float PageRank is
  * never bit-reproducible across engines (per-group summation order), but
  * scaled-BIGINT ranks with floor division make every iteration an
  * order-independent integer sum — the whole iterate is hash-checkable
  * against any SQL engine, the same determinism discipline as the md5
  * sampling/split operators.
  *
  * Scale shape: each iteration is one join of the edge list against the
  * current ranks (both keyed by src — co-partitioned if the edge table is
  * bucketed by src at ingest, see [[Layout.writeBucketed]]) plus one
  * partial-aggregable groupBy(dst). No driver-side state; lineage is
  * truncated per round like the connected-components iterate. Dangling
  * mass (nodes with no out-edges) is dropped rather than redistributed —
  * documented, deterministic, and the common choice for ranking (only
  * relative order matters).
  *
  * Reference behavior: odpf/meteor has no graph operators; this supports
  * the training-data-pipeline mandate (corpus quality signals).
  */
object LinkRank {

  /** Exact triangle count over an UNDIRECTED graph given as directed
    * `edges(src, dst)` (direction ignored, self-loops dropped). The
    * scalable shape is degree orientation: orient every undirected edge
    * from the endpoint with smaller (degree, id) to the larger, so each
    * wedge a→b→c is enumerated at exactly one vertex and — the classic
    * bound — every vertex's oriented out-degree is O(√m), which caps the
    * wedge blow-up that a hub vertex causes under naive enumeration.
    * Wedges then semi-join the oriented edge set: one row per triangle,
    * counted once. Returns a 1-row frame (n_nodes, n_edges, n_wedges,
    * n_triangles) — all exact BIGINTs.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src").cast("long").as("a"),
        col("dst").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("u").as("n")).union(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orientation key (degree, id): broadcast-joined twice onto the
    // (bounded, deduped) edge list, never onto wedges
    val du = deg.select(col("n").as("u"), col("d").as("du"))
    val dv = deg.select(col("n").as("v"), col("d").as("dv"))
    val oriented = und.join(du, Seq("u")).join(dv, Seq("v"))
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
      .localCheckpoint()
    val wedges = oriented.select(col("s").as("w_a"), col("t").as("w_b"))
      .join(oriented.select(col("s").as("w_b"), col("t").as("w_c")), Seq("w_b"))
    val tri = wedges.join(oriented,
        wedges("w_a") === oriented("s") && wedges("w_c") === oriented("t"),
        "left_semi")
    // one lazy plan: four 1-row aggregates cross-joined (each is a
    // partial-agg count; the crossJoins are 1-row broadcasts)
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(wedges.agg(count(lit(1)).as("n_wedges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }

  /** Iterate PageRank over `edges(src, dst)` (longs, self-loops allowed
    * but pointless). Returns `(node, rank_fp)` where rank_fp is the rank
    * scaled by `scale` (init = 1.0 ⇒ `scale`; damping 0.85 in integer
    * form: next = (15·scale + 85·Σ floor(rank/outdeg)) div 100).
    */
  /** HITS hubs & authorities over `edges(src, dst)` — the second classic
    * link signal next to [[pageRank]]: authorities are pages good links
    * point AT, hubs are pages that point at good authorities (Kleinberg
    * 1999). Same fixed-point-integer discipline as pageRank: each half-step
    * is an order-independent BIGINT sum over the edge list, and the
    * normalization divides by the round's MAX (not the L2 norm — max is
    * order-independent and keeps every value ≤ `scale`, so no product in
    * the iterate can overflow: s ≤ maxdeg·scale, s·scale ≤ 2⁶³ for any
    * realistic degree). Max-normalized HITS converges to the same
    * principal-eigenvector RANKING as the L2 spelling — only the
    * per-round scaling differs, and ranking is what the signal is for.
    *
    * Scale shape per round: two edge⋈score joins + two partial-agg
    * groupBys + two 1-row max aggregates broadcast back; lineage truncated
    * per round like [[pageRank]] and the CC iterate.
    */
  def hits(edges: DataFrame, iters: Int = 3,
           scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && scale > 0)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    var hubs = nodes.select(col("node"), lit(scale).as("hub_fp"))
    var auths = nodes.select(col("node"), lit(scale).as("auth_fp"))
    def normalized(raw: DataFrame, valCol: String): DataFrame = {
      // raw: (node, s) summed over the half-step; nodes missing from raw
      // (no in-/out-edges) score 0; divide by the round max, floor
      val full = nodes.join(raw, Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0L)).as("s"))
      val m = full.agg(max(col("s")).as("m"))
      full.crossJoin(broadcast(m))
        .select(col("node"),
          expr(s"(s * $scale) div nullif(m, 0)").as(valCol))
        .localCheckpoint(eager = false)
    }
    for (_ <- 0 until iters) {
      val araw = e.join(hubs, e("src") === hubs("node"))
        .select(col("dst").as("node"), col("hub_fp"))
        .groupBy("node").agg(sum(col("hub_fp")).as("s"))
      auths = normalized(araw, "auth_fp")
      val hraw = e.join(auths, e("dst") === auths("node"))
        .select(col("src").as("node"), col("auth_fp"))
        .groupBy("node").agg(sum(col("auth_fp")).as("s"))
      hubs = normalized(hraw, "hub_fp")
    }
    auths.join(hubs, Seq("node"))
      .select(col("node"), col("auth_fp"), col("hub_fp"))
  }

  def pageRank(edges: DataFrame, iters: Int = 4,
               scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && scale > 0)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // materialize the degree-annotated edge list and node set ONCE (the CC
    // iterate's pattern): every round joins against them, and without the
    // checkpoint each round re-runs the scan + distinct + degree groupBy
    val withDeg = e.join(outdeg, "src").localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    var ranks = nodes.select(col("node"), lit(scale).as("rank_fp"))
    for (_ <- 0 until iters) {
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst").as("node"), expr("rank_fp div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"(${15L * scale} + 85 * coalesce(s, 0L)) div 100").as("rank_fp"))
        .localCheckpoint(eager = false) // truncate the per-round lineage
    }
    ranks
  }

  /** Multi-source breadth-first hop distance, capped at `maxHops`:
    * for every node reachable from `sources(node)` within `maxHops`
    * edge traversals, the MINIMUM number of hops. Exact integers —
    * hash-checkable against a recursive-CTE spelling in any SQL engine.
    *
    * The distributed shape is frontier expansion with visited-set
    * pruning: each round joins only the CURRENT frontier (nodes first
    * discovered last round) against the edge list, then anti-joins the
    * visited set, so a node's neighbors are expanded exactly once no
    * matter how many paths reach it — total work is O(edges touched),
    * not O(paths) like the naive recursive unrolling. Per round: one
    * frontier⋈edges join (edge list keyed by src — co-partitioned if
    * bucketed by src at ingest), one dedup, one anti-join; lineage
    * truncated per round like the CC/PageRank iterates. At 100 TB the
    * frontier is the small side once the wave saturates — broadcast
    * candidates, while the edge list never moves.
    */
  def bfsHops(edges: DataFrame, sources: DataFrame,
              maxHops: Int = 4): DataFrame = {
    require(maxHops >= 0)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    var visited = sources.select(col("node").cast("long").as("node"))
      .distinct().select(col("node"), lit(0).as("hops"))
      .localCheckpoint()
    var frontier = visited
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      val next = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("hops"))
        .localCheckpoint()
      visited = visited.unionAll(next).localCheckpoint(eager = false)
      frontier = next
    }
    visited
  }

  /** Weighted shortest-path distances from `sources(node)` using at
    * most `maxEdges` edge traversals — the distributed Bellman–Ford
    * relaxation. Weights are exact BIGINTs, so every distance is an
    * order-free integer min: hash-checkable against a recursive-CTE
    * path enumeration capped at the same edge budget.
    *
    * The scale story is the IMPROVED-ONLY frontier: a round relaxes
    * only edges out of nodes whose distance dropped last round, with a
    * per-round partial min on the candidate side before the merge —
    * so a converged region stops costing anything, and each round is
    * one frontier⋈edges join + two partial-aggregable mins. The naive
    * relax-everything round (|E| work × rounds regardless of progress)
    * is what this avoids. Lineage truncated per round.
    */
  def ssspDistances(edges: DataFrame, sources: DataFrame,
                    maxEdges: Int = 4): DataFrame = {
    require(maxEdges >= 0)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .localCheckpoint()
    var dist = sources.select(col("node").cast("long").as("node"))
      .distinct().select(col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = dist
    var r = 0
    while (r < maxEdges && !frontier.isEmpty) {
      r += 1
      val cand = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("d"))
        .groupBy(col("node")).agg(min(col("d")).as("d"))
      val improved = cand.join(dist, Seq("node"), "left")
        .filter(col("dist").isNull || col("d") < col("dist"))
        .select(col("node"), col("d").as("dist"))
        .localCheckpoint()
      dist = dist.join(improved.select(col("node")), Seq("node"), "left_anti")
        .unionAll(improved)
        .localCheckpoint(eager = false)
      frontier = improved
    }
    dist
  }

  /** Synchronous label-propagation community detection, made
    * DETERMINISTIC (asynchronous LPA is famously order-dependent):
    * every node starts labeled with its own id; each round, all nodes
    * simultaneously adopt the most frequent label among their
    * undirected neighbors, ties broken by the SMALLEST label. Fixed
    * `iters` rounds — exact integers end to end, so the final labeling
    * is hash-checkable against an unrolled SQL spelling of the same
    * rounds. The node set defaults to the nodes INCIDENT to an edge —
    * degree-0 nodes are then absent from the output; pass `nodesOpt`
    * (a df with a `node` column) to carry isolated nodes through, each
    * keeping its own id as its label.
    *
    * Scale shape per round: one neighbor⋈labels join + one
    * (node, label) count groupBy + one argmax groupBy — the argmax is
    * `max(struct(count, -label))`, a plain partial-aggregable aggregate,
    * NOT a per-node window sort. Lineage truncated per round. The
    * symmetric neighbor list is materialized once.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 3,
                       nodesOpt: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1)
    val d = edges.select(col("src").cast("long").as("a"),
        col("dst").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val nbr = d.unionAll(d.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    val nodes = nodesOpt
      .map(_.select(col("node").cast("long").as("node")).distinct())
      .getOrElse(nbr.select(col("a").as("node")).distinct())
      .localCheckpoint()
    var labels = nodes.select(col("node"), col("node").as("lbl"))
    for (_ <- 0 until iters) {
      val votes = nbr.join(labels, nbr("b") === labels("node"))
        .groupBy(nbr("a").as("node"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("lbl"))
      // every node has ≥1 neighbor by construction of nbr, but keep the
      // isolated-node fallback explicit for callers passing presplit sets
      labels = nodes.join(votes, Seq("node"), "left")
        .select(col("node"), coalesce(col("lbl"), col("node")).as("lbl"))
        .localCheckpoint(eager = false)
    }
    labels
  }

  /** k-core membership by synchronous peeling: each round drops every
    * node whose degree AMONG SURVIVORS is < k, iterated TO FIXPOINT — the
    * classical dense-subgraph extractor (spam-farm / botnet subgraph
    * detection next to LPA's communities). Stability is detected from the
    * per-round survivor COUNT: peeling is monotone (survivor sets only
    * shrink), so an unchanged count IS an unchanged set, and the loop
    * exits as soon as a round removes nothing. `rounds` is a safety
    * budget, not the answer's shape: if the peel chain is still shrinking
    * when the budget runs out, kCore THROWS instead of silently returning
    * a superset of the true core (the round-9 contract weakness). Rounds
    * past the fixpoint are no-ops, so the SQL twin can unroll any
    * sufficient count and agree exactly.
    *
    * Scale shape per round: two survivor semi-joins against the
    * symmetric edge list + one degree groupBy — frontier-style lineage
    * truncation like BFS/LPA; edges partition by endpoint, nothing
    * corpus-sized crosses one task. The per-round count() is an action on
    * the just-checkpointed KB-sized survivor frame — the materialization
    * the next round forces anyway. Returns (node, core_deg) for the
    * surviving nodes with their within-core degree.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 6): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val d = edges.select(col("src").cast("long").as("a"),
        col("dst").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val nbr = d.unionAll(d.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    def peel(alive: DataFrame): DataFrame = nbr
      .join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
      .select(col("node"))
      .localCheckpoint(eager = false)
    var alive = nbr.select(col("a").as("node")).distinct()
      .localCheckpoint(eager = false)
    var prev = alive.count()
    var stable = false
    var round = 0
    while (!stable && round < rounds) {
      alive = peel(alive)
      val n = alive.count()
      stable = n == prev
      prev = n
      round += 1
    }
    if (!stable && peel(alive).count() != prev)
      throw new IllegalStateException(
        s"kCore(k=$k) did not reach fixpoint within rounds=$rounds " +
          s"($prev survivors still shrinking); raise the budget")
    nbr.join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("core_deg"))
      .filter(col("core_deg") >= k)
  }
}
