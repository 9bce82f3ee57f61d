package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means in EXACT INTEGER arithmetic — the training
  * half of the IVF family done as a graded, cross-engine-checkable
  * iterate (the stored-IVF path trains its codebook from a driver-side
  * sample; this is the full-corpus Lloyd step a 100 TB vector ingest
  * would actually run).
  *
  * Exactness contract: embeddings are quantized ONCE to
  * `round(x·10^6) + offset` BIGINTs. The common offset cancels in every
  * squared distance, and choosing it ≥ the value range keeps all
  * coordinates — and therefore all centroid-update sums — NON-NEGATIVE,
  * where floor division and truncating division coincide, so Spark's
  * `div` and any SQL engine's integer division agree bit-for-bit.
  * Squared distances stay < 10^15 (64 dims × (4·10^6)²) — exact in a
  * long AND in a double, so an engine computing them via float dot
  * products gets the identical total. Assignment ties break on the
  * smaller centroid index; every round is then a pure function of the
  * data, unrollable as SQL CTEs.
  *
  * Scale shape per round: assignment is MAP-SIDE (centroids are a
  * broadcast k×d literal folded into a codegen'd least-of-structs
  * argmin — no join, no shuffle); the update is one posexplode +
  * partially-aggregated groupBy(cluster, dim) of k·d cells, collected
  * to the driver (k·d longs — bounded at any corpus size). The corpus
  * is scanned once per round and never shuffled.
  */
object Clustering {

  /** Map-side quantization: (round(x·scale) + offset) as array<bigint>.
    * `offset` must bound |x|·scale so every coordinate is non-negative —
    * the floor==truncate cross-engine exactness of `update` depends on it.
    * The contract is ENFORCED map-side: a coordinate that would quantize
    * negative (|x| > offset/scale, i.e. outside [-2, 2] at the defaults)
    * raises instead of silently producing engine-divergent `div` results.
    */
  def quantize(vec: Column, scale: Long = 1000000L,
               offset: Long = 2000000L): Column =
    transform(vec.cast("array<double>"), x => {
      val v = round(x * scale).cast("long") + offset
      when(v < 0, raise_error(concat(
        lit(s"quantize: |x|*$scale exceeds offset $offset (x="),
        x.cast("string"), lit(") — widen offset or rescale inputs"))))
        .otherwise(v)
    })

  /** Squared L2 distance between a quantized column and a centroid
    * literal — an exact integer fold. */
  private def dist2(q: Column, c: Seq[Long]): Column =
    aggregate(
      zip_with(q, typedlit(c), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** One assignment pass: cluster = argmin centroid by (dist², index).
    * Centroids fold into the plan as literals — no join, map-side only.
    */
  def assign(df: DataFrame, idCol: String, qCol: String,
             centroids: Seq[(Int, Seq[Long])]): DataFrame = {
    require(centroids.nonEmpty)
    val cands = centroids.map { case (i, c) =>
      struct(dist2(col(qCol), c).as("d"), lit(i).as("c"))
    }
    val best =
      if (cands.size == 1) cands.head else least(cands: _*)
    df.select(col(idCol), col(qCol), best.getField("c").as("cluster"))
  }

  /** One centroid update: per-(cluster, dim) integer mean with floor
    * division (non-negative by the quantization contract). Returns the
    * surviving centroids — a cluster that captured no rows vanishes,
    * identically to the SQL spelling. Collects k·d cells.
    */
  def update(assigned: DataFrame, qCol: String): Seq[(Int, Seq[Long])] = {
    val cells = assigned
      .select(col("cluster"), posexplode(col(qCol)).as(Seq("dim", "x")))
      .groupBy(col("cluster"), col("dim"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .select(col("cluster"), col("dim"), expr("s div n").as("x"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    cells.groupBy(_._1).toSeq.sortBy(_._1).map { case (cl, xs) =>
      (cl, xs.sortBy(_._2).map(_._3).toSeq)
    }
  }

  /** Full Lloyd iterate: seeds are the rows with `idCol` < k (cluster
    * index = seed id — a deterministic rule any engine reproduces),
    * `iters` rounds of assign + update, final assignment returned as
    * (idCol, cluster). The k·d seed/update collects are bounded; the
    * corpus never shuffles for assignment.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int, scale: Long = 1000000L,
             offset: Long = 2000000L): DataFrame = {
    require(k >= 1 && iters >= 1)
    val q = df.select(col(idCol), quantize(col(vecCol), scale, offset).as("__q"))
      .localCheckpoint() // scanned once per round; quantize runs once
    var centroids: Seq[(Int, Seq[Long])] = q
      .filter(col(idCol) < k).orderBy(col(idCol))
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Long](1).toSeq)).toSeq
    // seed contract: idCol is a LongType id space containing 0..k-1, each
    // seeding the centroid of its own index — a deterministic rule any
    // engine reproduces. Fail loudly if seeds are missing or duplicated.
    require(centroids.map(_._1) == (0 until k),
      s"kmeans: seed rows with $idCol = 0..${k - 1} must each exist " +
        s"exactly once (found ids ${centroids.map(_._1).mkString(",")})")
    var out: DataFrame = null
    for (_ <- 0 until iters) {
      out = assign(q, idCol, "__q", centroids)
      centroids = update(out, "__q")
    }
    // final labels come from the LAST assignment (iters assign passes,
    // iters-1 completed updates feeding the next assign — the classic
    // "assign, update, reassign" unrolling ends on an assignment)
    assign(q, idCol, "__q", centroids).select(col(idCol), col("cluster"))
  }
}
