package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mondrian k-anonymity partitioning (LeFevre et al.'s greedy
  * multidimensional scheme, single-candidate-dim variant): recursively
  * median-cut the 2-D quasi-identifier space, applying a cut only when
  * BOTH halves keep ≥ k rows, so every leaf is a k-anonymous
  * equivalence class whose (min..max) dim ranges are the published
  * generalization. The audit complement of `q_kanon_audit` — that
  * measures violations, this CONSTRUCTS a partition with none.
  *
  * Determinism contract (the whole point of this spelling): cut dim =
  * the larger value RANGE (ties → x); cut value = the region's LOWER
  * MEDIAN, read at rank (n+1) div 2 under (value, id) order; left =
  * rows ≤ median. Every decision is integer-exact, so the full
  * recursion unrolls as SQL CTEs and the leaf table is hash-checkable.
  *
  * Scale shape per level: region stats and medians are one
  * region-partitioned window + two bounded groupBys (≤ 2^level region
  * rows broadcast back); rows keep their region id as a column — no
  * driver-side recursion over data, depth × one exchange total.
  */
object Mondrian {

  /** Returns (idCol, x, y, region) after `depth` levels of allowable
    * median cuts with minimum class size `k`. Region ids encode the cut
    * path (root 1, left 2r, right 2r+1). */
  def partition(df: DataFrame, idCol: String, xCol: String, yCol: String,
                k: Int, depth: Int): DataFrame = {
    require(k >= 1 && depth >= 0)
    var cur = df.select(col(idCol).as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
        lit(1L).as("region"))
      .localCheckpoint() // re-read once per level
    for (_ <- 0 until depth) {
      val stats = cur.groupBy(col("region"))
        .agg(count(lit(1)).as("n"),
          (max(col("x")) - min(col("x"))).as("rx"),
          (max(col("y")) - min(col("y"))).as("ry"))
        .select(col("region"), col("n"),
          when(col("rx") >= col("ry"), "x").otherwise("y").as("dim"))
      val withCv = cur.join(broadcast(stats), Seq("region"))
        .withColumn("cv",
          when(col("dim") === "x", col("x")).otherwise(col("y")))
      val w = Window.partitionBy(col("region"))
        .orderBy(col("cv"), col("id"))
      val ranked = withCv.withColumn("rn", row_number().over(w))
      val med = ranked.filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("region"), col("cv").as("med"))
      val sides = ranked.join(broadcast(med), Seq("region"))
        .withColumn("side", when(col("cv") <= col("med"), 0L).otherwise(1L))
      val allow = sides.groupBy(col("region"))
        .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("ln"),
          count(lit(1)).as("nn"))
        .select(col("region"),
          (col("ln") >= k && (col("nn") - col("ln")) >= k).as("ok"))
      cur = sides.join(broadcast(allow), Seq("region"))
        .select(col("id"), col("x"), col("y"),
          when(col("ok"), col("region") * 2 + col("side"))
            .otherwise(col("region")).as("region"))
        .localCheckpoint(eager = false)
    }
    cur
  }

  /** The published generalization: per leaf region, its row count and
    * dim bounding box — every count ≥ k by construction. */
  def classes(partitioned: DataFrame): DataFrame =
    partitioned.groupBy(col("region"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
}
