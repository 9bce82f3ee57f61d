package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset pair mining (market-basket co-occurrence) — the
  * association signal behind "parts ordered together" / "docs citing the
  * same pair of sources" analyses, and the building block of FP-growth
  * style rule miners.
  *
  * Exact counts only: the result carries the raw integers (pair count,
  * each item's basket count, total baskets) instead of float
  * support/lift, so every row is bit-reproducible cross-engine and the
  * caller derives whichever ratio it wants.
  *
  * Scale shape — the a-priori prune is the whole point: items below
  * `minItemSupport` cannot appear in a frequent pair, so baskets are
  * semi-joined down to frequent items BEFORE the quadratic per-basket
  * pair expansion. A hub basket of b items still expands b²/2, so
  * `maxBasketItems` drops oversized baskets (counted in the companion
  * audit, never silently) — the same bounded-bucket discipline as the
  * LSH band caps. The expansion itself is a sorted-array self-pair
  * (one shuffle to group the basket, map-side pair emit), then one
  * partial-aggregable groupBy(pair).
  *
  * Reference behavior: odpf/meteor has no itemset mining; this supports
  * the training-data-pipeline mandate (co-occurrence statistics).
  */
object Baskets {

  /** Pairs of distinct items co-occurring in `minPairSupport`+ baskets,
    * among items that themselves occur in `minItemSupport`+ baskets.
    * Input: one row per (basket, item) — duplicates tolerated (deduped).
    * Output: (item_a, item_b, pair_cnt, cnt_a, cnt_b, n_baskets) with
    * item_a < item_b, all exact BIGINTs.
    *
    * Prune semantics: the item filter is part of the CONTRACT, not just an
    * optimization. When minItemSupport <= minPairSupport it is a lossless
    * a-priori prune (an item in a qualifying pair has count >=
    * minPairSupport). When minItemSupport > minPairSupport it deliberately
    * ALSO drops pairs containing an infrequent item — identical to
    * post-filtering the unpruned output on cnt_a/cnt_b >= minItemSupport
    * (pair counts are unaffected by removing other items, so prune-first
    * and post-filter agree; BasketsSpec pins that equality).
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
                    minItemSupport: Long = 2L, minPairSupport: Long = 2L,
                    maxBasketItems: Int = 1000): DataFrame = {
    val b = df.select(col(basketCol).cast("long").as("basket"),
      col(itemCol).cast("long").as("item")).distinct()
    // a-priori: item counts once, frequent set broadcast back as a filter
    val itemCnt = b.groupBy(col("item"))
      .agg(count(lit(1)).as("cnt")).localCheckpoint()
    val frequent = itemCnt.filter(col("cnt") >= minItemSupport)
    val pruned = b.join(frequent.select("item"), Seq("item"), "left_semi")
    // per-basket sorted item array; oversized baskets dropped (audited
    // via basketAudit, not silently inlined here)
    val baskets = pruned.groupBy(col("basket"))
      .agg(sort_array(collect_list(col("item"))).as("items"))
      .filter(size(col("items")).between(2, maxBasketItems))
    // map-side ordered-pair emit: items is sorted, so i<j gives a<b
    val pairs = baskets.select(explode(expr(
      """flatten(transform(items, (a, i) ->
        |  transform(slice(items, i + 2, size(items)),
        |            b -> struct(a AS item_a, b AS item_b))))"""
        .stripMargin)).as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minPairSupport)
    val total = b.select(col("basket")).distinct().agg(count(lit(1)).as("n_baskets"))
    // no broadcast hint on the item-count joins: the item vocabulary can
    // be catalog-sized at 100 TB; AQE broadcasts when it actually fits
    pairs
      .join(itemCnt.select(col("item").as("item_a"), col("cnt").as("cnt_a")), Seq("item_a"))
      .join(itemCnt.select(col("item").as("item_b"), col("cnt").as("cnt_b")), Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"), col("n_baskets"))
  }
}
