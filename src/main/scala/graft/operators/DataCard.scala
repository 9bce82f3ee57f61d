package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus data-card maintenance — materialized-view delta
  * arithmetic for the per-(lang, source) corpus report.
  *
  * The card's additive measures (docs, token mass) would be trivially
  * incremental, but its DISTINCT-fingerprint column is not: distincts
  * don't subtract. The fix is the standard one — maintain the report's
  * *fingerprint-granular index* instead: one row per (lang, source, fp)
  * carrying the doc multiplicity and token mass. Every card column at
  * every rollup level derives from that index (`cardFromIndex`), and the
  * index itself updates with EXACT multiset arithmetic from a corpus
  * diff ([[applyDelta]]): removed/changed-old docs subtract, added/
  * changed-new docs add, zero-count rows vanish. Updating after a
  * release touches only the diff sliver — the historical corpus is never
  * re-tokenized — and incremental ≡ full-rescan is provable arithmetic
  * (the `d_card_incremental` oracle IS the rescan).
  *
  * Scale shape: the index is a stored layout (the fpindex contract, one
  * row per distinct (cell, fp)); deltas are map-side tokenize+fingerprint
  * over diff docs only, then one merge groupBy keyed like the index.
  */
object DataCard {

  private def fpRows(docs: DataFrame, langCol: String, srcCol: String,
                     textCol: String) =
    docs.select(col(langCol).as("lang"), col(srcCol).as("source"),
      TextAnalysis.tokenStats(col(textCol)).getField("n_tokens")
        .cast("long").as("tok"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))

  /** The fingerprint-granular card index: (lang, source, fp, cnt, tok). */
  def cardIndex(docs: DataFrame, langCol: String, srcCol: String,
                textCol: String): DataFrame =
    fpRows(docs, langCol, srcCol, textCol)
      .groupBy(col("lang"), col("source"), col("fp"))
      .agg(count(lit(1)).as("cnt"), sum(col("tok")).as("tok"))

  /** Exact multiset update: subtract `removed` docs, add `added` docs
    * (a changed doc appears on both sides with its old and new text).
    * Rows whose count reaches zero disappear, so the result is
    * bit-identical to rebuilding the index from the new corpus.
    */
  def applyDelta(index: DataFrame, removed: DataFrame, added: DataFrame,
                 langCol: String, srcCol: String, textCol: String): DataFrame = {
    def delta(docs: DataFrame, sign: Int) =
      fpRows(docs, langCol, srcCol, textCol)
        .select(col("lang"), col("source"), col("fp"),
          lit(sign.toLong).as("cnt"), (col("tok") * sign).as("tok"))
    index.select(col("lang"), col("source"), col("fp"), col("cnt"), col("tok"))
      .union(delta(removed, -1))
      .union(delta(added, 1))
      .groupBy(col("lang"), col("source"), col("fp"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("tok")).as("tok"))
      .filter(col("cnt") > 0)
  }

  /** Every rollup level of the card from the index alone — no corpus
    * scan: docs = Σ cnt, tokens = Σ tok, unique = distinct fp, dups =
    * docs − unique. Matches `d_data_card`'s shape exactly.
    */
  def cardFromIndex(index: DataFrame): DataFrame =
    index.rollup(col("lang"), col("source"))
      .agg(sum(col("cnt")).as("n_docs"),
        sum(col("tok")).as("n_tokens"),
        countDistinct(col("fp")).as("n_unique"),
        (sum(col("cnt")) - countDistinct(col("fp"))).as("n_dups"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("n_tokens"), col("n_unique"), col("n_dups"))
}
