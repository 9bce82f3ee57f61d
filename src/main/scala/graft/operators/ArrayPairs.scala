package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared in-group pair expansion: all a<b combinations of a SORTED array
  * column as `struct(a, b)` elements. One definition for every bucket-based
  * pairing operator (LSH candidate pairs, co-occurrence, audit-log join
  * stats) — the `i + 2` is the 1-based slice just past element i.
  */
private[graft] object ArrayPairs {
  def pairStructs(arr: Column): Column =
    flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + 2, size(arr)),
        y => struct(x.as("a"), y.as("b")))))
}
