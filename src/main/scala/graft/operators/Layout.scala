package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical data layout for 100 TB corpora — the ingest-time decisions that
  * make every later query cheap:
  *
  *  - **Partition columns** (`writePartitioned`): low-cardinality filter
  *    keys (lang, source, date) become directory partitions, so a filtered
  *    read prunes whole directories (`PartitionFilters` in the scan, zero
  *    I/O for pruned values) instead of scanning 100 TB to discard rows.
  *  - **Bucketing** (`writeBucketed`): high-cardinality JOIN/GROUP keys
  *    (doc_id, user_id) hash rows into a fixed bucket count at write time.
  *    Two tables bucketed on the same key/count join with NO exchange on
  *    either side — the shuffle is paid once at ingest, not per query. The
  *    same layout serves repeated dedup/join/aggregate passes.
  *
  * The reference has no storage layer at all (it streams records through
  * memory); this module is pure Spark-native scale engineering.
  */
object Layout {

  /** Directory-partitioned parquet: one directory per distinct combination
    * of `partitionCols`. Keep cardinality low (≤ a few thousand dirs).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Hash-bucketed (and per-bucket sorted) table in the session catalog.
    * Joins and aggregations keyed on `bucketCol` across tables with the
    * SAME bucket count read co-partitioned — no exchange. Sorting within
    * buckets additionally drops the sort from sort-merge joins.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Replace a parquet directory by temp-write + rename — the
    * smallest-window spelling of "overwrite this small table" available
    * on a filesystem without transactions. A plain
    * `write.mode("overwrite")` deletes the destination and then runs a
    * whole write JOB into it: a crash anywhere in that job leaves the
    * directory missing or half-written, and for stores whose commit
    * signal is this very table's `_SUCCESS` (stats for BM25, codebook
    * for IVF) that silently flips the next ingest onto the BUILD branch
    * — which static-overwrites away all history. Writing the
    * replacement BESIDE the destination first shrinks the unprotected
    * window to one delete + one rename (rename is atomic on HDFS and
    * local filesystems): a crash before the delete leaves the old table
    * fully intact, after it the complete replacement sits at
    * `dest__replacing` for loud manual recovery. Callers pre-shape the
    * frame (coalesce/repartition) — this writes it as given.
    */
  def replaceDir(df: DataFrame, dest: String,
                 partitionCols: Seq[String] = Nil): Unit = {
    val destPath = new org.apache.hadoop.fs.Path(dest)
    val fs = destPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dest + "__replacing")
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    fs.delete(destPath, true)
    require(fs.rename(tmp, destPath), s"rename $tmp -> $destPath failed")
  }

  /** A fully-prepared per-directory rewrite: the replacement rows are
    * MATERIALIZED (localCheckpoint) at plan time, so everything that can
    * fail for data reasons — reads, joins, spills — fails before the
    * caller's first mutating write. [[execDirRewrite]] then only writes.
    */
  final case class PlannedRewrite(dirPath: String, part: String,
                                  replacement: DataFrame, keep: Set[Int],
                                  hitDirs: Seq[Int], schemaSrc: DataFrame)

  /** Prepare a rewrite of the `hitDirs` directories of a
    * `part`-partitioned table with `replacement` (already restricted to
    * those directories). When `sortCols` is given the replacement is
    * re-clustered one-task-per-directory and sorted within partitions by
    * (part, sortCols) — preserving the write path's intra-file sort so
    * parquet row-group min/max pruning survives the rewrite.
    */
  def planDirRewrite(spark: org.apache.spark.sql.SparkSession,
                     dirPath: String, part: String, replacement: DataFrame,
                     hitDirs: Seq[Int], schemaSrc: DataFrame,
                     sortCols: Seq[String] = Nil): PlannedRewrite = {
    val shaped =
      if (sortCols.isEmpty) replacement
      else replacement.repartition(col(part))
        .sortWithinPartitions((part +: sortCols).map(col): _*)
    val rows = shaped.localCheckpoint()
    val keep = rows.select(col(part).cast("int")).distinct()
      .collect().map(_.getInt(0)).toSet
    PlannedRewrite(dirPath, part, rows, keep, hitDirs, schemaSrc)
  }

  /** Plan the survivors-only erasure rewrite of the `hitDirs` directories
    * (drop every row whose `idCol` is in `tomb`). Returns None when no
    * directory is hit (nothing to do).
    */
  def planCompaction(spark: org.apache.spark.sql.SparkSession,
                     dirPath: String, part: String, rows: DataFrame,
                     tomb: DataFrame, idCol: String, hitDirs: Seq[Int],
                     sortCols: Seq[String] = Nil): Option[PlannedRewrite] =
    if (hitDirs.isEmpty) None
    else Some(planDirRewrite(spark, dirPath, part,
      rows.filter(col(part).isInCollection(hitDirs))
        .join(broadcast(tomb), Seq(idCol), "left_anti"),
      hitDirs, rows, sortCols))

  /** Execute a [[PlannedRewrite]] — writes only, the prepared rows are
    * already on local disk. Dynamic partition overwrite only replaces
    * directories PRESENT in the written data, so directories the rewrite
    * fully empties are removed explicitly; if nothing at all survives,
    * one zero-row schema-bearing file parks under a sentinel directory no
    * real key can hash to (buckets and centroid ids are >= 0) so the path
    * stays readable.
    */
  def execDirRewrite(spark: org.apache.spark.sql.SparkSession,
                     pr: PlannedRewrite): Unit = {
    pr.replacement.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(pr.part).parquet(pr.dirPath)
    val fs = new org.apache.hadoop.fs.Path(pr.dirPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    pr.hitDirs.filterNot(pr.keep).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(pr.dirPath, s"${pr.part}=$b"),
        true)
    }
    val anyLeft = fs.listStatus(new org.apache.hadoop.fs.Path(pr.dirPath))
      .exists(s => s.isDirectory &&
        s.getPath.getName.startsWith(s"${pr.part}="))
    if (!anyLeft)
      pr.schemaSrc.limit(0).drop(pr.part).repartition(1)
        .write.mode("overwrite").parquet(s"${pr.dirPath}/${pr.part}=-1")
  }

  /** Rewrite the survivors of ONLY the `hitDirs` partition directories
    * of a `part`-partitioned parquet table, dropping every row whose
    * `idCol` is in `tomb` — the per-directory erasure compaction shared
    * by the BM25-family postings/sidecar forgets and the vector store's.
    * One-shot spelling of [[planCompaction]] + [[execDirRewrite]]; callers
    * running under the pending marker should plan in their PREPARE phase
    * instead so a failed read never stands a mutation marker.
    */
  def compactPartitionedDirs(spark: org.apache.spark.sql.SparkSession,
                             dirPath: String, part: String, rows: DataFrame,
                             tomb: DataFrame, idCol: String,
                             hitDirs: Seq[Int],
                             sortCols: Seq[String] = Nil): Unit =
    planCompaction(spark, dirPath, part, rows, tomb, idCol, hitDirs,
      sortCols).foreach(execDirRewrite(spark, _))

  /** The distinct `part` directory values of `hit` (collect is bounded
    * by the table's directory count). */
  def partitionHits(hit: DataFrame, part: String): Seq[Int] =
    hit.select(col(part).cast("int")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

  private def fsOf(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pendingMarkerOf(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_merge_pending")

  /** The stale-marker refusal text shared by every store-mutation guard. */
  def pendingRefusal(path: String): String =
    s"$path holds an UNFINISHED mutation (stale ${pendingMarkerOf(path)}) " +
      "— a prior merge/forget died between its writes, or another writer " +
      "is running right now. The store may carry a partial mutation: " +
      "rebuild the index from source (delete the path and re-ingest) " +
      "before mutating it further, and run ONE writer per index."

  /** Refuse loudly when a store carries the pending marker — called by
    * consumers BEFORE they dispatch on a store's commit signal, because a
    * crashed mutation may have destroyed that very signal.
    */
  def refuseIfPending(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit =
    require(!fsOf(spark, path).exists(pendingMarkerOf(path)),
      pendingRefusal(path))

  /** Acquire the pending marker with `create(overwrite = false)`. On HDFS
    * that is an atomic create-exclusive, so two concurrent writers racing
    * past any earlier exists() probe still serialize here — exactly one
    * wins, the loser gets the same loud refusal as a stale-marker
    * restart. On the local filesystem and several object-store connectors
    * the call is check-then-create INSIDE one invocation — it still
    * refuses reliably against a marker that is already down (the
    * single-writer contract's failure mode), but it is NOT a cross-JVM
    * lock there; run one writer per index regardless. Those filesystems
    * may also signal an existing file with a plain IOException rather
    * than FileAlreadyExistsException, so existence is re-checked on any
    * IOException before deciding between refusal and propagation.
    */
  private def acquirePendingMarker(
      f: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path, path: String): Unit =
    try f.create(marker, false).close()
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new IllegalArgumentException(pendingRefusal(path))
      case e: java.io.IOException =>
        if (f.exists(marker))
          throw new IllegalArgumentException(pendingRefusal(path))
        else throw e
    }

  /** Run a multi-write store mutation under the `_graft_merge_pending`
    * marker (see [[acquirePendingMarker]] for the acquisition contract).
    * The marker is deliberately NOT removed when `body` throws: a failed
    * mutation may have landed some of its writes, and the marker is what
    * makes retrying it loud instead of silently double-applying. Callers
    * whose mutation has a read/compute phase before the first write
    * should use [[withPendingMarkerStaged]] so a plan-time failure does
    * not strand the marker on an untouched store.
    */
  def withPendingMarker[A](spark: org.apache.spark.sql.SparkSession,
                           path: String)(body: => A): A = {
    val marker = pendingMarkerOf(path)
    val f = fsOf(spark, path)
    acquirePendingMarker(f, marker, path)
    val r = body
    f.delete(marker, false)
    r
  }

  /** [[withPendingMarker]] split into PREPARE (reads, joins,
    * localCheckpoints — everything that can fail for data reasons) and
    * MUTATE (writes only). Both run under the marker, so the mutual
    * exclusion covers the whole read-compute-write span — but a failure
    * inside `prepare` DELETES the marker before rethrowing, because
    * nothing has been written yet and leaving it would permanently brick
    * an untouched store (a cancelled job or an OOM-killed stage during
    * planning would otherwise force a manual rebuild for no reason). A
    * failure inside `mutate` leaves the marker: some writes may have
    * landed, and the loud refusal on the next mutation is the point.
    */
  def withPendingMarkerStaged[P, A](spark: org.apache.spark.sql.SparkSession,
                                    path: String)(prepare: => P)(
                                    mutate: P => A): A = {
    val marker = pendingMarkerOf(path)
    val f = fsOf(spark, path)
    acquirePendingMarker(f, marker, path)
    val p =
      try prepare
      catch {
        case e: Throwable =>
          try f.delete(marker, false)
          catch { case del: java.io.IOException => e.addSuppressed(del) }
          throw e
      }
    val r = mutate(p)
    f.delete(marker, false)
    r
  }

  /** Morton (Z-order) interleave of two `bits`-bit non-negative dims into
    * one sort key: x in the even bit positions, y in the odd. Data sorted
    * by this key clusters rows that are close in BOTH dims into the same
    * parquet row groups, so a 2-D box predicate — which no single-column
    * sort can serve — prunes via ordinary min/max statistics once the box
    * is decomposed into z ranges ([[zRanges]]). Pure codegen'd bit
    * arithmetic (shift/and/or), no UDF.
    */
  def morton(x: Column, y: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1)).cast("long"),
          2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1)).cast("long"),
          2 * i + 1))
    }

  /** Exact cover of the 2-D box [xlo..xhi] × [ylo..yhi] by disjoint,
    * sorted, merged Z-value ranges over a `bits`-bit grid: the classic
    * quadtree decomposition (an aligned 2^k cell is one CONTIGUOUS z run
    * of length 4^k, so recurse only on cells that straddle the boundary).
    * Range count is O(perimeter) — bounded by ~6·2^bits after merging —
    * and membership is exact: z(x, y) falls inside some range IFF (x, y)
    * is in the box (property-tested exhaustively at bits = 4). Runs
    * driver-side over grid CELLS (never data); the ranges become ordinary
    * pushed-down BETWEEN predicates on the z column.
    */
  def zRanges(xlo: Int, xhi: Int, ylo: Int, yhi: Int,
              bits: Int): Seq[(Long, Long)] = {
    require(bits > 0 && bits <= 16, s"bits out of range: $bits")
    require(0 <= xlo && xlo <= xhi && xhi < (1 << bits) &&
      0 <= ylo && ylo <= yhi && yhi < (1 << bits),
      s"box out of the $bits-bit grid: [$xlo..$xhi]x[$ylo..$yhi]")
    def interleave(x: Int, y: Int): Long = {
      var z = 0L; var i = 0
      while (i < bits) {
        z |= ((x >> i) & 1).toLong << (2 * i)
        z |= ((y >> i) & 1).toLong << (2 * i + 1)
        i += 1
      }
      z
    }
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def rec(cx: Int, cy: Int, size: Int): Unit = {
      val x2 = cx + size - 1; val y2 = cy + size - 1
      if (x2 < xlo || cx > xhi || y2 < ylo || cy > yhi) ()
      else if (cx >= xlo && x2 <= xhi && cy >= ylo && y2 <= yhi) {
        val lo = interleave(cx, cy)
        out += ((lo, lo + size.toLong * size - 1))
      } else {
        val h = size / 2
        rec(cx, cy, h); rec(cx + h, cy, h)
        rec(cx, cy + h, h); rec(cx + h, cy + h, h)
      }
    }
    rec(0, 0, 1 << bits)
    out.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
      case ((alo, ahi) :: rest, (lo, hi)) if lo == ahi + 1 =>
        (alo, hi) :: rest
      case (acc, r) => r :: acc
    }.reverse
  }

  /** OR-of-BETWEENs predicate over [[zRanges]] output — stays inside
    * parquet filter pushdown (each leg is a plain range on one column).
    */
  def zRangePredicate(z: Column, ranges: Seq[(Long, Long)]): Column =
    ranges.map { case (lo, hi) => z.between(lo, hi) }.reduce(_ || _)
}
