package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, Dedup, Fsck, Retrieval, Similarity}

/** Seeded-corruption audits: for every persisted layout, a clean store
  * passes fsck end to end, and one planted violation of each layout's
  * core invariant is DETECTED AND NAMED — the operator contract behind
  * `graft fsck <store>` (a green audit means the store's aggregates,
  * sidecars, directory hashing, and erasure linkage all hold).
  */
class FsckSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def assertClean(path: String): Unit = {
    val findings = Fsck.audit(spark, path)
    assert(findings.nonEmpty && findings.forall(_.ok),
      findings.filterNot(_.ok).mkString("; "))
  }

  private def assertFlags(path: String, check: String): Unit = {
    val bad = Fsck.audit(spark, path).filterNot(_.ok)
    assert(bad.exists(_.check == check),
      s"expected '$check' to flag, got: $bad")
  }

  private val docs = Seq(
    (1L, "spark engine shuffles columns fast and wide today"),
    (2L, "ducks swim across quiet ponds daily in spring rain"),
    (3L, "ponds reflect the morning sky over quiet water here"),
    (4L, "columnar storage scans fewer bytes than rows do now"))
    .toDF("doc_id", "text")

  test("fsck bm25: clean store passes; a tampered dfreq is detected") {
    val path = tmp("fsck_bm25")
    Retrieval.writeBm25Store(docs, "doc_id", "text", path)
    assert(Fsck.detect(spark, path) == "bm25")
    assertClean(path)
    // plant: one df silently incremented — exactly what a buggy merge
    // double-count would leave behind
    val tampered = spark.read.parquet(s"$path/dfreq")
      .withColumn("df", when(col("term") === "ponds", col("df") + 1)
        .otherwise(col("df")))
      .localCheckpoint()
    tampered.write.mode("overwrite").parquet(s"$path/dfreq")
    assertFlags(path, "dfreq_aggregates")
  }

  test("fsck bm25: a stranded pending marker is reported") {
    val path = tmp("fsck_bm25m")
    Retrieval.writeBm25Store(docs, "doc_id", "text", path)
    val mp = new org.apache.hadoop.fs.Path(path, "_graft_merge_pending")
    mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(mp, false).close()
    assertFlags(path, "pending_marker")
  }

  test("fsck bm25f: clean store passes; tampered field stats are detected") {
    val path = tmp("fsck_bm25f")
    Retrieval.writeBm25fStore(docs, "doc_id", "text", path)
    assert(Fsck.detect(spark, path) == "bm25f")
    assertClean(path)
    val tampered = spark.read.parquet(s"$path/stats")
      .withColumn("tot_f", col("tot_f") + 1).localCheckpoint()
    tampered.write.mode("overwrite").parquet(s"$path/stats")
    assertFlags(path, "stats_aggregates")
  }

  test("fsck winnow: clean store passes; a drifted refcount is detected") {
    val path = tmp("fsck_winnow")
    val long = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta different tail words"))
      .toDF("doc_id", "text")
    Dedup.writeWinnowStoreAt(spark, path, long, "doc_id", "text")
    assert(Fsck.detect(spark, path) == "winnow")
    assertClean(path)
    // plant: one refcount over-incremented — the store would keep
    // gating a span whose last owner was erased
    val fps = spark.read.parquet(s"$path/fps")
    val victim = fps.orderBy(col("fp")).select(col("fp")).head().getString(0)
    val tampered = fps
      .withColumn("refs", when(col("fp") === victim, col("refs") + 1)
        .otherwise(col("refs")))
      .localCheckpoint()
    tampered.write.mode("overwrite").partitionBy("fbucket")
      .parquet(s"$path/fps")
    assertFlags(path, "refcounts_vs_sidecar")
  }

  test("fsck nb: clean store passes; a tampered class count is detected " +
      "as both a re-derivation and a membership failure") {
    val path = tmp("fsck_nb")
    val train = Seq(
      (1L, "apple banana apple cherry", "fruit"),
      (2L, "banana banana apple", "fruit"),
      (3L, "bolt nut bolt washer", "tool"),
      (4L, "nut washer bolt", "tool")).toDF("doc_id", "text", "lang")
    Classify.writeNbStore(train, "doc_id", "text", "lang", path)
    assert(Fsck.detect(spark, path) == "nb")
    assertClean(path)
    // tamper ONE class only — a uniform bump would preserve every
    // nd/Σnd ratio and leave the stored priors accidentally consistent
    val tampered = spark.read.parquet(s"$path/base")
      .withColumn("nd", when(col("label") === "fruit", col("nd") + 1)
        .otherwise(col("nd")))
      .localCheckpoint()
    tampered.write.mode("overwrite").parquet(s"$path/base")
    assertFlags(path, "base_rederivation")
    assertFlags(path, "membership_vs_nd")
  }

  private def synthVecs(n: Int) =
    (0 until n).map(i => (i.toLong,
      Seq.tabulate(8)(d => (if (d == i % 3) 10.0 else 0.0) + 0.01 * (i % 5))))
      .toDF("vec_id", "embedding")

  test("fsck ivf: clean store passes; a directory no codebook names is " +
      "detected") {
    val path = tmp("fsck_ivf")
    val vecs = synthVecs(40)
    val seeds = Seq(
      Seq(1.0, 0, 0, 0, 0, 0, 0, 0),
      Seq(0, 1.0, 0, 0, 0, 0, 0, 0),
      Seq(0, 0, 1.0, 0, 0, 0, 0, 0))
    Similarity.writeIvfStore(vecs, "vec_id", "embedding", seeds, path)
    Similarity.writeCodebookAt(spark, path, seeds)
    assert(Fsck.detect(spark, path) == "ivf")
    assertClean(path)
    // plant: rows in a directory the persisted codebook does not name —
    // no probe can ever reach them
    Seq((999L, Seq.tabulate(8)(_ * 0.1), 9))
      .toDF("vec_id", "embedding", "centroid_id")
      .write.mode("append").partitionBy("centroid_id").parquet(path)
    assertFlags(path, "codebook_names_directories")
  }

  test("fsck ivf: a META-carrying store audits clean (the id column " +
      "derives from the sidecar, not guessed from the store schema)") {
    val path = tmp("fsck_ivfmeta")
    val vecs = (0 until 40).map(i => (i.toLong,
      Seq.tabulate(8)(d => (if (d == i % 3) 10.0 else 0.0) + 0.01 * (i % 5)),
      (i % 4).toLong)).toDF("vec_id", "embedding", "label")
    assert(graft.sinks.IvfIndexSink.sink(vecs,
      Map("index_path" -> path, "meta_columns" -> Seq("label"))) == 40L)
    assert(Fsck.detect(spark, path) == "ivf")
    assertClean(path)
  }

  test("fsck pq2 codes: clean store passes; a code with no exact vector " +
      "in the rerank sidecar is detected, and an unreachable linkage is " +
      "detected") {
    val path = tmp("fsck_pq2")
    val rrk = tmp("fsck_pq2_rrk")
    val vecs = synthVecs(40)
    assert(graft.sinks.IvfIndexSink.sink(vecs,
      Map("index_path" -> path, "quantize" -> "pq",
        "rerank_store_path" -> rrk, "pq_m" -> 4, "pq_k" -> 8)) == 40L)
    assert(Fsck.detect(spark, path) == "pq2-codes")
    assertClean(path)
    // plant: a stored code whose exact vector never landed (the
    // crash-between-writes shape the append order minimizes) — its
    // re-rank silently drops it from every result
    val gid = spark.read.parquet(path)
      .select(col("centroid_id").cast("int")).head().getInt(0)
    val codes = spark.read.parquet(path).select(col("pq_codes")).head()
      .getSeq[Int](0)
    Seq((999L, codes, gid)).toDF("vec_id", "pq_codes", "centroid_id")
      .write.mode("append").partitionBy("centroid_id").parquet(path)
    assertFlags(path, "rerank_coverage")
    // plant: linkage recorded but the sidecar is gone
    val fs = new org.apache.hadoop.fs.Path(rrk)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(rrk),
      new org.apache.hadoop.fs.Path(s"$rrk.gone"))
    assertFlags(path, "rerank_linkage")
  }

  test("fsck vector store: clean store passes; a row outside its " +
      "pmod(id, parts) directory is detected") {
    val path = tmp("fsck_vec")
    Similarity.writeVectorStore(synthVecs(40), "vec_id", "embedding", path)
    assert(Fsck.detect(spark, path) == "vector")
    assertClean(path)
    // plant: a row filed under the wrong directory — the probe-side
    // derivation would never look there, so it is invisible to re-rank
    // and to erasure alike
    Seq((999L, Seq.tabulate(8)(_ * 0.1), 7))
      .toDF("vec_id", "embedding", "vs_part")
      .write.mode("append").partitionBy("vs_part").parquet(path)
    assertFlags(path, "id_partitioning")
  }

  test("fsck refuses an unrecognizable path loudly") {
    val path = tmp("fsck_none")
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$path/random")
    val e = intercept[IllegalArgumentException] {
      Fsck.detect(spark, path)
    }
    assert(e.getMessage.contains("no recognizable"), e.getMessage)
  }
}
