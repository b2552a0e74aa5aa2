package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("date-partitioned layout prunes partitions at plan time") {
    import org.apache.spark.sql.functions._
    val dir = "/tmp/graft_part_events"
    Bucketing.writePartitioned(
      Tables.load(spark, sf, "events")
        .withColumn("d", date_trunc("day", col("ts")).cast("date")),
      dir, Seq("d"))
    val q = spark.read.parquet(dir).filter(col("d") === "2024-01-03")
    val scan = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // the date predicate lands in PartitionFilters (directory pruning),
    // leaving no row-level filter on d
    assert(scan.partitionFilters.nonEmpty)
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "d")))
    // and the pruned scan actually reads a subset of partitions
    assert(scan.selectedPartitions.partitionCount <
      spark.read.parquet(dir).queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.selectedPartitions.partitionCount)
  }

  test("cell-partitioned IVF index scans only the probed cells") {
    import org.apache.spark.sql.functions._
    import graft.ops.Similarity
    val dir = "/tmp/graft_ivf_index"
    val emb = Tables.load(spark, sf, "embeddings")
    val centroids = emb.filter(col("vec_id") < 16) // 16 fixed centroids
    Similarity.writeIvfIndex(emb, centroids, "vec_id", "embedding", dir)
    val queries = emb.filter(col("vec_id") < 2)
    val idx = Similarity.ivfTopKIndexed(spark, dir, queries, centroids,
      "vec_id", "embedding", k = 5, nProbe = 1)
    // row-identical to the in-memory ivfTopK on the same centroids
    val mem = Similarity.ivfTopK(emb, queries, centroids,
      "vec_id", "embedding", k = 5, nProbe = 1)
    assert(idx.orderBy("q_id", "rnk").collect().toSeq ==
      mem.orderBy("q_id", "rnk").collect().toSeq)
    // the probe predicate must land in PartitionFilters (planning-time
    // directory pruning), and the scan must touch ≤ queries × nProbe
    // of the 16 cell directories — not the whole index
    val scan = idx.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains("graft_ivf_index")) => f
    }.head
    assert(scan.partitionFilters.exists(
      _.references.exists(_.name == "cell")),
      "probe cells must prune partitions, not filter rows")
    val total = spark.read.parquet(dir).queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head.selectedPartitions.partitionCount
    assert(scan.selectedPartitions.partitionCount <= 2 &&
      scan.selectedPartitions.partitionCount < total,
      s"probe must read ≤2 of $total cell dirs, " +
        s"read ${scan.selectedPartitions.partitionCount}")
  }

  test("cell-partitioned IVF-PQ coded index prunes and matches in-memory") {
    import org.apache.spark.sql.functions._
    import graft.ops.Pq
    val dir = "/tmp/graft_ivfpq_index"
    val emb = Tables.load(spark, sf, "embeddings")
    val centroids = emb.filter(col("vec_id") < 16)
    val cb = Pq.codebooks(m = 4, ksub = 16, subDim = 16)
    Pq.writeIvfPqIndex(emb, centroids, "vec_id", "embedding", cb, dir)
    val queries = emb.filter(col("vec_id") < 2)
    val idx = Pq.ivfPqTopKIndexed(spark, dir, queries, centroids,
      "vec_id", "embedding", cb, k = 5, nProbe = 2)
    // row-identical to the in-memory IVFADC on the same artifacts
    val mem = Pq.ivfPqTopK(emb, queries, centroids,
      "vec_id", "embedding", cb, k = 5, nProbe = 2)
    assert(idx.orderBy("q_id", "rnk").collect().toSeq ==
      mem.orderBy("q_id", "rnk").collect().toSeq)
    // literal probe cells prune directories at planning time, and the
    // scan reads the CODED columns (codes), never a raw vector column
    val scan = idx.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains("graft_ivfpq_index")) => f
    }.head
    assert(scan.partitionFilters.exists(
      _.references.exists(_.name == "cell")),
      "probe cells must prune partitions, not filter rows")
    val total = spark.read.parquet(dir).queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head.selectedPartitions.partitionCount
    assert(scan.selectedPartitions.partitionCount <= 4 &&
      scan.selectedPartitions.partitionCount < total,
      s"probe must read <=4 of $total cell dirs, " +
        s"read ${scan.selectedPartitions.partitionCount}")
    assert(scan.schema.fieldNames.contains("codes") &&
      !scan.schema.fieldNames.exists(_.contains("cv")),
      s"scan must read codes only, got ${scan.schema.fieldNames.toSeq}")
  }

  test("bucket-partitioned phash index scans only the batch's buckets") {
    import org.apache.spark.sql.functions._
    import graft.ops.Multimodal
    import spark.implicits._
    val dir = "/tmp/graft_phash_index"
    // per-group two-level 9×8 patterns + per-member flips: near-dups
    // within a group, ~32-bit gaps across groups (the gate convention)
    def img(id: Long): Array[Byte] = {
      val g = id % 5
      val gray = Array.tabulate(72) { i =>
        val r = i / 9; val c = i % 9
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"bpi:$g:$r:$c".getBytes("UTF-8"))
        val base = if ((d(0) & 0x80) == 0) 220 else 30
        if (id % 3 == 0 && r == (id % 8).toInt && c == (id % 9).toInt)
          250 - base
        else base
      }
      Multimodal.encodeBmp24(9, 8, gray)
    }
    val media = (0L until 60L).map(i => (i, img(i)))
      .toDF("media_id", "payload")
    val sigs = Multimodal.imagePhashes(media).localCheckpoint()
    Multimodal.writePhashIndex(sigs.filter($"media_id" % 10 =!= 7),
      "media_id", "phash", 3, dir)
    val batch = sigs.filter($"media_id" % 10 === 7)
    val idx = Multimodal.probePhashIndex(spark, dir, batch,
      "media_id", "phash", 3)
    // row-identical to the (index, batch) cross slice of the
    // in-memory banded join over the union
    val mem = Multimodal.phashPairs(sigs, "media_id", "phash", 3)
      .filter(($"a_id" % 10 === 7) =!= ($"b_id" % 10 === 7))
      .select(
        when($"a_id" % 10 === 7, $"b_id").otherwise($"a_id").as("a_id"),
        when($"a_id" % 10 === 7, $"a_id").otherwise($"b_id").as("b_id"),
        $"dist")
    val gotSet = idx.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val memSet = mem.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotSet.nonEmpty && gotSet == memSet,
      "bucket-pruned probe must equal the in-memory cross pairs")
    // the batch's bucket literals must land in PartitionFilters
    // (planning-time directory pruning), reading a strict subset
    val scan = idx.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains("graft_phash_index")) => f
    }.head
    assert(scan.partitionFilters.exists(
      _.references.exists(_.name == "__bkt")),
      "probe buckets must prune partitions, not filter rows")
    val total = spark.read.parquet(s"$dir/bands").queryExecution
      .sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.selectedPartitions.partitionCount
    assert(scan.selectedPartitions.partitionCount <= 24 &&
      scan.selectedPartitions.partitionCount < total,
      s"probe must read ≤ its 24 band buckets of $total dirs, " +
        s"read ${scan.selectedPartitions.partitionCount}")
  }

  test("bucketed join runs without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.load(spark, sf, "orders"), "b_orders", "o_orderkey", 8)
      Bucketing.writeBucketed(
        Tables.load(spark, sf, "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", "o_orderkey", 8)
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // both sides read pre-bucketed: no Exchange feeds the join
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      // same join unbucketed DOES shuffle — the layout is what saves it
      val raw = Tables.load(spark, sf, "orders").join(
        Tables.load(spark, sf, "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      raw.collect()
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("z-ordered layout gives every file a bounded 2-D rectangle") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 64×64 grid; 16 z-range files ≈ 16×16 tiles. A single-dimension
    // sort by x leaves y full-range (63) in every file; the Morton
    // layout bounds BOTH dimensions, which is what lets parquet
    // min/max stats prune a rectangle predicate on either column.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .toDF("x", "y").repartition(8)
    def maxRange(dir: String, c: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("r"))
        .agg(max("r")).collect().head.getInt(0).toLong
    val zDir = "/tmp/graft_zorder_spec"
    Bucketing.writeZordered(grid, zDir, "x", "y", bits = 6, numFiles = 16)
    val xDir = "/tmp/graft_xsort_spec"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)
    // x-sorted: y spans the full 0..63 in every file
    assert(maxRange(xDir, "y") == 63L)
    // z-ordered: both dimensions bounded (≤ 2 tiles even when a
    // range-partition boundary straddles a tile edge)
    assert(maxRange(zDir, "x") <= 31L, s"x range ${maxRange(zDir, "x")}")
    assert(maxRange(zDir, "y") <= 31L, s"y range ${maxRange(zDir, "y")}")
    // the layout is a pure reshuffle: the row set round-trips intact
    assert(spark.read.parquet(zDir).count() == 4096L)
    assert(spark.read.parquet(zDir).distinct().count() == 4096L)
  }

  test("bucketed BM25 index scans only the query terms' buckets") {
    import graft.ops.TextOps
    val dir = "/tmp/graft_bm25_index"
    val docs = Tables.load(spark, sf, "documents")
    TextOps.bm25WriteIndex(docs, "doc_id", "text", dir)
    val terms = Seq("spark", "stream", "join")
    val disk = TextOps.bm25TopKFromDisk(spark, dir, "doc_id", terms, k = 10)
    // row-identical to the direct scan path
    val scan = TextOps.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = disk.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == scan && scan.nonEmpty)
    // the bucket literals must land in PartitionFilters and prune the
    // 64-bucket posting layout down to ≤ |terms| directories
    val probeScan = disk.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(
          _.toString.contains("graft_bm25_index")) => f
    }.head
    assert(probeScan.partitionFilters.exists(
      _.references.exists(_.name == "__bkt")),
      "term buckets must prune partitions, not filter rows")
    val total = spark.read.parquet(s"$dir/postings")
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.selectedPartitions.partitionCount
    assert(probeScan.selectedPartitions.partitionCount <= terms.size &&
      probeScan.selectedPartitions.partitionCount < total,
      s"probe must read ≤${terms.size} of $total bucket dirs, " +
        s"read ${probeScan.selectedPartitions.partitionCount}")
  }
}
