package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Market-basket association mining: frequent item PAIRS (Apriori at
  * depth 2 — Agrawal & Srikant 1994, the declarative candidate-pruning
  * special case) and item-item co-occurrence recommendations
  * (Sarwar et al. 2001 item-based CF, cosine over the basket-incidence
  * matrix). The reference ships no basket miner; the capability slots
  * into its analytics surface next to the aggregation framework
  * (`core/.../query/OSQLQuery` usage in `test/.../SQLSelectTest.java`)
  * the way the other `qp_*` pipeline operators do.
  *
  * Scale design: the ONLY quadratic step is the within-basket self-join,
  * and it is bounded by Σᵢ sᵢ² over basket sizes sᵢ (TPC-H-shaped order
  * baskets are ≤ 7 lines; a 100 TB corpus grows the basket COUNT, not
  * the basket size, so the pair explosion stays linear in input).
  * Apriori pruning runs BEFORE the self-join: items below the 1-item
  * support floor are semi-joined away, so a long-tail catalog never
  * reaches the pair stage. All counts are exact integers (hash-stable
  * under any partitioning); the single float (lift / cosine) is one
  * division rounded at 4 decimals on both engine and oracle.
  */
object Association {

  /** distinct (basket, item) incidence with the Apriori 1-item prune
    * applied; also returns the basket count as a 1-row frame so callers
    * get N without a separate driver-side action. */
  private def incidence(df: DataFrame, basketCol: String, itemCol: String,
      minItemSupport: Long): (DataFrame, DataFrame, DataFrame) = {
    val b = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val itemCnt = b.groupBy("item").agg(count(lit(1)).as("n_item"))
    val frequent = itemCnt.filter(col("n_item") >= minItemSupport)
    // Apriori depth-1 prune: infrequent items can never appear in a
    // frequent pair — drop them before the quadratic stage. left_semi
    // keeps the incidence narrow; at catalog scale this join shuffles
    // on item (the frequent set need not fit in a broadcast).
    val pruned = b.join(frequent.select("item"), Seq("item"), "left_semi")
    val nBaskets = b.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    (pruned, frequent, nBaskets)
  }

  /** exact within-basket pair counts over the pruned incidence:
    * (item_a < item_b, n_pair). One shuffle on basket for the
    * self-join, one partial-agg shuffle on the pair key. */
  private def pairCounts(pruned: DataFrame, minPairSupport: Long): DataFrame =
    pruned.select(col("basket"), col("item").as("item_a"))
      .join(pruned.select(col("basket"), col("item").as("item_b")), "basket")
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairSupport)

  /** Frequent item pairs with lift and confidence: top-k by pair count
    * (ties broken on the item ids, so the cut is deterministic).
    * Output: (item_a, item_b, n_pair, n_a, n_b, lift, conf_ab) where
    * lift = N·c(a,b)/(c(a)·c(b)) and conf_ab = c(a,b)/c(a), both at 4
    * decimals. */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minItemSupport: Long = 2, minPairSupport: Long = 2,
      topK: Int = 50): DataFrame = {
    require(topK >= 1 && minItemSupport >= 1 && minPairSupport >= 1,
      "supports and topK must be positive")
    val (pruned, frequent, nBaskets) = incidence(df, basketCol, itemCol,
      minItemSupport)
    val pairs = pairCounts(pruned, minPairSupport)
    // item-count join: rename per side; the frequent-item frame is the
    // aggregated catalog (orders of magnitude below the incidence), so
    // Spark picks broadcast when it fits and falls back to shuffle when
    // a 100 TB catalog doesn't — both plans are correct here.
    val ca = frequent.select(col("item").as("item_a"), col("n_item").as("n_a"))
    val cb = frequent.select(col("item").as("item_b"), col("n_item").as("n_b"))
    pairs.join(ca, "item_a").join(cb, "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"),
        col("n_b"),
        round(col("n_pair").cast("double") * col("n_baskets") /
          (col("n_a").cast("double") * col("n_b")), 4).as("lift"),
        round(col("n_pair").cast("double") / col("n_a"), 4).as("conf_ab"))
      .orderBy(col("n_pair").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** Additive co-occurrence state for STREAMING ingestion: the
    * aggregated pair-count, item-count and basket-count tables — every
    * count is a plain integer sum, so micro-batches merge by
    * union + re-aggregate and the merged state is EXACTLY the state a
    * batch run over the union would reach (spec-pinned). The tables
    * are checkpointed DataFrames (catalog²-bounded after support
    * pruning at read time, never corpus-sized) — at 100 TB this state
    * lives as a table, not in driver memory.
    *
    * Caller contract: a basket arrives WHOLE in one micro-batch (the
    * per-batch `distinct` dedups within a batch only — a basket split
    * across batches would double-count its incidence), and ids are not
    * redelivered (foreachBatch is at-least-once on retry; idempotent
    * ingestion needs an upstream batch-id filter, same contract as
    * [[graft.streaming.IndexIngest]]). */
  final case class AssocState(pairs: DataFrame, items: DataFrame,
      baskets: DataFrame)

  def emptyAssocState(spark: SparkSession): AssocState = {
    import spark.implicits._
    AssocState(
      Seq.empty[(Long, Long, Long)].toDF("item_a", "item_b", "n_pair"),
      Seq.empty[(Long, Long)].toDF("item", "n_item"),
      Seq((0L)).toDF("n_baskets"))
  }

  /** fold one micro-batch of (basket, item) rows into the state —
    * unpruned pair counts (support floors apply at READ time, because
    * an item can cross the floor on a later batch) merged by
    * union + partial-agg sum, lineage truncated per batch. */
  def appendBaskets(state: AssocState, batch: DataFrame,
      basketCol: String, itemCol: String): AssocState = {
    val b = batch.select(col(basketCol).as("basket"),
        col(itemCol).cast("long").as("item"))
      .distinct().localCheckpoint(true)
    val pc = pairCounts(b, minPairSupport = 1)
    val ic = b.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val nb = b.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    AssocState(
      state.pairs.unionByName(pc).groupBy(col("item_a"), col("item_b"))
        .agg(sum(col("n_pair")).as("n_pair")).localCheckpoint(true),
      state.items.unionByName(ic).groupBy(col("item"))
        .agg(sum(col("n_item")).as("n_item")).localCheckpoint(true),
      state.baskets.unionByName(nb)
        .agg(sum(col("n_baskets")).as("n_baskets")).localCheckpoint(true))
  }

  /** [[frequentPairs]] read over streamed state: the support floors
    * filter the AGGREGATED tables (provably the same result set the
    * batch operator's pre-pairing prune reaches — a pair survives iff
    * both items clear the floor, whichever side of the pairing the
    * filter runs on). */
  def frequentPairsFrom(state: AssocState, minItemSupport: Long = 2,
      minPairSupport: Long = 2, topK: Int = 50): DataFrame = {
    val frequent = state.items.filter(col("n_item") >= minItemSupport)
    val ca = frequent.select(col("item").as("item_a"), col("n_item").as("n_a"))
    val cb = frequent.select(col("item").as("item_b"), col("n_item").as("n_b"))
    state.pairs.filter(col("n_pair") >= minPairSupport)
      .join(ca, "item_a").join(cb, "item_b")
      .crossJoin(broadcast(state.baskets))
      .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"),
        col("n_b"),
        round(col("n_pair").cast("double") * col("n_baskets") /
          (col("n_a").cast("double") * col("n_b")), 4).as("lift"),
        round(col("n_pair").cast("double") / col("n_a"), 4).as("conf_ab"))
      .orderBy(col("n_pair").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** [[itemRecs]] read over streamed state (same floor-commutation
    * argument as [[frequentPairsFrom]]). */
  def itemRecsFrom(state: AssocState, minItemSupport: Long = 2,
      minPairSupport: Long = 2, perItem: Int = 3): DataFrame = {
    val frequent = state.items.filter(col("n_item") >= minItemSupport)
    val pairs = state.pairs.filter(col("n_pair") >= minPairSupport)
      .join(frequent.select(col("item").as("item_a")), Seq("item_a"),
        "left_semi")
      .join(frequent.select(col("item").as("item_b")), Seq("item_b"),
        "left_semi")
    val directed = pairs.select(col("item_a").as("item"),
        col("item_b").as("rec"), col("n_pair"))
      .unionByName(pairs.select(col("item_b").as("item"),
        col("item_a").as("rec"), col("n_pair")))
    val ci = frequent.select(col("item"), col("n_item").as("n_i"))
    val cr = frequent.select(col("item").as("rec"), col("n_item").as("n_r"))
    val scored = directed.join(ci, "item").join(cr, "rec")
      .withColumn("sim", round(col("n_pair").cast("double") /
        sqrt(col("n_i").cast("double") * col("n_r")), 4))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("sim").desc, col("n_pair").desc, col("rec"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= perItem)
      .select(col("item"), col("rec"), col("n_pair"), col("sim"), col("rnk"))
  }

  /** Item-item recommendations: per item the top `perItem` co-occurring
    * items by basket-incidence cosine c(a,b)/√(c(a)·c(b)) (item-based
    * CF). The ranking window runs over the AGGREGATED, support-pruned
    * pair frame — its size is catalog², already cut by the supports,
    * not corpus-sized — and partitions by item, so no single task sees
    * more than one item's candidate list.
    * Output: (item, rec, n_pair, sim, rnk). */
  def itemRecs(df: DataFrame, basketCol: String, itemCol: String,
      minItemSupport: Long = 2, minPairSupport: Long = 2,
      perItem: Int = 3): DataFrame = {
    require(perItem >= 1, "perItem must be positive")
    val (pruned, frequent, _) = incidence(df, basketCol, itemCol,
      minItemSupport)
    val pairs = pairCounts(pruned, minPairSupport)
    // symmetrize: each undirected pair recommends in both directions
    val directed = pairs.select(col("item_a").as("item"),
        col("item_b").as("rec"), col("n_pair"))
      .unionByName(pairs.select(col("item_b").as("item"),
        col("item_a").as("rec"), col("n_pair")))
    val ci = frequent.select(col("item"), col("n_item").as("n_i"))
    val cr = frequent.select(col("item").as("rec"), col("n_item").as("n_r"))
    val scored = directed.join(ci, "item").join(cr, "rec")
      .withColumn("sim", round(col("n_pair").cast("double") /
        sqrt(col("n_i").cast("double") * col("n_r")), 4))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("sim").desc, col("n_pair").desc, col("rec"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= perItem)
      .select(col("item"), col("rec"), col("n_pair"), col("sim"), col("rnk"))
  }
}
