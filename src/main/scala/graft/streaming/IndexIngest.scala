package graft.streaming

import java.util.concurrent.atomic.AtomicReference
import org.apache.spark.sql.DataFrame
import graft.ops.{Association, Dedup, TextOps}
import graft.ops.TextOps.Bm25Index

/** Streaming index ingestion — keeps a live corpus' retrieval and
  * dedup indexes CURRENT from a document stream. The batch append
  * operators ([[TextOps.bm25AppendIndex]], [[Dedup.appendDedupIndex]])
  * tokenize/sign ONLY the new batch; this wires them into a
  * `foreachBatch` sink (the [[Dedup.microBatchNearDup]] pattern), so
  * every indexed query issued after batch N sees batches 1..N without
  * any corpus recompute — the shape a 100 TB live corpus needs (a
  * per-batch rebuild re-tokenizes the world each trigger).
  *
  * Caller contract (inherited from the append operators): batch ids
  * are globally fresh — bm25Append REJECTS collisions, the dedup
  * index would duplicate postings. foreachBatch gives at-least-once
  * delivery on retry; exactly-once ingestion needs an idempotent id
  * filter upstream (e.g. [[Dedup.streamingNearDupFilter]] or an
  * anti-join against the index's lens frame).
  */
object IndexIngest {

  /** foreachBatch sink: append each micro-batch to the live BM25
    * index (atomic reference swap — `foreachBatch` calls are
    * serialized per query, the reference is for the QUERYING side to
    * read concurrently) and to the on-disk dedup index directory.
    * After any batch, querying `bm25.get` / probing `dedupDir` is
    * row-identical to a full rebuild over (corpus ∪ batches so far) —
    * spec-pinned. */
  def bm25AndDedup(bm25: AtomicReference[Bm25Index], dedupDir: String,
      idCol: String, textCol: String, shingleN: Int = 4, bands: Int = 4,
      nBuckets: Int = 64): (DataFrame, Long) => Unit = { (batch, _) =>
    if (!batch.isEmpty) {
      // freeze the micro-batch ONCE: both appends scan it, and a
      // stream-source frame is not guaranteed re-readable after the
      // trigger completes
      val frozen = batch.localCheckpoint(eager = true)
      bm25.set(TextOps.bm25AppendIndex(bm25.get, frozen, idCol, textCol))
      Dedup.appendDedupIndex(frozen, idCol, textCol, dedupDir,
        shingleN, bands, nBuckets)
    }
  }

  /** foreachBatch sink completing VECTOR-side ingestion parity with
    * [[bm25AndDedup]]: append each micro-batch of embedding rows to
    * the on-disk IVF index and (optionally) the IVF-PQ coded index.
    * Centroids and codebooks are FROZEN at sink construction — the
    * deployment contract is "train once, load from the model
    * registry, append forever" (re-fitting per batch would re-assign
    * or re-code nothing but the batch and make the index internally
    * inconsistent). `centroids` is collected here once (k×dim
    * control-plane rows), not per trigger. After any batch, probing
    * either index is row-identical to a full rebuild over
    * (corpus ∪ batches so far) — spec-pinned. Caller contract: batch
    * ids are globally fresh (use an id anti-join upstream for
    * exactly-once, as with [[bm25AndDedup]]). */
  def ivfAppend(ivfDir: String, centroids: DataFrame, idCol: String,
      vecCol: String,
      pq: Option[(String, graft.ops.Pq.Codebooks)] = None):
      (DataFrame, Long) => Unit = {
    // freeze the centroid table once: a lazy plan would re-read (and
    // could re-derive) the registry table every trigger
    val frozenCents = centroids.localCheckpoint(eager = true)
    (batch, _) =>
      if (!batch.isEmpty) {
        val frozen = batch.localCheckpoint(eager = true)
        graft.ops.Similarity.appendIvfIndex(frozen, frozenCents,
          idCol, vecCol, ivfDir)
        pq.foreach { case (pqDir, cb) =>
          graft.ops.Pq.appendIvfPqIndex(frozen, frozenCents,
            idCol, vecCol, cb, pqDir)
        }
      }
  }

  /** foreachBatch sink completing IMAGE-side ingestion parity (r11):
    * decode each micro-batch of media payloads with the REAL pixel
    * decoders ([[graft.ops.Multimodal.imagePhashes]] — BMP/PNG/GIF/
    * JPEG; undecodable payloads drop, never fingerprinted) and append
    * the dHash postings to the on-disk perceptual-hash index. After
    * any batch, probing the directory is row-identical to a full
    * [[graft.ops.Multimodal.writePhashIndex]] rebuild over
    * (corpus ∪ batches so far) — spec-pinned. Caller contract: batch
    * ids are globally fresh (the family convention). `maxDist` is the
    * index LAYOUT — probes must use the same value. */
  def phashAppend(dir: String, idCol: String, payloadCol: String,
      maxDist: Int, nBuckets: Int = 64): (DataFrame, Long) => Unit = {
    (batch, _) =>
      if (!batch.isEmpty) {
        val frozen = batch.localCheckpoint(eager = true)
        graft.ops.Multimodal.appendPhashIndex(
          graft.ops.Multimodal.imagePhashes(frozen, idCol, payloadCol),
          "media_id", "phash", maxDist, dir, nBuckets)
      }
  }

  /** foreachBatch sink for the association miner: fold each
    * micro-batch of (basket, item) rows into the additive
    * [[Association.AssocState]] (atomic swap for concurrent readers).
    * After any batch, [[Association.frequentPairsFrom]] /
    * [[Association.itemRecsFrom]] over the live state are
    * row-identical to the batch operators over the union of every
    * basket streamed so far — spec-pinned. Caller contract: baskets
    * arrive whole in one micro-batch (see [[Association.AssocState]]). */
  def assocCounts(ref: AtomicReference[Association.AssocState],
      basketCol: String, itemCol: String): (DataFrame, Long) => Unit = {
    (batch, _) =>
      if (!batch.isEmpty)
        ref.set(Association.appendBaskets(ref.get, batch, basketCol,
          itemCol))
  }
}
