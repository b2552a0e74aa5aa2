package graft.engine

import org.apache.spark.sql.DataFrame
import graft.ops.{Association, Curation, Dedup, TextOps}

/** Dialect TABLE functions over the pipeline operator layer (SURVEY §8)
  * — `SELECT FROM dedup_pairs(documents, 'doc_id', 'text', 0.8)` runs
  * the MinHash-LSH near-dup join through plain `query(sql)` text, the
  * reference's one product surface. The reference made scalar functions
  * user-reachable from SQL (`OSQLEngine.registerFunction`,
  * `core/.../sql/OSQLEngine.java`); graft lifts the table-shaped
  * pipeline operators to FROM position the same way, so a SQL-only
  * client can reach the curation layer without the Scala API.
  *
  * Argument shapes are deliberately rigid (class name, string literals,
  * numeric literals — checked with parse-error semantics, matching the
  * unknown-function contract §2.5): the functions dispatch straight to
  * the [[graft.ops]] implementations, so every scale property (banded
  * LSH, partial-agg elections, broadcastable plans) is inherited, and
  * the results are oracle-checked by the same DuckDB SQL as the
  * operators' Scala-API gate queries. */
object PipelineTables {
  import Ast._

  /** the registered table-function names (parser-fuzz + docs surface). */
  val names: Set[String] =
    Set("dedup_pairs", "exact_dups", "quality_gate", "c4_clean",
      "fingerprints", "chunk_docs", "bm25_topk", "frequent_pairs",
      "rake_phrases", "profile", "chi_square", "acf", "attribution",
      "histogram", "fd_audit", "kaplan_meier", "holt_linear", "dau_mau",
      "attribution_multi", "word_embeddings", "zipf_fit",
      "image_dup_pairs", "image_dup_clusters", "audio_dup_pairs",
      "video_dup_pairs", "video_fingerprints",
      "video_dup_pairs_offset")

  def resolve(catalog: Catalog, fn: String,
      args: Seq[SqlExpr]): DataFrame = {
    def bad(msg: String): Nothing =
      throw Parser.ParseException(s"table function $fn: $msg")
    def classArg(i: Int): DataFrame = args.lift(i) match {
      case Some(Path(List(FieldSeg(n)))) => catalog.polymorphicScan(n)
      case other => bad(s"argument ${i + 1} must be a class name, got $other")
    }
    def strArg(i: Int): String = args.lift(i) match {
      case Some(Lit(s: String)) => s
      case other =>
        bad(s"argument ${i + 1} must be a string literal, got $other")
    }
    def numArg(i: Int): Double = args.lift(i) match {
      case Some(Lit(v: Long)) => v.toDouble
      case Some(Lit(v: Double)) => v
      case other =>
        bad(s"argument ${i + 1} must be a numeric literal, got $other")
    }
    def intArg(i: Int): Int = args.lift(i) match {
      case Some(Lit(v: Long)) if v >= Int.MinValue && v <= Int.MaxValue =>
        v.toInt
      case other =>
        bad(s"argument ${i + 1} must be an integer literal, got $other")
    }
    def arity(n: Int): Unit =
      if (args.size != n) bad(s"expects $n arguments, got ${args.size}")
    /** Hamming radius with the banding contract validated at PARSE
      * time (phashPairs' own require would surface as a runtime
      * error, not the §2.5 parse-error contract). */
    def distArg(i: Int): Int = {
      val d = intArg(i)
      if (d < 0 || d > 15)
        bad(s"argument ${i + 1} (maxDist) must be in [0, 15], got $d")
      d
    }

    fn match {
      case "dedup_pairs" => // (class, idField, textField, threshold)
        arity(4)
        Dedup.minhashPairs(classArg(0), strArg(1), strArg(2), numArg(3))
      case "exact_dups" => // (class, idField, textField)
        arity(3)
        Dedup.exactGroups(classArg(0), strArg(1), strArg(2))
      case "quality_gate" => // (class, idField, textField)
        arity(3)
        TextOps.qualityGate(classArg(0), strArg(1), strArg(2))
      case "c4_clean" => // (class, idField, textField)
        arity(3)
        Curation.c4LineRules(classArg(0), strArg(1), strArg(2))
      case "fingerprints" => // (class, idField, textField, k)
        arity(4)
        TextOps.fingerprintTable(classArg(0), strArg(1), strArg(2),
          intArg(3))
      case "chunk_docs" => // (class, idField, textField, size, overlap)
        arity(5)
        Curation.chunkDocs(classArg(0), strArg(1), strArg(2),
          intArg(3), intArg(4))
      case "bm25_topk" => // (class, idField, textField, 'terms…', k)
        arity(5)
        val terms = strArg(3).split("\\s+").toSeq.filter(_.nonEmpty)
        if (terms.isEmpty) bad("argument 4 must name at least one term")
        TextOps.bm25TopK(classArg(0), strArg(1), strArg(2), terms,
          intArg(4))
      case "frequent_pairs" => // (class, basketF, itemF, minI, minP, k)
        arity(6)
        Association.frequentPairs(classArg(0), strArg(1), strArg(2),
          intArg(3).toLong, intArg(4).toLong, intArg(5))
      case "rake_phrases" => // (class, textField, maxLen, minCount, k)
        arity(5)
        TextOps.rakePhrases(classArg(0), strArg(1), intArg(2),
          intArg(3).toLong, intArg(4))
      case "profile" => // (class) — columns derived from the schema
        arity(1)
        graft.ops.Profile.tableProfileAuto(classArg(0))
      case "chi_square" => // (class, fieldA, fieldB)
        arity(3)
        graft.ops.Analytics.chiSquare(classArg(0), strArg(1), strArg(2))
      case "acf" => // (class, tsField, maxLag)
        arity(3)
        graft.ops.Analytics.acfDaily(classArg(0), strArg(1), intArg(2))
      case "attribution" =>
        // (class, userF, tsF, idF, typeF, convType, windowUs)
        arity(7)
        graft.ops.Funnel.lastTouchAttribution(classArg(0), strArg(1),
          strArg(2), strArg(3), strArg(4), strArg(5),
          numArg(6).toLong)
      case "attribution_multi" =>
        // (class, userF, tsF, idF, typeF, convType, windowUs, model)
        // model: 'linear' | 'position' (U-shaped 40/40/20)
        arity(8)
        val model = strArg(7)
        if (model != "linear" && model != "position")
          bad("argument 8 must be 'linear' or 'position'")
        graft.ops.Funnel.multiTouchAttribution(classArg(0), strArg(1),
          strArg(2), strArg(3), strArg(4), strArg(5),
          numArg(6).toLong, model)
      case "zipf_fit" => // (class, textF, topK)
        arity(3)
        graft.ops.TextOps.zipfFit(classArg(0), strArg(1), intArg(2))
      case "word_embeddings" =>
        // (class, idF, textF, vocabK, shift, iters[, k]) — trained
        // rank-k word vectors (top-K vocab, ±2 skip-grams, shifted
        // PPMI, symmetric factorization); k defaults to 2 (r11 plumbs
        // it through; deflation makes components prefix-stable).
        // Returns (id, e0..e{k-1}).
        if (args.size < 6 || args.size > 7)
          bad(s"expects 6 or 7 arguments, got ${args.size}")
        val vocabK = intArg(3)
        val k = if (args.size == 7) intArg(6) else 2
        if (k < 1 || k > 16 || k > vocabK)
          bad(s"argument 7 (rank k) must sit in [1, min(16, vocabK)], " +
            s"got $k")
        graft.ops.Embeddings.wordEmbeddings(classArg(0), strArg(1),
          strArg(2), vocabK, intArg(4), intArg(5), k)
      case "histogram" => // (class, numField, bins)
        arity(3)
        graft.ops.Profile.equiWidthHistogram(classArg(0),
          org.apache.spark.sql.functions.col(strArg(1)), intArg(2))
      case "fd_audit" => // (class, 'col1,col2,…')
        arity(2)
        val cols = strArg(1).split(",").map(_.trim).filter(_.nonEmpty)
        if (cols.length < 2) bad("argument 2 must name >= 2 columns")
        graft.ops.Profile.fdDiscover(classArg(0), cols.toSeq)
      case "kaplan_meier" => // (class, userF, tsF, cutoffDays)
        arity(4)
        graft.ops.Funnel.kaplanMeier(classArg(0), strArg(1), strArg(2),
          intArg(3).toLong)
      case "holt_linear" => // (class, tsF, alphaMicro, betaMicro)
        arity(4)
        graft.ops.Analytics.holtLinear(classArg(0), strArg(1),
          intArg(2).toLong, intArg(3).toLong)
      case "dau_mau" => // (class, userF, tsF, windowDays, k)
        arity(5)
        graft.ops.Funnel.dauMau(classArg(0), strArg(1), strArg(2),
          intArg(3), intArg(4))
      // r11: the multimodal dedup operators reach SQL — a class whose
      // payload field holds image/audio bytes runs the full decode →
      // fingerprint → banded-Hamming pipeline from query text
      case "image_dup_pairs" => // (class, idField, payloadField, maxDist)
        arity(4)
        graft.ops.Multimodal.phashPairs(
          graft.ops.Multimodal.imagePhashes(classArg(0), strArg(1),
            strArg(2)), "media_id", "phash", distArg(3))
      case "image_dup_clusters" => // (class, idField, payloadField, maxDist)
        arity(4)
        Dedup.nearDupClusters(
          graft.ops.Multimodal.phashPairs(
            graft.ops.Multimodal.imagePhashes(classArg(0), strArg(1),
              strArg(2)), "media_id", "phash", distArg(3)),
          "a_id", "b_id")
      case "audio_dup_pairs" => // (class, idField, payloadField, maxDist)
        arity(4)
        graft.ops.Multimodal.phashPairs(
          graft.ops.Multimodal.audioFingerprints(classArg(0), strArg(1),
            strArg(2)), "media_id", "phash", distArg(3))
      case "video_dup_pairs" =>
        // (class, idField, payloadField, maxDist) — aligned per-frame
        // near-dup pairs over animated payloads (r11)
        arity(4)
        graft.ops.Multimodal.videoPhashPairs(
          graft.ops.Multimodal.videoPhashes(classArg(0), strArg(1),
            strArg(2)), distArg(3))
      case "video_fingerprints" =>
        // (class, idField, payloadField) — order-aware temporal
        // exact-dedup keys (r11)
        arity(3)
        graft.ops.Multimodal.videoFingerprints(classArg(0), strArg(1),
          strArg(2))
      case "video_dup_pairs_offset" =>
        // (class, idField, payloadField, maxDist, maxOffset) — the
        // offset-tolerant near-dup join (r12): trimmed/prepended
        // re-encodes pair at the best |delta| <= maxOffset alignment
        arity(5)
        val off = intArg(4)
        if (off < 0 || off > 16) throw Parser.ParseException(
          s"maxOffset must be in [0, 16], got $off")
        graft.ops.Multimodal.videoPhashPairsOffset(
          graft.ops.Multimodal.videoPhashes(classArg(0), strArg(1),
            strArg(2)), distArg(3), off)
      case other =>
        // unknown function → parse error (§2.5 contract, same as
        // scalar functions)
        throw Parser.ParseException(s"unknown table function '$other'")
    }
  }
}
