package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType,
  StructField, StructType}

/** Trained embeddings in-engine: shifted PPMI + truncated symmetric
  * factorization (Levy & Goldberg, NIPS 2014 — skip-gram with k
  * negative samples implicitly factorizes the PMI matrix shifted by
  * ln k; public paper). Closes the loop the co-occurrence harvests
  * left open: `GraphOps.walkSkipgrams` (node pairs) and the word-pair
  * counts stopped at counts — this turns either into dense vectors
  * that feed the existing ANN / semantic-dedup / bitext stack.
  *
  * The reference has no embedding trainer (beyond-reference pipeline
  * surface); determinism discipline is the repo's [[Pca]] pattern:
  * distributed EXACT-integer aggregation (pair counts, marginals),
  * a 6-decimal-rounded SPPMI frame so both engines factorize
  * BIT-IDENTICAL inputs, then sequential driver-side power iteration
  * + deflation (identical operation order to the DuckDB recursive-CTE
  * replay — the qp_pca_project precedent at 64 dims × 200 iters).
  */
object Embeddings {

  /** strict UTF-8 byte-order comparison (DuckDB's binary collation). */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < a.length && i < b.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** Shifted-PPMI entries from co-occurrence counts
    * `pairs(aCol, bCol, nCol)`:
    * `sppmi(a,b) = ln(n_ab·N / (r_a·c_b)) − ln(shift)`, rounded to 6
    * decimals, POSITIVE entries only (the sparse max(0,·) matrix).
    * All inputs are exact integer sums; the only float ops are one
    * division, one `ln` and the rounding — the same expression the
    * oracle runs.
    *
    * Scale shape: two partial-agg marginals equi-joined back on their
    * keys + one 1-row total cross join — the matrix stays SPARSE
    * in-plan, never densified. Skip-gram harvests are symmetric
    * (every ordered pair appears both ways), making the matrix
    * symmetric — the contract [[factorize]]'s eigendecomposition
    * needs. Returns (a, b, sppmi). */
  def sppmi(pairs: DataFrame, aCol: String, bCol: String, nCol: String,
      shift: Int): DataFrame = {
    require(shift >= 1, "shift must be a positive negative-sample count")
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b"),
      col(nCol).cast("long").as("n"))
    // __-prefixed names: Spark resolution is case-insensitive, so a
    // bare "N" total would collide with the "n" pair count
    val tot = p.agg(sum(col("n")).as("__tot"))
    val ra = p.groupBy("a").agg(sum(col("n")).as("__ra"))
    val cb = p.groupBy("b").agg(sum(col("n")).as("__cb"))
    p.join(ra, "a").join(cb, "b")
      .crossJoin(broadcast(tot))
      .withColumn("sppmi", round(
        log(col("n").cast("double") * col("__tot") /
          (col("__ra").cast("double") * col("__cb")))
          - log(lit(shift.toDouble)), 6))
      .filter(col("sppmi") > 0)
      .select(col("a"), col("b"), col("sppmi"))
  }

  /** End-to-end word embeddings from a text column — the composed
    * pipeline behind `qp_word_embeddings` and the `word_embeddings`
    * SQL table function: top-`vocabK` vocabulary (count desc, term
    * asc — deterministic), ±2 skip-gram pairs over ORIGINAL token
    * positions (non-vocab tokens hold their slots but pair with
    * nothing), [[sppmi]](shift), rank-`k` [[factorize]] (k was fixed
    * at 2 through r10; r11 plumbs it through — the recursive-CTE
    * oracle generator emits one deflation stage per component, and
    * deflation makes components PREFIX-STABLE: a rank-3 run's e0/e1
    * equal the rank-2 run's, spec-pinned). Returns (id, e0..e{k-1})
    * — id = the vocabulary term.
    *
    * Scale shape: one posexplode corpus pass; the vocabulary is
    * top-K (broadcastable by construction); the pair harvest is a
    * (doc, position)-key equi-join of the vocab-filtered token frame
    * with itself (fan-out bounded at 4 offsets/row); the SPPMI
    * marginals partial-combine; only the V×V control-plane matrix
    * reaches the driver. */
  def wordEmbeddings(df: DataFrame, idCol: String, textCol: String,
      vocabK: Int, shift: Int, iters: Int, k: Int = 2): DataFrame = {
    require(vocabK >= 2, "need a vocabulary of at least 2 terms")
    require(k >= 1 && k <= vocabK,
      s"rank k=$k must sit in [1, vocabK=$vocabK]")
    val toks = Partitioning.spread(df).select(col(idCol).as("__doc"),
      posexplode(TextOps.tokensWs(col(textCol))).as(Seq("pos", "term")))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("term")).limit(vocabK)
      .select("term")
    val tv = toks.join(broadcast(vocab), "term").localCheckpoint()
    val probe = tv.select(col("__doc"), col("term").as("a"), col("pos"),
        explode(typedlit(Seq(-2, -1, 1, 2))).as("__o"))
      .select(col("__doc"), col("a"), (col("pos") + col("__o")).as("pos"))
    val pairsDf = probe
      .join(tv.select(col("__doc"), col("pos"), col("term").as("b")),
        Seq("__doc", "pos"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
    factorize(sppmi(pairsDf, "a", "b", "n", shift), k = k, iters = iters)
  }

  /** Rank-k factorization of a [[sppmi]] frame into embeddings:
    * collect the sparse matrix (bounded-vocabulary contract — the
    * caller prunes to a top-V vocabulary or a walk-visited vertex
    * set; `maxVocab` guards the V² driver matrix the same way the
    * IVF/PCA control-plane math is d²-bounded), run the SHARED
    * [[Pca.powerEigs]] power iteration + deflation, and emit the
    * Levy–Goldberg symmetric-SVD embedding `e_c(i) = v_c(i)·√λ_c`
    * (λ is the iteration's final norm, ≥ 0 by construction; the
    * fixed iteration count and fixed start/sign conventions make the
    * result deterministic and exactly replayable in SQL).
    * Output: (id, e0..e{k-1}), ids in their natural order. */
  def factorize(sppmiDf: DataFrame, k: Int, iters: Int,
      maxVocab: Int = 2048): DataFrame = {
    require(k >= 1 && iters >= 1, "need k >= 1 components, iters >= 1")
    val spark = sppmiDf.sparkSession
    val idType = sppmiDf.schema("a").dataType
    val rows = sppmiDf
      .select(col("a"), col("b"), col("sppmi").cast("double"))
      .collect()
    val entries = rows.map(r => (r.get(0), r.get(1), r.getDouble(2)))
    // fail fast on other id types: silently .toString-ing an integer
    // id column would change the output schema to string AND the sort
    // to lexicographic ('10' < '2'), desyncing a numeric oracle
    require(idType == LongType || idType == StringType,
      s"factorize id columns must be bigint or string, got $idType — " +
        "cast the pair frame's keys first")
    val ids: Array[Any] = idType match {
      case LongType => entries.flatMap(e => Seq(e._1, e._2)).distinct
        .map(_.asInstanceOf[Long]).sorted.map(x => x: Any)
      case _ =>
        // UTF-8 byte order, matching DuckDB's binary ORDER BY collation
        // (Scala's default String sort is UTF-16 code-unit order, which
        // diverges for supplementary-plane characters, e.g. emoji)
        entries.flatMap(e => Seq(e._1, e._2)).distinct.map(_.toString)
          .sortWith(utf8Lt).map(x => x: Any)
    }
    val v = ids.length
    require(v >= 1, "factorize needs a non-empty positive-SPPMI frame" +
      " — lower the shift (a shift larger than every PMI value zeroes" +
      " the matrix)")
    require(v <= maxVocab,
      s"factorize vocabulary $v exceeds maxVocab=$maxVocab — prune the " +
        "pair frame (top-V vocabulary / bounded walk set) first")
    val ix = ids.zipWithIndex.toMap
    val m = Array.ofDim[Double](v, v)
    entries.foreach { case (a, b, x) =>
      val key: Any = idType match {
        case LongType => a
        case _ => a.toString
      }
      val keyB: Any = idType match {
        case LongType => b
        case _ => b.toString
      }
      m(ix(key))(ix(keyB)) = x
    }
    val eig = Pca.powerEigs(m, v, k, iters)
    val out = ids.zipWithIndex.map { case (id, i) =>
      val es = eig.map { case (lam, vec) =>
        val e = vec(i) * math.sqrt(math.max(lam, 0.0))
        // BigDecimal.decimal = the shortest-repr rounding Spark's own
        // round() uses (HALF_UP on valueOf), matching DuckDB round at
        // 6 decimals; + 0.0 canonicalizes IEEE -0.0 (covarianceDF rule)
        BigDecimal.decimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble + 0.0
      }
      org.apache.spark.sql.Row.fromSeq(id +: es)
    }
    val schema = StructType(
      StructField("id", idType match {
        case LongType => LongType
        case _ => StringType
      }) +: (0 until k).map(c => StructField(s"e$c", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq, 1), schema)
  }
}
