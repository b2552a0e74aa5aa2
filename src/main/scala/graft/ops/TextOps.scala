package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text primitives for the training-data pipeline
  * operators (dedup, fingerprinting, quality scoring). Every hash is
  * derived from md5 so the identical computation is expressible in
  * DuckDB for the oracle gate; everything is built from codegen'd
  * builtins — no UDFs, no driver-side loops.
  */
object TextOps {

  /** 60-bit positive hash: first 15 hex chars of md5. Stable across
    * systems (md5 is md5 everywhere), cheap enough at 100 TB scale. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** hash reduced into [0, p) for modular minhash arithmetic. */
  def hashMod(c: Column, p: Long): Column = hash60(c) % p

  /** 32-bit hash for simhash bit sampling. */
  def hash32(c: Column): Column = hash60(c) % 4294967296L

  /** distinct character n-gram shingles of a string column. Texts
    * shorter than n yield an empty array (guard required: Spark's
    * sequence(0, stop) counts DOWN when stop < 0, which would emit
    * phantom shingles and diverge from the DuckDB oracle's range()). */
  def charShingles(c: Column, n: Int): Column =
    when(length(c) >= n,
      array_distinct(transform(
        sequence(lit(0), length(c) - n),
        i => c.substr(i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** whitespace tokens (lower-cased). */
  def tokensWs(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  /** BPE-ish tokens: letter runs, digit runs, single punctuation. */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokensBpe(c: Column): Column =
    regexp_extract_all(lower(c), lit(bpePattern), lit(0))

  /** Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  // ------------------------------------------------------------ minhash
  /** seeded (a,b) coefficients for the k permutations
    * h_i(x) = (a_i * x + b_i) mod P  (x already reduced mod P, so the
    * product stays < 2^62 — no overflow on either engine). */
  val MinhashP: Long = 2147483647L
  val MinhashK: Int = 16
  val minhashCoeffs: Seq[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    Seq.fill(MinhashK)(
      (rng.nextInt((MinhashP - 2).toInt).toLong + 1L,
        rng.nextInt((MinhashP - 1).toInt).toLong))
  }

  /** minhash signature element i over a PRE-HASHED shingle column
    * (hash each shingle once, not once per permutation — 16× fewer
    * md5 evaluations on a 100 TB corpus). */
  def minhashSig(shingleHashes: Column, i: Int): Column = {
    val (a, b) = minhashCoeffs(i)
    array_min(transform(shingleHashes,
      h => (lit(a) * h + lit(b)) % MinhashP))
  }

  // ------------------------------------------------------------ simhash
  /** 32-bit simhash over a precomputed token-hash array column:
    * bit b set iff Σ_tokens (bit_b(h) ? +1 : -1) > 0. Expressed with
    * floor-division so Spark and DuckDB compute identically. */
  def simhashExpr(hs: Column): Column =
    (0 until 32).map { b =>
      val contrib = aggregate(hs, lit(0L),
        (acc, h) => acc + when(
          pmod(floor(h / lit(math.pow(2, b))).cast("long"), lit(2L)) === 1L,
          1L).otherwise(-1L))
      when(contrib > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ----------------------------------------------------- fingerprint
  /** bottom-k sketch fingerprint: the k smallest shingle hashes,
    * sorted, joined — a compact, order-insensitive document signature
    * (winnowing-style). Expression form; for corpus-scale use
    * [[fingerprintTable]] (explode + codegen instead of interpreted
    * per-row array lambdas). */
  def fingerprint(shingles: Column, k: Int): Column =
    concat_ws("-", slice(array_sort(transform(shingles, hash60 _)), 1, k))

  /** (idCol, fp) fingerprint table: shingle explode → codegen'd md5 →
    * per-doc bottom-k via window → sorted concat. One shuffle, no
    * interpreted higher-order functions on the hot path. */
  def fingerprintTable(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int, shingleN: Int = 4): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("__h"))
    val bottomK = Partitioning.spread(df).select(col(idCol),
        explode(charShingles(col(textCol), shingleN)).as("__s"))
      .withColumn("__h", hash60(col("__s")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .groupBy(col(idCol))
      .agg(concat_ws("-", sort_array(collect_list(col("__h")))).as("fp"))
    df.select(col(idCol)).distinct().join(bottomK, Seq(idCol), "left")
  }

  // ------------------------------------------------------ tf-idf
  /** TF-IDF per (doc, term): tf = in-doc count, idf = ln((N+1)/(df+1)),
    * computed corpus-wide via one token explode + two aggregations
    * (DF is a broadcastable per-term table). */
  def tfidf(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val n = df.count()
    val toks = Partitioning.spread(df)
      .select(col(idCol), explode(tokensWs(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col(idCol), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .withColumn("score",
        round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 6))
  }

  /** word n-grams of a token array, space-joined (empty when fewer
    * than n tokens) — the decontamination unit (benchmark overlap is
    * measured in word n-grams, not characters). */
  def wordNgrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ",
          (0 until n).map(j => element_at(tokens, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** word bigrams of a token array (empty when fewer than 2 tokens). */
  def bigrams(tokens: Column): Column =
    when(size(tokens) >= 2,
      transform(sequence(lit(1), size(tokens) - 1),
        i => concat(element_at(tokens, i), lit(" "),
          element_at(tokens, i + 1))))
      .otherwise(array().cast("array<string>"))

  // ------------------------------------------- cleaning / repetition
  /** canonical text normalization for exact-dedup keys: lower-case,
    * strip non-alphanumerics, collapse whitespace. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** duplicate-n-gram fraction (Gopher-style repetition signal):
    * 1 − distinct/total over word n-grams; highly repetitive docs
    * score near 1 and get filtered before training. */
  def repetitionFraction(tokens: Column, n: Int): Column = {
    val grams = wordNgrams(tokens, n)
    when(size(grams) === 0, lit(0.0d))
      .otherwise(lit(1.0d) -
        size(array_distinct(grams)).cast("double") / size(grams))
  }

  // ------------------------------------------------------ lang id
  /** tiny per-language marker token lists (n-gram heuristic surface;
    * scoring = marker-hit count per language, argmax wins). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "value", "table", "fast"),
    "de" -> Seq("der", "und", "ist", "wert", "tabelle"),
    "fr" -> Seq("le", "la", "et", "valeur", "vite"),
    "es" -> Seq("el", "la", "y", "valor", "rapido"),
    "zh" -> Seq("de", "shi", "biao", "zhi", "kuai"))

  def langScore(tokens: Column, markers: Seq[String]): Column =
    markers.map(m => size(filter(tokens, t => t === m))).reduce(_ + _)
}
