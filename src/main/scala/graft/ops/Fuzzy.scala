package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion-neighborhood fuzzy string matching (FastSS, Bocek et al.
  * 2007; popularized as SymSpell — both public): two strings are
  * within Levenshtein distance 1 iff their deletion-key sets
  * {s} ∪ deletes₁(s) intersect, so candidate generation for an exact
  * distance-≤1 join is a plain EQUI-JOIN on short keys. That is the
  * scale shape: no length-band blocking (string length is a
  * pathologically hot key — a handful of distinct values over a whole
  * vocabulary), no quadratic verify; each side explodes to |s|+1 keys
  * and candidates are verified by one codegen'd `levenshtein` each.
  *
  * The reference's closest surface is LIKE/MATCHES filtering
  * (`OQueryOperatorLike.java`) — fuzzy vocabulary matching is
  * north-star scope (query-typo tolerance, OCR cleanup, spelling
  * normalization in a curation pipeline).
  */
object Fuzzy {

  /** the string itself plus every single-character deletion. The HOF
    * transform's interpreted lambda runs per DISTINCT term only (call
    * sites dedupe first) — bounded by vocabulary size, never corpus
    * size. */
  def deleteKeys(c: Column): Column =
    when(length(c) > 0,
      array_distinct(concat(array(c),
        transform(sequence(lit(1), length(c)),
          i => concat(c.substr(lit(1), i - lit(1)),
            c.substr(i + lit(1), length(c)))))))
      .otherwise(array(c))

  /** Top-1 fuzzy match per distinct query term against a vocabulary —
    * EXACT for Levenshtein distance ≤ 1 (the FastSS key property; the
    * oracle brute-forces all pairs, so a lost candidate fails the
    * gate). Ties break on (dist, term) — a total order. Survivor
    * selection is a partial-combining struct-min, never a window over
    * the query key. Unmatched queries are dropped. Returns
    * (q, matched, dist). */
  def fuzzyMatchTop1(queries: DataFrame, qCol: String,
      vocab: DataFrame, vCol: String): DataFrame = {
    val qk = queries.select(col(qCol).as("__q")).distinct()
      .select(col("__q"), explode(deleteKeys(col("__q"))).as("__k"))
    val vk = vocab.select(col(vCol).as("__v")).distinct()
      .select(col("__v"), explode(deleteKeys(col("__v"))).as("__k"))
    qk.join(vk, "__k")
      .select("__q", "__v").distinct()
      .withColumn("__d", levenshtein(col("__q"), col("__v")))
      .filter(col("__d") <= 1)
      .groupBy(col("__q").as("q"))
      .agg(min(struct(col("__d").as("d"), col("__v").as("v"))).as("__m"))
      .select(col("q"), col("__m.v").as("matched"),
        col("__m.d").as("dist"))
  }
}
