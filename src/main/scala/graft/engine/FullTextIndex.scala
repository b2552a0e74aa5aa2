package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.FullText

/** Persisted inverted index backing indexed CONTAINSTEXT — the Spark
  * rendering of the reference's word→RID-list FULLTEXT index
  * (`OPropertyIndexFullText.java:92-200`: each significant word maps to
  * the set of records containing it; queries probe the index instead of
  * scanning).
  *
  * The posting table is one DataFrame of distinct `(__ft_word,
  * __ft_key)` rows, built by a single tokenize-explode pass and kept
  * persisted. A CONTAINSTEXT over an indexed field becomes: filter the
  * posting table to the (few) query words, count distinct matched words
  * per key, keep keys matching ALL words, semi-join back — the corpus
  * text column is never re-tokenized at query time.
  *
  * Scale path: at 100 TB the posting table is written out bucketed by
  * `__ft_word` so a probe reads only the buckets of the query's words;
  * in-session it stays a persisted shuffle output. DML invalidates the
  * affected class's postings (rebuilt lazily on next indexed query) —
  * the reference updates its MVRB-tree in-place per record, a
  * non-goal for a batch-columnar engine.
  */
final class FullTextIndexStore {
  private val postings =
    scala.collection.mutable.Map[(String, String), DataFrame]()

  /** driver-side replica of [[FullText.tokens]] for the query literal:
    * strip ignore chars, lower-case, whitespace-split, drop stop words,
    * distinct. MUST stay in lock-step with the column version — the
    * indexed and scan paths have to agree on what a "word" is. */
  def significantWords(text: String): Seq[String] =
    text.toLowerCase
      .filterNot(FullText.ignoreChars.contains(_))
      .split("\\s+").toSeq
      .filter(_.nonEmpty)
      .distinct
      .filterNot(FullText.stopWords.contains)

  /** posting table for (cls, field), building and persisting it on
    * first use (or first use after invalidation). */
  def postingFor(catalog: Catalog, clsName: String,
      field: String): DataFrame = synchronized {
    val cls = catalog.get(clsName)
    val key = cls.ridPosCol.getOrElse(throw new IllegalArgumentException(
      s"FULLTEXT index requires a keyed class; ${cls.name} has none"))
    postings.getOrElseUpdate((cls.name.toLowerCase, field.toLowerCase), {
      // hash-partitioned BY KEY before persisting: the query path's
      // per-key word count then needs no exchange (the cached scan
      // reports hash(__ft_key) partitioning), leaving only the final
      // semi-join — whose small matched-key side AQE broadcasts
      val p = catalog.table(cls.name)
        .select(col(key).cast("long").as("__ft_key"),
          explode(FullText.tokens(col(field))).as("__ft_word"))
        .distinct()
        .repartition(col("__ft_key"))
        .persist()
      p.count() // materialize: build cost is paid at CREATE INDEX time
      p
    })
  }

  /** keys whose indexed field contains ALL `words` (the CONTAINSTEXT
    * conjunction): posting rows are distinct per (key, word), so a key
    * matches iff its filtered posting count equals the word count. */
  def matchingKeys(catalog: Catalog, clsName: String, field: String,
      words: Seq[String]): DataFrame =
    postingFor(catalog, clsName, field)
      .filter(col("__ft_word").isin(words: _*))
      .groupBy(col("__ft_key"))
      .agg(count(lit(1)).as("__ft_n"))
      .filter(col("__ft_n") === words.size)
      .select(col("__ft_key"))

  /** DML on a class makes its postings stale — drop them; the next
    * indexed query rebuilds from the new data. */
  def invalidate(clsName: String): Unit = synchronized {
    val stale = postings.keys.filter(_._1 == clsName.toLowerCase).toSeq
    stale.foreach { k =>
      postings.remove(k).foreach(_.unpersist())
    }
  }

  def remove(clsName: String, field: String): Unit = synchronized {
    postings.remove((clsName.toLowerCase, field.toLowerCase))
      .foreach(_.unpersist())
  }
}
