package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL-function registry mirroring `OSQLEngine.registerFunction`
  * (reference `OSQLEngine.java:26-49`: functions are pluggable at
  * runtime; unknown function → parse error). Functions compile to
  * Catalyst `Column`s — codegen'd, no UDF in the hot path.
  */
final class FunctionRegistry {
  private val fns =
    scala.collection.mutable.Map[String, Seq[Column] => Column]()
  BuiltinFunctions.all.foreach { case (n, f) => fns(n) = f }

  def register(name: String, f: Seq[Column] => Column): Unit =
    fns(name.toLowerCase) = f
  def lookup(name: String): Option[Seq[Column] => Column] =
    fns.get(name.toLowerCase)
  def contains(name: String): Boolean = fns.contains(name.toLowerCase)
}

object BuiltinFunctions {

  /** Haversine distance in km, exactly the reference formula
    * (`OSQLFunctionDistance.java:22-59`: Earth radius 6371 km,
    * atan2 form; null in → null out). Pure builtin composition —
    * whole-stage-codegen friendly, no UDF. */
  def distance(args: Seq[Column]): Column = {
    val Seq(lat1d, lon1d, lat2d, lon2d) = args.take(4).map(radians)
    val dLat = lat2d - lat1d
    val dLon = lon2d - lon1d
    val a = pow(sin(dLat / 2), 2) +
      cos(lat1d) * cos(lat2d) * pow(sin(dLon / 2), 2)
    lit(2) * atan2(sqrt(a), sqrt(lit(1) - a)) * lit(6371.0)
  }

  /** KMV approximate COUNT(DISTINCT) (k = 256): the bounded-state
    * bottom-k sketch aggregate ([[graft.ops.Sketch]]) surfaced as a
    * dialect function — `select approx_distinct(field) from cls`
    * costs ≤ k longs of aggregation state instead of shuffling every
    * distinct value, and groups under k report exact counts. Hash
    * runs inside the aggregate child (interpreted per row — fine at
    * dialect scale; corpus-scale callers use `Sketch.kmvDistinct`,
    * which hashes in a codegen'd projection). Nulls are skipped, as
    * COUNT(DISTINCT) skips them. */
  def approxDistinct(args: Seq[Column]): Column = {
    val k = 256
    val h = graft.ops.TextOps.hash60(args.head.cast("string"))
    val mins = org.apache.spark.sql.classic.GraftColumnBridge.column(
      graft.ops.BottomKDistinct(
        org.apache.spark.sql.classic.GraftColumnBridge.expression(h), k)
        .toAggregateExpression())
    when(size(mins) < k, size(mins).cast("long"))
      .otherwise(round(lit((k - 1) * graft.ops.Sketch.HashSpace) /
        element_at(mins, k)).cast("long"))
  }

  /** `approx_percentile(field, pct)` dialect aggregate: percentile of
    * the DISTINCT-value distribution from the same KMV bottom-k
    * machinery as [[approxDistinct]] ([[graft.ops.BottomKSample]]
    * keyed by the value hash — duplicates collapse, collisions keep
    * the min value). EXACT whenever the column has ≤ k distinct
    * values; above k it is the percentile of a deterministic uniform
    * distinct-value sample (a set property of the data — partition-
    * invariant, replayable in the oracle). Bounded state: ≤ 2k longs
    * per group vs shuffling every value for an exact percentile.
    * Integer rank rule `(pct·(n−1)) div 100` (exact in double —
    * both factors < 2^53). */
  def approxPercentile(args: Seq[Column]): Column = {
    require(args.length == 2, "approx_percentile(field, pct)")
    val k = 256
    val v = args.head.cast("long")
    val h = graft.ops.TextOps.hash60(v.cast("string"))
    val mins = org.apache.spark.sql.classic.GraftColumnBridge.column(
      graft.ops.BottomKSample(
        org.apache.spark.sql.classic.GraftColumnBridge.expression(h),
        org.apache.spark.sql.classic.GraftColumnBridge.expression(v), k)
        .toAggregateExpression())
    val sorted = array_sort(mins)
    element_at(sorted,
      (floor(args(1).cast("long") * (size(sorted) - 1) / 100) + 1)
        .cast("int"))
  }

  /** `top_values(field, n)` dialect aggregate: the n LARGEST distinct
    * integral values, descending, '-'-joined (scalar output — the
    * gate's no-array-column rule): [[graft.ops.BottomKDistinct]] over
    * the NEGATED value keeps ≤ n longs of set-semantics state per
    * group where the naive form is a DISTINCT + global sort; the
    * close (negate back, stringify, join) runs on the ≤ n-element
    * result array, control-plane like the percentile sort. `n` must
    * be a literal (it sizes the aggregation buffer at plan time). */
  def topValues(args: Seq[Column]): Column = {
    require(args.length == 2, "top_values(field, n)")
    val n = org.apache.spark.sql.classic.GraftColumnBridge
      .literalValue(args(1))
      .getOrElse(throw new IllegalArgumentException(
        "top_values n must be a literal"))
      .toString.toDouble.toInt
    require(n >= 1 && n <= 1024, "top_values n must be 1..1024")
    val neg = -args.head.cast("long")
    val mins = org.apache.spark.sql.classic.GraftColumnBridge.column(
      graft.ops.BottomKDistinct(
        org.apache.spark.sql.classic.GraftColumnBridge.expression(neg), n)
        .toAggregateExpression())
    array_join(transform(mins, x => (-x).cast("string")), "-")
  }

  val all: Map[String, Seq[Column] => Column] = Map(
    "distance" -> distance _,
    // aggregate surface (reference ships only `max` via the function-
    // context trick, SURVEY.md §2.5-2.6; we expose the standard set)
    "max" -> ((as: Seq[Column]) => max(as.head)),
    "min" -> ((as: Seq[Column]) => min(as.head)),
    "sum" -> ((as: Seq[Column]) => sum(as.head)),
    "avg" -> ((as: Seq[Column]) => avg(as.head)),
    "count" -> ((as: Seq[Column]) =>
      if (as.isEmpty) count(lit(1)) else count(as.head)),
    "approx_distinct" -> approxDistinct _,
    "approx_percentile" -> approxPercentile _,
    "top_values" -> topValues _,
    "sysdate" -> ((_: Seq[Column]) => current_timestamp())
  )

  /** Names treated as aggregates by the SELECT translator (a projection
    * made only of these collapses the result to one row, like the
    * reference's context-accumulator functions). */
  val aggregateNames: Set[String] =
    Set("max", "min", "sum", "avg", "count", "approx_distinct",
      "approx_percentile", "top_values")
}

/** FULLTEXT tokenizer replicating `OPropertyIndexFullText` defaults:
  * ignore chars `" \r\n\t:;,.|+*÷\\=!?[]()'\""` are stripped, tokens
  * split on whitespace, lower-cased, stop words dropped
  * (`OPropertyIndexFullText.java:52-55` DEF_IGNORE_CHARS /
  * DEF_STOP_WORDS; indexing loop `:163-200`).
  */
object FullText {
  val ignoreChars = ":;,.|+*/\\=!?[]()'\""
  val stopWords: Seq[String] =
    ("the in a at as and or for his her him this that what which while " +
      "up with be was is").split(" ").toSeq

  /** tokenize a string column → array<string> of significant words. */
  def tokens(c: Column): Column = {
    val stripped = translate(lower(c), ignoreChars, "")
    array_except(
      filter(split(stripped, "\\s+"), t => length(t) > 0),
      lit(stopWords.toArray))
  }

  /** CONTAINSTEXT predicate (`OQueryOperatorContainsText.java:34-85`):
    * true when every significant word of the search text occurs in the
    * tokenized field. */
  def containsText(field: Column, text: Column): Column =
    forall(tokens(text), w => array_contains(tokens(field), w))
}
