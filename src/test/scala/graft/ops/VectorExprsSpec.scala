package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The native vector expressions must be BIT-IDENTICAL to the HOF
  * forms the DuckDB oracles were generated against — including the
  * fold order (left-to-right from 0.0), null-element propagation and
  * zip_with's length-mismatch padding. Random vectors are compared
  * exactly (==, not tolerance): any reordering of the accumulation
  * would show up here as a ULP difference.
  */
class VectorExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
  private def hofNorm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  test("native dot/norm match the HOF forms bit-for-bit") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rng.nextGaussian()),
      Seq.fill(64)(rng.nextGaussian())))
    val df = rows.toDF("a", "b")
      .select(
        VectorExprs.dot(col("a"), col("b")).as("nd"),
        hofDot(col("a"), col("b")).as("hd"),
        VectorExprs.norm(col("a")).as("nn"),
        hofNorm(col("a")).as("hn"))
    val bad = df.filter(col("nd") =!= col("hd") || col("nn") =!= col("hn"))
      .count()
    assert(bad == 0, "native and HOF vector math must agree exactly")
  }

  test("null elements and length mismatches null out like the HOFs") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (Seq[java.lang.Double](), Seq[java.lang.Double]())
    ).toDF("a", "b")
      .select(
        VectorExprs.dot(col("a"), col("b")).as("nd"),
        hofDot(col("a"), col("b")).as("hd"),
        VectorExprs.norm(col("a")).as("nn"),
        hofNorm(col("a")).as("hn"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"dot null disagreement: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
      assert(r.isNullAt(2) == r.isNullAt(3),
        s"norm null disagreement: $r")
      if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3))
    }
    // null array input → null (nullSafeEval path)
    val nn = Seq((Option.empty[Seq[Double]], Option(Seq(1.0))))
      .toDF("a", "b")
      .select(VectorExprs.dot(col("a"), col("b")).as("nd"),
        VectorExprs.norm(col("a")).as("nn"))
      .collect().head
    assert(nn.isNullAt(0) && nn.isNullAt(1))
  }

  test("sortedOverlap: exact intersection size on sorted sets, early " +
      "exit only below the rounded-jaccard filter") {
    val rng = new scala.util.Random(23)
    // random long sets with heavy overlap variety, incl. empty/disjoint
    val rows = Seq.fill(400) {
      val pool = Seq.fill(40)(rng.nextLong().abs % 1000)
      val a = rng.shuffle(pool).take(rng.nextInt(30)).distinct.sorted
      val b = rng.shuffle(pool).take(rng.nextInt(30)).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq.empty[Long], Seq.empty[Long]))
    // sweep the whole threshold range — the early-exit bound must be
    // sound at every t a caller could pass
    for (t <- Seq(0.1, 0.3, 0.5, 0.7, 0.8, 0.9, 1.0)) {
      val df = rows.toDF("a", "b").select(
        VectorExprs.sortedOverlap(col("a"), col("b"), t).as("so"),
        size(array_intersect(col("a"), col("b"))).as("ai"),
        round(size(array_intersect(col("a"), col("b"))).cast("double") /
          (size(col("a")) + size(col("b")) -
            size(array_intersect(col("a"), col("b")))), 6).as("jac"))
      df.collect().foreach { r =>
        val so = r.getInt(0); val ai = r.getInt(1)
        val jac = if (r.isNullAt(2)) 0.0 else r.getDouble(2)
        if (so >= 0) assert(so == ai, s"exact count disagrees at $t: $r")
        // early exit must NEVER fire on a pair the caller's rounded
        // jac >= t filter would keep
        else assert(jac < t, s"early exit dropped a passing pair at $t: $r")
      }
    }
    // null array → null result
    val nr = Seq((Option.empty[Seq[Long]], Option(Seq(1L)))).toDF("a", "b")
      .select(VectorExprs.sortedOverlap(col("a"), col("b"), 0.5))
      .collect().head
    assert(nr.isNullAt(0))
  }

  test("dot/norm stay inside whole-stage codegen") {
    // range-based input: a literal Seq would be constant-folded into a
    // LocalTableScan (ConvertToLocalRelation) and never reach codegen
    val vec = (c: org.apache.spark.sql.Column) =>
      array((0 until 8).map(j => (c * (j + 1) + 1).cast("double")): _*)
    val df = spark.range(100)
      .select(vec(col("id")).as("a"), vec(col("id") + 7).as("b"))
      .select(VectorExprs.dot(col("a"), col("b")).as("d"),
        VectorExprs.norm(col("a")).as("n"))
    val codegenProjects = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString
    }
    assert(codegenProjects.exists(_.contains("vector_dot")),
      "vector expressions must run INSIDE a whole-stage codegen stage:\n" +
        df.queryExecution.executedPlan.toString)
    df.collect() // and execute without codegen fallback errors
  }
}
