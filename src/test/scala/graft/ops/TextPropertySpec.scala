package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.SparkTestSession

/** Property tests of the text-curation primitives against direct JVM
  * model implementations — generated strings, compared row-by-row.
  * Guards the column expressions (Spark SQL regex/array semantics)
  * against the plain-Scala meaning they claim to have. */
class TextPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // printable ascii plus extra whitespace/punct density so the
  // normalizer and tokenizer actually get exercised
  private val strGen: Gen[String] = Gen.chooseNum(0, 40).flatMap(n =>
    Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.const(' '),
      1 -> Gen.oneOf('.', ',', '!', '-', '\t'),
      1 -> Gen.oneOf('X', 'q', '9'))).map(_.mkString))

  // fixed seed: a failing input must reproduce across runs
  private lazy val rows: Seq[(Long, String)] =
    Gen.listOfN(400, strGen)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L))
      .get.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
  private lazy val df = rows.toDF("id", "s")

  private def jvmNormalize(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9\\s]", "")
      .replaceAll("\\s+", " ").trim

  private def jvmTokens(s: String): Seq[String] =
    s.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private def jvmNgrams(toks: Seq[String], n: Int): Seq[String] =
    if (toks.size < n) Nil else toks.sliding(n).map(_.mkString(" ")).toSeq

  test("normalizeText matches the JVM model") {
    val got = df.orderBy("id")
      .select(TextOps.normalizeText(col("s"))).collect()
      .map(_.getString(0)).toSeq
    assert(got == rows.map { case (_, s) => jvmNormalize(s) })
  }

  test("wordNgrams matches the JVM sliding-window model") {
    for (n <- Seq(2, 3)) {
      val got = df.orderBy("id")
        .select(TextOps.wordNgrams(TextOps.tokensWs(col("s")), n))
        .collect().map(_.getSeq[String](0)).toSeq
      assert(got == rows.map { case (_, s) => jvmNgrams(jvmTokens(s), n) },
        s"n=$n")
    }
  }

  test("repetitionFraction matches 1 - distinct/total") {
    val got = df.orderBy("id")
      .select(round(TextOps.repetitionFraction(
        TextOps.tokensWs(col("s")), 2), 9)).collect()
      .map(_.getDouble(0)).toSeq
    val want = rows.map { case (_, s) =>
      val grams = jvmNgrams(jvmTokens(s), 2)
      if (grams.isEmpty) 0.0
      else BigDecimal(1.0 - grams.distinct.size.toDouble / grams.size)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got == want)
  }
}
