package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.sources.Tables

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join is row-identical to the plain join") {
    val l = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val s = Tables.load(spark, sf, "supplier")
    val plain = l.join(s, l("l_suppkey") === s("s_suppkey"))
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("q"))
      .orderBy("s_nationkey").collect()
    val salted = Skew.saltedJoin(l, s.withColumnRenamed("s_suppkey", "l_suppkey"),
        "l_suppkey", saltFactor = 8)
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("q"))
      .orderBy("s_nationkey").collect()
    assert(plain.toSeq == salted.toSeq)
  }

  test("key histogram surfaces the hottest keys") {
    val h = Skew.keyHistogram(
      Tables.load(spark, sf, "lineitem"), "l_suppkey", 5).collect()
    assert(h.length == 5)
    assert(h.map(_.getLong(1)).toSeq.sorted.reverse == h.map(_.getLong(1)).toSeq)
  }
}
