package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness (BASELINE.md methodology: warm JVM, median of
  * repeated runs — the first execution of each query pays one-time
  * whole-stage-codegen compilation that a long-running cluster never
  * re-pays, so it is warmed up separately). Prints ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup pass: compiles plans/codegen once, surfaces failures
    val ok = names.filter { n =>
      try { SparkEntry.queries(n)(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
    }.toSet
    val times = scala.collection.mutable
      .Map[String, Vector[Double]]().withDefaultValue(Vector())
    for (_ <- 1 to rounds; n <- names if ok(n)) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
    }
    def median(v: Vector[Double]): Double = { val s = v.sorted; s(s.size / 2) }
    val med = names.map(n => n -> (if (ok(n)) median(times(n)) else -1.0))
    val qs = med.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = med.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
