package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.{Files, Paths}

/** Optimization-round evidence tool: writes `.explain("formatted")`
  * output for selected queries to `<outDir>/<name>_<suffix>.txt` —
  * the plan artifacts the judge checks optimization claims against
  * (guide §1: capture the plan shape before and after each change).
  * Session config mirrors [[Bench]] so the dumped plan is the plan
  * the bench actually times.
  *
  * args: <outDir> <suffix> [query-name-prefix ...]
  * env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *       SPARK_GRAFT_CPUS (default 4)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [prefix ...]")
    val outDir = args(0); val suffix = args(1)
    val prefixes = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        100000)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.isEmpty || prefixes.exists(n.startsWith))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), txt)
        println(s"[plandump] wrote $n")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
