package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** throwaway timing harness for the IVF scoring variants. */
object ScratchIvf {
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val e = sources.Tables.load(spark, dir, "embeddings")

    def mkIvf(): DataFrame = ops.Similarity.ivfTopK(e,
      e.filter(col("vec_id") < 50), e.filter(col("vec_id") < 16),
      "vec_id", "embedding", k = 5, nProbe = 2)

    // split plan-time from run-time
    def time(name: String): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = mkIvf()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t1 = System.nanoTime()
        run(df)
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      println(f"TIMING $name plan=${ts.map(_._1).sorted.apply(1)}%.2f exec=${ts.map(_._2).sorted.apply(1)}%.2f " +
        ts.map { case (a, b) => f"($a%.2f,$b%.2f)" }.mkString(","))
    }
    run(mkIvf()) // warmup
    time("ivf_topk")
    val plan = mkIvf().queryExecution.executedPlan.toString
    println("CODEGEN_SPANS " + "WholeStageCodegen".r.findAllIn(plan).length)
    println("FALLBACK " + plan.linesIterator.filter(_.contains("Project")).take(6).mkString(" | "))

    // scaling of the expression-based cell assignment in k (the
    // verdict's ask: IVF-realistic centroid counts, not the oracle's
    // k=16) — cost should grow ~linearly in k with the stage staying
    // in codegen
    for (k <- Seq(16, 256, 1024)) {
      val cents = ops.Similarity.collectCentroids(
        e.filter(col("vec_id") < k), "vec_id", "embedding")
      def assign() = ops.Similarity.cellAssignments(
        e, cents, "vec_id", "embedding")
      run(assign()) // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run(assign())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING assign_k$k median=${ts.sorted.apply(1)}%.2f " +
        ts.map(t => f"$t%.2f").mkString(","))
    }
    spark.stop()
  }
}
