package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 measurement record (Scratch* files are test-scope
  * measurement records, repo convention).
  *
  * == 1. sccDF: the suite-max cut (r10 verdict task #2) ==
  *
  * Three levers tried, measured SAME-SESSION with interleaved cells
  * (sequential blocks bias toward whichever shape runs last — a
  * sequential attempt measured the LAST cell fastest in every
  * permutation tried; the interleaved sweeps below are the honest
  * cells):
  *
  * 1. Probe fusion (the verdict's named suggestion): every loop
  *    checkpoint LAZY, the changed-label/survivor `count()` runs in
  *    the job that materializes the frame — one job per round, not
  *    two. Measured a WASH (±5%, inside the session band): the
  *    deleted `isEmpty` probes were take(1) reads of cached blocks,
  *    near-free next to the materialization jobs.
  * 2. Direction-fused step: one direction-tagged 2|E| edge frame lets
  *    ONE join + groupBy + join-back carry both f- and b-propagation
  *    per hop (the r10 shape ran two separate pipelines, doubling
  *    shuffle stages for the same message volume). Measured 0.95-1.03×
  *    across sessions — at most ~5%; the stage cut is structurally
  *    right (each deleted stage is a cluster barrier at scale) but
  *    local wall time is dominated by per-JOB floors, not stages.
  * 3. SEQUENTIAL BASE CASE — the one that pays: when the live set
  *    fits under `localFinishThreshold` (default 100k vertices, edge
  *    guard 16×), collect the remainder and finish with iterative
  *    Tarjan — the Multistep discipline (Slota, Rajamanickam &
  *    Madduri 2014): trim/FW-BW the bulk in parallel, finish the
  *    small tail serially, because past that point ONE refinement
  *    round costs more in job floors than the whole remaining
  *    problem. The sf0.1 trade graph is 16k vertices / ~100k edges —
  *    at that size the whole problem IS the tail.
  *
  * Measured (this suite, sf0.1 qg_scc equivalent, interleaved
  * median-of-5 warm cells, one session):
  *
  * | shape                                      | sec   |
  * |--------------------------------------------|-------|
  * | r10 replay (split step, eager probes)      | 12.03 |
  * | r11 all-distributed (fused step + probes)  | 12.34 |
  * | r11 default (sequential base case)         |  2.80 |
  *
  * 4.3× on the gate query; the ≤7 s bar is passed with room. The
  * distributed path stays first-class: >threshold graphs refine
  * exactly as before (ScratchR10's 10× exponent record now pins it
  * with an explicit threshold=0), GraphSpec pins base≡distributed on
  * the trade graph and both hand graphs, and the threshold guards
  * bound the collect (the repo's control-plane convention). Also in
  * this change (ADVICE r10): the inner fixpoint's bound derives from
  * the live vertex count (nLive/2+2 two-hop rounds is a TRUE
  * convergence bound; the shared maxRounds knob raised on legitimate
  * path-like graphs), keeping raise-don't-truncate for real bugs —
  * GraphSpec's chain-of-150 case pins it on the forced-distributed
  * path.
  *
  * == 2. Bench calibration probe (cross-session comparability) ==
  *
  * Three rounds of regressions flagged from cross-session BENCH
  * deltas resolved as weather (unigram r9→r10, the 382-430 s spread,
  * sccDF 8.1 vs 10.1 s on identical code). Bench now measures a
  * deterministic single-thread CPU probe (fixed xxhash-style mix +
  * sort loop over preallocated arrays, median-of-5, zero allocation
  * in the timed region) before the query loop and records it as
  * `calibration_sec` in both the one-line JSON and BENCH_FULL.json.
  * Cross-round commons tables should be read BOTH raw and normalized
  * by the calibration ratio; a commons ratio ≈ the calibration ratio
  * is session weather, not regression. r10's artifact has no probe,
  * so the r10→r11 commons table below states raw numbers with the
  * r11 probe recorded for FUTURE rounds to normalize against
  * (the first two-probe comparison lands in r12).
  *
  * Reproduce: SPARK_GRAFT_SCALE10=1 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "testOnly graft.ScratchR11"
  */
class ScratchR11 extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf01 = "/root/testdata/sf0.1"

  private def medianOf(v: Seq[Double]): Double = {
    val s = v.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeQ(name: String, dir: String, rounds: Int): Double = {
    noop(SparkEntry.queries(name)(spark, dir)) // warm codegen
    medianOf((1 to rounds).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      noop(SparkEntry.queries(name)(spark, dir))
      (System.nanoTime() - t0) / 1e9
    })
  }

  private val scale10 = sys.env.get("SPARK_GRAFT_SCALE10").contains("1")

  private def sccShape(dir: String, thr: Int,
      props: Seq[String]): org.apache.spark.sql.DataFrame = {
    props.foreach(System.setProperty(_, "1"))
    try graft.graph.GraphOps.sccDF(
        graft.graph.TradeGraph.vertices(spark, dir),
        graft.graph.TradeGraph.directedEdges(spark, dir),
        localFinishThreshold = thr)
      .orderBy("id")
    finally props.foreach(System.clearProperty)
  }

  // the three sccDF generations: r11 default (sequential base case
  // fires — the sf0.1 trade graph is 16k vertices), r11 forced
  // all-distributed (direction-fused step, lazy-checkpoint probes),
  // r10 replay (split-direction step, eager checkpoint + probe jobs)
  private val sccShapes = Seq(
    ("r11-local-finish", 100000, Seq.empty[String]),
    ("r11-distributed", 0, Seq.empty[String]),
    ("r10-distributed", 0,
      Seq("graft.scc.splitDirections", "graft.scc.eagerProbe")))

  test("sccDF: all three shape generations result-identical") {
    // correctness leg runs always (sf0.001)
    val sf = "/root/testdata/sf0.001"
    val want = sccShape(sf, 100000, Seq.empty)
      .collect().map(_.toSeq).toSeq
    for ((name, thr, props) <- sccShapes.drop(1)) {
      // props set BEFORE plan construction: sccDF reads them eagerly
      val got = sccShape(sf, thr, props).collect().map(_.toSeq).toSeq
      assert(want == got, s"qg_scc diverged under shape $name")
    }
  }

  test("sccDF shape A/B at sf0.1 (measurement record)") {
    assume(scale10, "set SPARK_GRAFT_SCALE10=1 to re-measure")
    // INTERLEAVED cells: sequential blocks bias toward whichever shape
    // runs LAST (JIT/code-cache warmth grows through the session — a
    // sequential attempt measured the last cell fastest in every
    // permutation tried). One round of every shape per sweep, medians
    // per shape across sweeps.
    def once(thr: Int, props: Seq[String]): Double = {
      System.gc()
      val t0 = System.nanoTime()
      noop(sccShape(sf01, thr, props))
      (System.nanoTime() - t0) / 1e9
    }
    sccShapes.foreach { case (_, t, p) => once(t, p) } // warm every shape
    val cells = (1 to 5).map { _ =>
      sccShapes.map { case (_, t, p) => once(t, p) } }
    val med = sccShapes.indices.map(i => medianOf(cells.map(_(i))))
    info(sccShapes.zip(med).map { case ((n, _, _), m) =>
      f"$n=$m%.2fs" }.mkString("qg_scc: ", " ", ""))
    assert(med(0) < med(2),
      "the sequential base case should beat the r10 distributed shape")
  }
}
