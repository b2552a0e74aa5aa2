package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 measurement record (Scratch* files are test-scope
  * measurement records, repo convention).
  *
  * == 1. The bench-weather question settled (r11 verdict task #1) ==
  *
  * r11's commons read 1.28× raw over r10 with no way to normalize
  * (r10's artifact predates the calibration probe). r12 is the first
  * round where BOTH endpoints carry `calibration_sec`, and weather
  * and regression finally separate. Measured (mid-round full bench,
  * 308 queries, vs the r11 judge artifact):
  *
  * TWO full r12 benches ran the same day (A mid-round, B final — B
  * includes the §2b qg_scc fix, which moves B's commons total by
  * under 0.2%, so the weather comparison stands):
  *
  * | metric                    | r11    | r12 A  | r12 B  |
  * |---------------------------|--------|--------|--------|
  * | calibration_sec           | 0.0997 | 0.1183 | 0.0868 |
  * | commons total raw (n=307) | 527.9  | 510.0  | 488.9  |
  * | commons median raw ratio  |   —    | 0.947  | 0.935  |
  * | commons median NORMALIZED |   —    | 0.798  | 1.074  |
  *
  * Two findings. (1) The r11 1.28× raw flag was WEATHER: r12 runs
  * FASTER than r11 raw in both same-day sessions (0.947 / 0.935
  * median), and the r10→r12 raw commons reads 1.085 total / 1.131
  * median — most of the r10→r11 1.28× gap evaporated on identical
  * operator code. (2) The probe itself has a noise band: sessions A
  * and B differ 1.36× on the probe but only 1.04× on the suite —
  * single-thread CPU weather and whole-stack suite weather are
  * correlated but not proportional, so probe normalization
  * OVER-corrects across sessions with very different calib (B's
  * normalized median 1.074 vs A's 0.798 on near-identical raw
  * suites). Operating rule going forward: the probe separates
  * >1.4× claims into weather vs regression (its designed job); for
  * anything inside that band, same-session isolated A/Bs are the
  * only signal — which is how every flag below was settled. Same-day
  * calib drift measured 0.0818-0.1183 (±20%) across this round's
  * sessions.
  *
  * == 2. The two r11 >2× suspects — both CLEARED as weather ==
  *
  * Isolated median-of-5 (filtered bench runs, calib 0.082-0.089):
  *
  * | query         | r10 raw | r11 raw | r12 isolated | verdict |
  * |---------------|---------|---------|--------------|---------|
  * | qp_target_mix | 0.74    | 1.29    | 0.83         | weather |
  * | qg_triangles  | 1.43    | 2.19    | 1.25         | weather |
  *
  * Also probed from the r12 full-bench's own normalized >1.4× list:
  * qp_gif_sequence isolated 0.80 s (r11 0.74 — suite-context/weather)
  * and qd_agg_fn 0.285 s (sub-second job-floor noise band).
  *
  * == 2b. qg_scc: a REAL r12 regression, caught and fixed in-round ==
  *
  * The mid-round full bench read qg_scc at 13.7 s (r11: 3.0) with
  * MAD 1% — no weather band covers 4.6×. Cause: this round's ADVICE
  * fix scaled the sequential-base-case edge bound with the live
  * remainder (16×nLive = 256k), silently disabling local finishing on
  * the sf0.1 trade graph (16k vertices × 598,662 edges — avg degree
  * 37, exactly the dense-small shape where the local tail pays most);
  * every run fell through to the distributed path (probe: 7.4-7.9 s
  * vs 0.9-1.4 s local, same session). Fix: the edge bound is an
  * ABSOLUTE budget again (16×threshold ≈ 1.6M edges — now ~26 MB
  * because the collect is primitive per-partition arrays, which is
  * what actually resolves the ADVICE's boxed-Row concern). Isolated
  * median-of-5 after the fix: 1.63 s. Lesson recorded: a bound that
  * scales with the remainder couples the ALGORITHM CHOICE to data
  * shape; budgets that exist for driver-memory safety should be
  * absolute memory budgets.
  *
  * == 3. Offset video near-dup at 10× ==
  *
  * `videoPhashPairsOffset` bands EVERY sampled frame (vs frame-0 for
  * the aligned mode) and verifies per (pair, δ) — the candidate frame
  * is nFrames× the aligned mode's but the delta tag caps the
  * per-pair explosion at (2·maxOffset+1). Measured t1=1.53 s,
  * t10=14.48 s, exponent 0.98 — i.e. exactly LINEAR (14.5/1.5 =
  * 9.5× at 10×), which is the CORRECT asymptotic for a
  * constant-occupancy corpus whose true pair count itself grows
  * linearly; the aligned mode's 0.48 reads lower only because fixed
  * session overheads dominated its t1 (its t10/t1 was 3.0 on a 3×
  * cheaper pipeline). No quadratic term: banding caps candidates at
  * colliding (pair, δ) triples, never all-pairs.
  *
  * A/B note on §2's suspects: the same-session timeQ re-reads gave
  * qp_target_mix 1.22 s / qg_triangles 0.72 s at calib 0.0928 —
  * different harness path than the filtered-bench isolation (0.83 /
  * 1.25 at calib 0.082-0.089), both comfortably inside the weather
  * band and far from the r11 2× flags.
  *
  * Reproduce: SPARK_GRAFT_SCALE10=1 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "testOnly graft.ScratchR12"
  */
class ScratchR12 extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf01 = "/root/testdata/sf0.1"
  private val scale10 = sys.env.get("SPARK_GRAFT_SCALE10").contains("1")

  private def medianOf(v: Seq[Double]): Double = {
    val s = v.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timed(rounds: Int)(body: => Unit): Double =
    medianOf((1 to rounds).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    })

  test("r12 suspects: qp_target_mix + qg_triangles isolated A/B " +
      "(measurement record)") {
    assume(scale10, "set SPARK_GRAFT_SCALE10=1 to re-measure")
    val calib = Bench.calibrate()
    val names = Seq("qp_target_mix", "qg_triangles")
    val meds = names.map { n =>
      noop(SparkEntry.queries(n)(spark, sf01)) // warm
      n -> timed(5)(noop(SparkEntry.queries(n)(spark, sf01)))
    }
    info(f"calibration_sec=$calib%.4f (r11 bench artifact: 0.0997)")
    meds.foreach { case (n, m) => info(f"$n median-of-5 = $m%.3f s") }
    // record-only: the assertions guard against true pathology, the
    // narrative conclusion lives in the file comment
    meds.foreach { case (n, m) =>
      assert(m < 5.0, s"$n pathologically slow: $m s")
    }
  }

  /** constant-occupancy trimmed-GIF corpus: the ScratchR11 genVideos
    * shape (md5-PRF per-(group, frame) patterns, occupancy 20, every
    * 5th member one flipped pixel) with every ODD member dropping
    * frame 0 — the qp_video_offset crawl shape with growing group
    * count. */
  private def genTrimmedVideos(n: Long): DataFrame = {
    val rdd = spark.range(n).rdd.map { id =>
      val g = id / 20
      val k = id % 20
      val t = (k % 2).toInt
      val frames = (t until 3).map { f =>
        Array.tabulate(72) { i =>
          val r = i / 9; val c = i % 9
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s"vfx:$g:$f:$r:$c".getBytes("UTF-8"))
          val base = if ((d(0) & 0x80) == 0) 220 else 30
          if (k % 5 == 0 && f == (k % 3).toInt &&
            r == ((k * 3) % 8).toInt && c == ((k * 5) % 9).toInt)
            250 - base
          else base
        }
      }
      org.apache.spark.sql.Row(id,
        graft.ops.Multimodal.encodeGifGray(9, 8, frames))
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType)))).repartition(32)
  }

  test("videoPhashPairsOffset 10x exponent on constant-occupancy " +
      "trimmed GIF groups") {
    assume(scale10, "set SPARK_GRAFT_SCALE10=1 to re-measure")
    def run(n: Long): Double = {
      val media = genTrimmedVideos(n).localCheckpoint(true)
      val t = timed(3) {
        noop(graft.ops.Multimodal.videoPhashPairsOffset(
          graft.ops.Multimodal.videoPhashes(media), 3, maxOffset = 1))
      }
      media.unpersist()
      t
    }
    val t1 = run(5000)
    val t10 = run(50000)
    val exp = math.log10(t10 / t1)
    info(f"videoPhashPairsOffset: t1=$t1%.2fs t10=$t10%.2fs " +
      f"exponent=$exp%.2f")
    assert(exp < 1.3,
      f"offset pairing should track the banded aligned mode, got $exp%.2f")
  }
}
