package graft

/** agg_percentiles_approx is a no-oracle row (sketch estimates are
  * engine-specific); its contract is proximity to the exact percentiles.
  * At accuracy 100000 the Greenwald–Khanna summary retains every sample
  * for bench-scale groups, so the estimate must land within one
  * interpolation step of quantile_cont — we assert a loose relative
  * tolerance that would also hold for genuinely sketched 100 TB groups.
  */
class PercentileApproxSpec extends SparkSpecBase {

  test("approx percentiles track exact percentiles per group") {
    val exact = SparkEntry
      .queries("agg_percentiles_exact")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = SparkEntry
      .queries("agg_percentiles_approx")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, (p25, p50, p75)) <- exact) {
      val (a25, a50, a75) = approx(flag)
      def close(a: Double, e: Double) = math.abs(a - e) <= math.max(0.05 * math.abs(e), 1.0)
      assert(close(a25, p25), s"$flag p25: approx=$a25 exact=$p25")
      assert(close(a50, p50), s"$flag p50: approx=$a50 exact=$p50")
      assert(close(a75, p75), s"$flag p75: approx=$a75 exact=$p75")
    }
  }
}
