package graft

import org.apache.spark.sql.functions._

/** Property tests for `agg_hll_sketch_union` (no DuckDB oracle — no
  * DataSketches-compatible format there): estimates track exact counts,
  * the sketch-merge path equals the direct-sketch path EXACTLY (HLL
  * register state is max-based, so union of per-group sketches is the
  * same state as one sketch over the union), and results are
  * partitioning-invariant.
  */
class HllSketchSpec extends SparkSpecBase {

  test("per-type and merged estimates within 5% of exact distinct counts") {
    import spark.implicits._
    val out = operators.Aggregations.aggHllSketchUnion.fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sfDir)
    val exactPer = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.agg(countDistinct($"user_id")).head().getLong(0)
    (exactPer + ("__ALL__" -> exactAll)).foreach { case (k, exact) =>
      val est = out(k)
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"$k: estimate $est vs exact $exact drifts > 5%")
    }
  }

  test("union of per-type sketches equals one sketch over all rows") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val viaMerge = ev.groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")))
      .head().getLong(0)
    val direct = ev.agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(12))))
      .head().getLong(0)
    assert(viaMerge == direct,
      s"merged-sketch estimate $viaMerge != direct estimate $direct")
  }

  test("estimates are partitioning-invariant") {
    val a = operators.Aggregations.aggHllSketchUnion.fn(spark, sfDir)
      .collect().map(_.toString).toSeq
    import spark.implicits._
    val repart = Tables.events(spark, sfDir).repartition(13)
    val b = repart.groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"))
      .select($"event_type".as("scope"), hll_sketch_estimate($"sk").as("est_users"))
      .orderBy($"scope")
      .collect().map(_.toString).toSeq
    assert(a.filterNot(_.contains("__ALL__")) == b)
  }
}
