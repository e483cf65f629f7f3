package graft

import graft.operators.Windows
import org.apache.spark.sql.DataFrame

/** The scalable global-window reformulations (SURVEY §2.1.E additions)
  * must produce the exact values of the native single-partition window
  * functions they replace, while their physical plans broadcast the tiny
  * ranked/banded side instead of globally sorting the fact table.
  */
class WindowScalableSpec extends SparkSpecBase {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("win_rank_global_scalable equals native global rank family") {
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    val native = spark.sql("""
      SELECT p_partkey,
        RANK() OVER w AS rnk,
        CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        CAST(CAST(PERCENT_RANK() OVER w AS DECIMAL(18,6)) AS DOUBLE) AS prnk,
        CAST(CAST(CUME_DIST() OVER w AS DECIMAL(18,6)) AS DOUBLE) AS cume
      FROM part
      WINDOW w AS (ORDER BY p_retailprice)
    """)
    val scalable = SparkEntry.queries("win_rank_global_scalable")(spark, sfDir)
    assert(rows(scalable) == rows(SparkEntry.normalize(native)))
  }

  test("win_range_frame_scalable equals native global range frame") {
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    val native = spark.sql("""
      SELECT p_partkey, p_size,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)))
          OVER (ORDER BY p_size
                RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS DOUBLE) AS band_revenue
      FROM part
    """)
    val scalable = SparkEntry.queries("win_range_frame_scalable")(spark, sfDir)
    assert(rows(scalable) == rows(SparkEntry.normalize(native)))
  }

  test("scalable ntile derivation equals native ntile (boundary arithmetic)") {
    // the fact-sized ntile reformulation promised by win_ntile_buckets:
    // global rank r = cum-count of strictly-smaller values (freq table,
    // broadcastable) + row_number within the equal-value tie group (a
    // bounded window partition); then SQL ntile's exact boundaries —
    // first n%k buckets take ceil(n/k) rows, the rest floor(n/k).
    // ceil(k*r/n) is NOT that function (n=10,k=4 sizes 3,2,3,2 vs SQL's
    // 3,3,2,2), which is why the arithmetic below is spelled out.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val k = 4
    val base = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_size"))
    val n = base.count()
    val q = n / k
    val rem = n % k
    val freq = base.groupBy(col("p_size")).agg(count(lit(1)).as("c"))
      .withColumn("cum_before",
        coalesce(sum(col("c")).over(
          Window.orderBy(col("p_size"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("p_size").as("f_size"), col("cum_before"))
    val tieRn = row_number().over(
      Window.partitionBy(col("p_size")).orderBy(col("p_partkey")))
    val derived = base
      .withColumn("tie_rn", tieRn.cast("long"))
      .join(broadcast(freq), col("p_size") === col("f_size"))
      .withColumn("r", col("cum_before") + col("tie_rn"))
      .withColumn("tile",
        when(col("r") <= lit(rem * (q + 1)),
          floor((col("r") - 1) / lit(q + 1)) + 1)
          .otherwise(lit(rem) + floor((col("r") - 1 - lit(rem * (q + 1))) / lit(q)) + 1)
          .cast("long"))
      .select(col("p_partkey"), col("tile"))
    val native = base
      .withColumn("tile",
        ntile(k).over(Window.orderBy(col("p_size"), col("p_partkey")))
          .cast("long"))
      .select(col("p_partkey"), col("tile"))
    assert(rows(derived) == rows(native),
      "two-level freq-table ntile != native ntile")
  }

  test("scalable variants broadcast the ranked side — no global sort of the fact") {
    for (q <- Seq(Windows.winRankGlobalScalable, Windows.winRangeFrameScalable,
        Windows.winNtileBucketsScalable)) {
      val df = q.fn(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"${q.name}: expected broadcast join back to the fact:\n$plan")
    }
  }
}
