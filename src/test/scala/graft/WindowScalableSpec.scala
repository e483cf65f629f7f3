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

  test("scalable variants broadcast the ranked side — no global sort of the fact") {
    for (q <- Seq(Windows.winRankGlobalScalable, Windows.winRangeFrameScalable)) {
      val df = q.fn(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"${q.name}: expected broadcast join back to the fact:\n$plan")
    }
  }
}
