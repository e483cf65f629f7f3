package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.Tables.dec
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1.D — aggregation operators.
  *
  * Scale notes: every query here is a hash aggregate with map-side partial
  * aggregation (partial_sum/partial_count before the shuffle), so the
  * shuffle carries one row per (partition × group), not per input row. The
  * group-key cardinalities are tiny-to-moderate (flags, priorities,
  * nations) — at 100 TB these plans shuffle kilobytes per partition.
  * Decimal sums are exact and order-independent, so partial aggregation
  * is safe (double sums would not be reproducible across partitionings).
  */
object Aggregations extends QueryModule {

  /** Flagship: TPC-H-Q1-style pricing summary. Validated bit-exact vs
    * DuckDB on sf0.01 (SURVEY.md §2.0).
    */
  val aggPricingSummary = Q(
    "agg_pricing_summary",
    (spark, dir) => {
      import spark.implicits._
      Tables
        .lineitem(spark, dir)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec($"l_quantity")).as("sum_qty"),
          sum(dec($"l_extendedprice")).as("sum_base_price"),
          sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount"))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT
        l_returnflag,
        l_linestatus,
        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * CAST(1 - l_discount AS DECIMAL(18,2))) AS sum_disc_price,
        COUNT(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim))

  def qs: Seq[Q] = Seq(aggPricingSummary)
}
