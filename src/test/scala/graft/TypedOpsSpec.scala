package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The typed Dataset surface (operators/TypedOps.scala): flatMapGroups
  * must agree with the codegen'd window form row-for-row, and the typed
  * Aggregator must agree with the DecimalType column aggregation it
  * mirrors.
  */
class TypedOpsSpec extends SparkSpecBase {

  test("typed_topn_per_user == window-function top-n (same data, same tiebreak)") {
    import spark.implicits._
    val typed = operators.TypedOps.typedTopnPerUser.fn(spark, sfDir).collect().toSeq
    val w = Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id".asc)
    val windowed = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 2)
      .select($"user_id", $"rn", $"event_id", $"event_type", $"value")
      .orderBy($"user_id", $"rn")
      .collect()
      .toSeq
    assert(typed == windowed)
  }

  test("typed_agg_decimal_stats n/sum match the DecimalType column aggregation") {
    import spark.implicits._
    val typed = operators.TypedOps.typedAggDecimalStats.fn(spark, sfDir)
      .select($"event_type", $"n", $"sum_value".cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val col = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"value".cast("decimal(28,12)")).cast("decimal(18,6)").cast("double").as("s"))
      .orderBy($"event_type")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(typed == col)
  }
}
