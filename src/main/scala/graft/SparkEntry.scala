package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §3.1.
  *
  * Queries are assembled from per-category modules under
  * `graft.operators`; each module row corresponds 1:1 to a SURVEY.md §2.1
  * inventory row (the normative contract this engine is judged against).
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    operators.Aggregations,
    operators.Filters,
    operators.Joins,
    operators.Multimodal,
    operators.ScalarFns,
    operators.SetOps,
    operators.Sources,
    operators.Streaming,
    operators.TextOps,
    operators.VectorOps,
    operators.Windows
  )

  private lazy val all: Seq[Q] = {
    val rows = modules.flatMap(_.qs)
    val dup = rows.groupBy(_.name).collect { case (n, rs) if rs.sizeIs > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    rows
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregations.aggPricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
