package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §3.1.
  *
  * Queries are assembled from per-category modules under
  * `graft.operators`; each module row corresponds 1:1 to a SURVEY.md §2.1
  * inventory row (the normative contract this engine is judged against).
  *
  * Declared-output type convention (SURVEY.md §2.0; OutputContractSpec
  * enforces it structurally): internal arithmetic stays DECIMAL — exact
  * and order-independent, which is what makes results reproducible across
  * partitionings — but every FINAL output column is normalized to the
  * driver's comparator-stable types. DuckDB's Python `.df()` renders
  * DECIMAL as float64 while a Spark parquet decimal stays `Decimal`, so
  * any value with a trailing zero at its scale (e.g. 1003322369.8990)
  * hashes differently despite being numerically identical; float64 of the
  * same exact decimal is bit-identical on both engines. Ints widen to
  * long and float32 widens to float64 (the oracle mirrors with CAST AS
  * DOUBLE) so no width variable is left in the compare, and array/map
  * columns are forbidden outright (pandas `sort_values` crashes on
  * ndarray cells).
  */
object SparkEntry {

  /** Normalize one declared result to driver-stable output types.
    * Applied uniformly to every `queries` entry — individual operators
    * keep their exact decimal math; only the declaration surface changes.
    */
  private[graft] def normalize(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case _: DecimalType                      => col(f.name).cast(DoubleType).as(f.name)
        case ByteType | ShortType | IntegerType => col(f.name).cast(LongType).as(f.name)
        case FloatType                           => col(f.name).cast(DoubleType).as(f.name)
        case _                                   => col(f.name)
      }
    }
    df.select(cols: _*)
  }

  private def modules: Seq[QueryModule] = Seq(
    operators.Aggregations,
    operators.EtlOps,
    operators.Filters,
    operators.Flagships,
    operators.Joins,
    operators.Multimodal,
    operators.ScalarFns,
    operators.SetOps,
    operators.Sources,
    operators.Streaming,
    operators.TextOps,
    operators.TypedOps,
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
    normalize(operators.Aggregations.aggPricingSummary.fn(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> ((s: SparkSession, d: String) => normalize(q.fn(s, d)))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
