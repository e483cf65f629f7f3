package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The compiled argmin/top-k expressions (functions/NearestCentroid.scala)
  * claim VALUE- AND ORDER-IDENTITY with the interpreted HOF formulations
  * they replaced in round 9. This spec pins that claim directly: both
  * formulations run over the real corpus and must match cell-for-cell —
  * including the 6 dp HALF_UP round, the Double.compare struct order,
  * id tiebreaks, multi-probe top-k order, and the IntegerType-id
  * variant (vec_label_confusion's clabel).
  */
class NearestCentroidSpec extends SparkSpecBase {

  private def e: DataFrame = operators.VectorOps.withNorm(spark, sfDir)

  /** The pre-r9 interpreted formulation of withNearestCells, verbatim. */
  private def hofNearestCells(df: DataFrame, cents: DataFrame, keep: Int,
      rounded: Boolean): DataFrame = {
    val cb = operators.VectorOps.oneRowArray(
      cents, "cbarr", col("cell"), col("cvec"), col("cnrm"))
    val scored = transform(col("cbarr"), c => {
      val sim = GraftFunctions.dot(col("emb"), c("cvec")) / (col("nrm") * c("cnrm"))
      struct((-(if (rounded) round(sim, 6) else sim)).as("negsim"),
        c("cell").as("cell"))
    })
    val top = df.crossJoin(broadcast(cb))
    val sel =
      if (keep == 1) top.withColumn("tc", array_min(scored))
      else top.withColumn("tc", explode(slice(array_sort(scored), 1, keep)))
    sel.withColumn("cell", col("tc")("cell"))
      .withColumn("csim", -col("tc")("negsim"))
      .drop("cbarr", "tc")
  }

  /** The pre-r9 interpreted formulation of withNearestCentroidD2. */
  private def hofNearestL2(df: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val cb = operators.VectorOps.oneRowArray(
      cents.withColumn("cnn2", GraftFunctions.dot(col(vecCol), col(vecCol))),
      "cbarr", col(idCol), col(vecCol), col("cnn2"))
    val scored = transform(col("cbarr"), c => {
      val d2 = round(
        col("dee2") - lit(2.0) * GraftFunctions.dot(col("emb"), c(vecCol)) + c("cnn2"), 6)
      struct(d2.as("d2"), c(idCol).as("id"))
    })
    df.withColumn("dee2", GraftFunctions.dot(col("emb"), col("emb")))
      .crossJoin(broadcast(cb))
      .withColumn("tc", array_min(scored))
      .withColumn("nid", col("tc")("id"))
      .withColumn("nd2", col("tc")("d2"))
      .drop("cbarr", "tc", "dee2")
  }

  private def sortedRows(df: DataFrame, cols: String*): Seq[String] =
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq

  test("cosine keep=1: compiled argmax equals the interpreted HOF, rounded and raw") {
    val cents = operators.VectorOps.ivfCodebook(e)
    for (rounded <- Seq(true, false)) {
      val fast = sortedRows(
        operators.VectorOps.withNearestCells(e, cents, keep = 1, rounded = rounded),
        "vec_id", "cell", "csim")
      val slow = sortedRows(
        hofNearestCells(e, cents, keep = 1, rounded = rounded),
        "vec_id", "cell", "csim")
      assert(fast == slow, s"keep=1 rounded=$rounded diverged")
    }
  }

  test("cosine keep=3 multi-probe: compiled top-k equals the interpreted sort+slice") {
    val cents = operators.VectorOps.ivfCodebook(e)
    val fast = sortedRows(
      operators.VectorOps.withNearestCells(e, cents, keep = 3, rounded = true),
      "vec_id", "cell", "csim")
    val slow = sortedRows(
      hofNearestCells(e, cents, keep = 3, rounded = true),
      "vec_id", "cell", "csim")
    assert(fast == slow, "multi-probe top-3 diverged")
    // 3 rows per vector (nlist ≥ 3 at every SF)
    assert(fast.size == e.count() * 3)
  }

  test("L2 argmin: compiled equals interpreted, long ids") {
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"))
    val fast = sortedRows(
      operators.VectorOps.withNearestCentroidD2(e, cents, "cid", "cemb", "nid", "nd2"),
      "vec_id", "nid", "nd2")
    val slow = sortedRows(hofNearestL2(e, cents, "cid", "cemb"), "vec_id", "nid", "nd2")
    assert(fast == slow, "L2 argmin diverged on long ids")
  }

  test("L2 argmin: IntegerType id flows through (the label-confusion shape)") {
    import spark.implicits._
    val cents = Tables.embeddings(spark, sfDir)
      .select($"label", $"embedding".cast("array<double>").as("cemb"))
      .groupBy($"label").agg(first($"cemb").as("cemb"))
      .select($"label".as("clabel"), $"cemb")
    val out = operators.VectorOps
      .withNearestCentroidD2(e, cents, "clabel", "cemb", "nlabel", "nd2")
    assert(out.schema("nlabel").dataType ==
      org.apache.spark.sql.types.IntegerType, "id type must pass through")
    val fast = sortedRows(out, "vec_id", "nlabel", "nd2")
    val slow = sortedRows(hofNearestL2(e, cents, "clabel", "cemb"), "vec_id", "nid", "nd2")
    assert(fast == slow, "L2 argmin diverged on int ids")
  }

  test("NaN cosine (zero-norm centroid) ranks FIRST — the csim-DESC / SQL-mirror order") {
    import spark.implicits._
    // a zero-norm centroid makes every cosine against it NaN; both Spark
    // SQL's ORDER BY csim DESC and DuckDB sort NaN as the LARGEST double,
    // so the row_number formulations the compiled top-k replaced (and
    // every oracle mirror) rank it first — the compiled comparator must
    // agree (r9 ADVICE: plain Double.compare on negsim ranked it last)
    val dim = e.select(size($"emb")).as[Int].head()
    val zero = Seq.fill(dim)(0.0)
    val cents = e.filter($"vec_id" < 2)
      .select($"vec_id".as("cell"), $"emb".as("cvec"), $"nrm".as("cnrm"))
      .unionAll(spark.range(1).select(
        lit(99L).as("cell"),
        typedLit(zero).as("cvec"), lit(0.0).as("cnrm")))
    val out = operators.VectorOps
      .withNearestCells(e.limit(5), cents, keep = 2, rounded = true)
      .select($"vec_id", $"cell", $"csim")
    // SQL reference: the row_number-over-csim-DESC formulation
    e.limit(5).select($"vec_id", $"emb", $"nrm").createOrReplaceTempView("nan_q")
    cents.createOrReplaceTempView("nan_cb")
    // ANSI mode turns a 0/0 double division into an error, so the IEEE
    // NaN the compiled expression produces is spelled out explicitly;
    // what this pins is the ORDER BY csim DESC placement of that NaN
    val ref = spark.sql(
      """WITH scored AS (
        |  SELECT q.vec_id, c.cell,
        |    CASE WHEN q.nrm * c.cnrm = 0.0D THEN double('NaN')
        |         ELSE round(aggregate(zip_with(q.emb, c.cvec, (a, b) -> a * b),
        |           0.0D, (acc, x) -> acc + x) / (q.nrm * c.cnrm), 6) END AS csim
        |  FROM nan_q q CROSS JOIN nan_cb c)
        |SELECT vec_id, cell, csim FROM (
        |  SELECT vec_id, cell, csim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS cr
        |  FROM scored)
        |WHERE cr <= 2""".stripMargin)
    val fast = sortedRows(out, "vec_id", "cell", "csim")
    val slow = sortedRows(ref, "vec_id", "cell", "csim")
    assert(fast == slow, "NaN ranking diverged from the csim-DESC formulation")
    // and the NaN centroid is indeed the rank-1 probe everywhere
    val first = operators.VectorOps
      .withNearestCells(e.limit(5), cents, keep = 1, rounded = true)
      .select($"cell").distinct().as[Long].collect().toSet
    assert(first == Set(99L), "zero-norm centroid must rank first under csim DESC")
  }

  test("exact-tie semantics: duplicated centroids resolve to the lowest id in both paths") {
    import spark.implicits._
    // two centroids with IDENTICAL vectors: every query ties exactly and
    // must pick the lower id — the Double.compare-then-id contract
    val c0 = e.orderBy($"vec_id").limit(1).select($"emb".as("cemb"))
    val cents = c0.select(lit(5L).as("cid"), $"cemb")
      .unionAll(c0.select(lit(2L).as("cid"), $"cemb"))
      .unionAll(e.filter($"vec_id" === 7).select(lit(9L).as("cid"), $"emb".as("cemb")))
    val out = operators.VectorOps
      .withNearestCentroidD2(e, cents, "cid", "cemb", "nid", "nd2")
    val fast = sortedRows(out, "vec_id", "nid", "nd2")
    val slow = sortedRows(hofNearestL2(e, cents, "cid", "cemb"), "vec_id", "nid", "nd2")
    assert(fast == slow, "tie resolution diverged")
    val winners = out.select($"nid").distinct().as[Long].collect().toSet
    assert(!winners.contains(5L), "ties must never pick the higher duplicate id")
  }
}
