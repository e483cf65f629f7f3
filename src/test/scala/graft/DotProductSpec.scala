package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** The native DotProduct expression must agree exactly with the HOF
  * formulation it replaced (same sequential fold), in both interpreted
  * and whole-stage-codegen execution, and be reachable from SQL.
  */
class DotProductSpec extends SparkSpecBase {

  test("graft_dot equals the aggregate(zip_with) HOF bit-for-bit on real embeddings") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val both = e.select(
      $"vec_id",
      GraftFunctions.dot($"emb", $"emb").as("native"),
      expr("aggregate(zip_with(emb, emb, (x, y) -> x * y), 0D, (a, v) -> a + v)").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    def run(): Map[Long, Double] =
      e.select($"vec_id", GraftFunctions.dot($"emb", $"emb").as("d"))
        .as[(Long, Double)].collect().toMap
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interpreted = try run() finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(withCodegen == interpreted)
  }

  test("registered as a SQL function, with float-array coercion") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
    // float arrays coerce through the builder's casts
    Tables.embeddings(spark, sfDir).limit(5).createOrReplaceTempView("emb_v")
    val n = spark.sql("SELECT graft_dot(embedding, embedding) AS d FROM emb_v")
      .collect().map(_.getDouble(0))
    assert(n.forall(_ > 0))
  }

  test("null array yields null") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS d").collect().head
    assert(r.isNullAt(0))
  }
}
