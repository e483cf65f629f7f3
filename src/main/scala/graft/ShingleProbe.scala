package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the shared text pipeline
  * (`sbt "runMain graft.ShingleProbe [sfDir]"`) — shingle build, pair
  * self-join, connected components — to aim shared-stage work.
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def clock(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($r)")
    }
    val docs = Tables.documents(spark, sfDir)
    clock("docs.count")(docs.count())
    val sh = operators.TextOps.shingles(docs)
    clock("shingles.count")(sh.count())
    val cached = operators.TextOps.cachedShingles(docs)
    clock("cachedShingles materialize")(cached.count())
    clock("sizes")(cached.groupBy("doc_id").count().count())
    val inter = cached.as("a")
      .join(cached.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("i"))
    clock("inter self-join")(inter.count())
    clock("jaccardPairs full")(operators.TextOps.jaccardPairs(docs).count())
    clock("connectedComponents")(
      operators.TextOps.connectedComponents(operators.TextOps.jaccardPairs(docs)).count())
    spark.stop()
  }
}
