package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE declared query by name and print its wall time —
  * the per-query feedback loop for performance work (`sbt "runMain
  * graft.RunOne <query> [sfDir] [reps]"`). Bench times the whole
  * inventory; this isolates a single operator without the other ~100
  * queries' noise.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup the bench pays, so numbers are comparable
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // comma-separated names share one JVM so relative numbers are comparable
    for (nm <- name.split(',')) {
      val fn = SparkEntry.queries(nm)
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"RUNONE $nm rep=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
