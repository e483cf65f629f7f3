package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max}

/** Scale-probe entry point (VERDICT r8 #5): times a SELECTED set of
  * declared queries at an arbitrary SF dir so sf0.1 → sf1 scaling
  * exponents can be measured locally (the driver bench only runs the
  * standard SFs; 100× behavior has to be extrapolated from a measured
  * 10× step). Mirrors Bench's warmup discipline — JVM/codegen warmup,
  * full-width table touch, shared stages clocked on their own line —
  * so per-query figures measure each query's OWN plan.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> <query> [query ...]
  * Prints one `SCALE <name> <seconds>` line per query (and
  * `SCALE shared_stage_s <seconds>`), greppable by tools/scale_probe.py.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleProbe <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = Tables.table(spark, sfDir, t)
      df.select(df.columns.map(c => max(col(c).cast("string"))): _*).collect()
    }
    val t0 = System.nanoTime()
    operators.TextOps.prepareSharedStages(spark, sfDir)
    operators.VectorOps.prepareSharedStages(spark, sfDir)
    operators.Flagships.prepareSharedStages(spark, sfDir)
    operators.Windows.prepareSharedStages(spark, sfDir)
    println(f"SCALE shared_stage_s ${(System.nanoTime() - t0) / 1e9}%.3f")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val q0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[scale] $name failed: ${e.getMessage}"); false }
      val s = (System.nanoTime() - q0) / 1e9
      println(f"SCALE $name ${if (ok) s else -s}%.3f")
    }
    spark.stop()
  }
}
