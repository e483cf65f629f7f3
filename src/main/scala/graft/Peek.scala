package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print ONE declared query's full result (`sbt "runMain
  * graft.Peek <query> [sfDir] [maxRows]"`) — the companion to RunOne
  * when the VALUES matter (pinning spec thresholds, eyeballing a new
  * row's output) rather than the wall time.
  */
object Peek {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val maxRows = if (args.length > 2) args(2).toInt else 100
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).show(maxRows, truncate = false)
    spark.stop()
  }
}
