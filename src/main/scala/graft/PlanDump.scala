package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: dump ONE gate query's physical plan to a file, from a
  * fresh session with a deterministic expression-id context. Used to
  * adjudicate cross-round Bench plan-hash diffs: run at both commits and
  * diff the dumps — identical output means the hash churn was global
  * expression-id allocation noise (see the planHash comment in
  * Bench.scala), a real diff is a plan regression.
  *
  *   runMain graft.PlanDump <queryName> <outFile> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <queryName> <outFile> [sfDir]")
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)),
      df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
