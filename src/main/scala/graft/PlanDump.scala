package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: dump ONE gate query's physical plan to a file, from a
  * fresh session with a deterministic expression-id context. Used to
  * adjudicate cross-round Bench plan-hash diffs: run at both commits and
  * diff the dumps — identical output means the hash churn was global
  * expression-id allocation noise (see the planHash comment in
  * Bench.scala), a real diff is a plan regression.
  *
  *   runMain graft.PlanDump <queryName> <outFile> [sfDir] [formatted]
  *
  * With the optional 4th arg `formatted`, writes
  * `explain("formatted")` output instead (the round-evidence format
  * for plans/r{N}/<query>_{before,after}.txt) and uses the bench
  * session shape (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus)
  * so operator partition counts match what the bench runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <queryName> <outFile> [sfDir] [formatted]")
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val formatted = args.length > 3 && args(3) == "formatted"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (master, parts) =
      if (formatted) (s"local[$cpus]", cpus) else ("local[4]", "4")
    val spark = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    val text =
      if (formatted)
        df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      else df.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(1)), text)
    spark.stop()
  }
}
