package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (n=$n)")
    }

    val docs = graft.tables.Tpch.table(spark, sfDir, "documents")
    // warmup
    time("warmup count") { docs.count() }

    import graft.text.TextFunctions._
    val sh = docs.select(col("doc_id").as("id"), shingleSet(col("text"), 3).as("shingles"))
      .select(col("id"), size(col("shingles")).as("sz"), explode(col("shingles")).as("sh"))

    time("shingle explode") { sh.count() }
    val a = sh.alias("a"); val b = sh.alias("b")
    val joined = a.join(b, col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
    time("inverted join") { joined.count() }
    time("full d02") {
      graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("full d02 again") {
      graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    spark.stop()
  }
}
