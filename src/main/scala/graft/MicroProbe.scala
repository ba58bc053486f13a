package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc micro-benchmark of pipeline FRAGMENTS (diagnostic, not part of
  * the driver contract): times named sub-expressions of the hot query
  * paths through the noop sink, to attribute a stage's task CPU to the
  * operator actually burning it (the guide §1.1 empirical loop, one
  * level below JobProbe's whole-query view).
  *
  *   runMain graft.MicroProbe <sfDir> [fragment...]
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.TextFunctions.wsTokens

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val wide = graft.tables.Tpch.fillCores(docs)

    def frag(name: String)(df: => DataFrame): (String, () => DataFrame) =
      name -> (() => df)

    val fragments: Seq[(String, () => DataFrame)] = Seq(
      frag("scan_text")(wide.select(col("doc_id"), col("text"))),
      frag("lower_trim_split")(wide.select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("tk"))),
      frag("wsTokens")(wide.select(col("doc_id"),
        wsTokens(lower(col("text"))).as("tk"))),
      frag("wsTokens_size")(wide.select(col("doc_id"),
        size(wsTokens(lower(col("text")))).as("n"))),
      frag("windowhash_k20_sum")(wide.select(col("doc_id"),
        aggregate(graft.functions.VectorFunctions.windowHashes64(
          wsTokens(lower(col("text"))), 20), lit(0L),
          (a, x) => shiftleft(a, 1).bitwiseXOR(x)).as("s"))),
      frag("windowhash_k20_explode")(wide
        .select(col("doc_id"), wsTokens(lower(col("text"))).as("__tk"))
        .select(col("doc_id"), posexplode(
          graft.functions.VectorFunctions.windowHashes64(col("__tk"), 20)))),
      frag("wh_groupcount")(wide
        .select(col("doc_id"), wsTokens(lower(col("text"))).as("__tk"))
        .select(col("doc_id"), posexplode(
          graft.functions.VectorFunctions.windowHashes64(col("__tk"), 20)))
        .groupBy("col").agg(count(lit(1)).as("n")).where(col("n") > 1)),
    )
    val only = args.tail.toSet
    for ((name, mk) <- fragments if only.isEmpty || only(name); rep <- 0 to 2) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      println(f"[micro] $name%-24s rep=$rep wall=${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    spark.stop()
  }
}
