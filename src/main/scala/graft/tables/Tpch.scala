package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cube._

/** Loaders + CubeDefs for the driver's TPC-H-ish test tables.
  *
  * This is the graft analogue of a reference user's cubedef module: the
  * engine itself (graft.cube) is schema-agnostic; this file is just the
  * concrete cube wiring for the test star schema.
  */
object Tpch {
  /** Fill the machine's cores for a COMPUTE-HEAVY map path whose source
    * scan yields fewer partitions than the session has cores (small or
    * few-files parquet — a single-row-group file cannot be split no
    * matter what `maxPartitionBytes` says). One round-robin exchange
    * right above the scan spreads the downstream per-row work
    * (tokenize/shingle/decode/dot-product) across the whole executor
    * set; at real scale the scan already produces >= cores partitions
    * and NO exchange is added, so the shuffle only ever moves a
    * "fewer-partitions-than-cores" amount of bytes (bounded by
    * cores × maxPartitionBytes). Scale-adaptive by construction:
    * sized from defaultParallelism, never a local constant.
    *
    * Measured motivation (guide §2.2/§6): the sf0.1 documents/embeddings
    * tables are one ~1 MB parquet file each → every text/dedup/sim gate's
    * scan-side stage (tokenize + window-hash, hyperplane buckets, Lloyd
    * assignment) ran on ONE core of 32 — e.g. e10's Lloyd iterations were
    * 2–3 s single-task stages; the sf10 replicas are 8–16 files on a
    * 32-core box, so even the scale sweep ran the map half-parallel.
    * Results are layout-independent: every consumer is an aggregation,
    * join or per-row map (check.py/oracle compare sorted rows), and the
    * only layout-sensitive expressions in the tree (epochShuffle's
    * zipWithIndex, Skew's salt) re-key or drop the dependence.
    */
  def fillCores(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** Load a test table, normalizing the events `ts` column to a UTC
    * TimestampType regardless of how the parquet writer annotated it:
    *  - TIMESTAMP(NANOS) → Spark rejects it unless sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true`; we get a LongType
    *    of epoch-nanos and rebuild µs here.
    *  - TIMESTAMP(isAdjustedToUTC=false, MICROS) → Spark reads
    *    TIMESTAMP_NTZ; under the UTC session timezone a plain cast
    *    reinterprets the wall-clock value as the same UTC instant.
    * Every query downstream can then assume `ts` is TimestampType.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      // Integer `div`, not `/`: epoch-nanos exceed double's 2^53 exact
      // range, so float division can land in the wrong microsecond.
      case Some(LongType)         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                      => df
    }
  }

  /** Fact table cube over lineitem. Date hierarchy hangs off l_shipdate. */
  val lineitemCube: CubeDef = CubeDef(
    labels = Seq(
      Label("l_returnflag"),
      Label("l_linestatus"),
      Label("l_orderkey"),
      Label("l_partkey"),
      Label("l_suppkey"),
      Label("l_quantity_band", (floor(col("l_quantity") / 10) * 10).cast("long")),
    ) ++ DateLabels.hierarchy("l_shipdate", dim = "ship_time"),
    measures = Seq(
      Measure("sum_qty", col("l_quantity"), Agg.Sum),
      Measure("sum_price", col("l_extendedprice"), Agg.Sum),
      Measure("sum_disc_price", col("l_extendedprice") * (lit(1) - col("l_discount")), Agg.Sum),
      Measure("n_rows", lit(1), Agg.Count),
      Measure("avg_qty", col("l_quantity"), Agg.Avg),
      Measure("std_qty", col("l_quantity"), Agg.StdDev),
      Measure("min_qty", col("l_quantity"), Agg.Min),
      Measure("max_qty", col("l_quantity"), Agg.Max),
      Measure("grp_flag", col("l_returnflag"), Agg.GroupConsistent),
      Measure("margin_ratio",
        lit(0), // expr unused by Ratio
        Agg.Ratio(col("l_extendedprice") * (lit(1) - col("l_discount")), col("l_extendedprice"))),
      Measure("sum_tax", col("l_tax"), Agg.Sum),
      Measure("n_parts", col("l_partkey"), Agg.CountDistinct),
    ),
  )

  /** Orders cube; date hierarchy on o_orderdate. */
  val ordersCube: CubeDef = CubeDef(
    labels = Seq(
      Label("o_orderstatus"),
      Label("o_orderpriority"),
      Label("o_custkey"),
    ) ++ DateLabels.hierarchy("o_orderdate", dim = "order_time"),
    measures = Seq(
      Measure("sum_total", col("o_totalprice"), Agg.Sum),
      Measure("min_total", col("o_totalprice"), Agg.Min),
      Measure("max_total", col("o_totalprice"), Agg.Max),
      Measure("n_orders", lit(1), Agg.Count),
      Measure("n_cust", col("o_custkey"), Agg.CountDistinct),
      Measure("grp_status", col("o_orderstatus"), Agg.GroupConsistent),
      Measure("labeled_total", col("o_totalprice"),
        Agg.Labeled(col("o_orderstatus"), Agg.Sum)),
      Measure("approx_cust", col("o_custkey"), Agg.ApproxDistinct()),
    ),
  )

  /** Part cube — includes the set-valued label over p_type words
    * (reference SetLabel, bacon/cubedef.py:532).
    */
  val partCube: CubeDef = CubeDef(
    labels = Seq(
      Label("p_brand"),
      Label("p_type"),
      Label("p_size_band", (floor(col("p_size") / 10) * 10).cast("long")),
      Label("p_name"),
      Label("p_partkey"),
      Label("type_words", split(col("p_type"), " "), isSet = true),
      Label("name_words", split(col("p_name"), " "), isSet = true),
    ),
    measures = Seq(
      Measure("sum_retail", col("p_retailprice"), Agg.Sum),
      Measure("n_parts", lit(1), Agg.Count),
      Measure("type_word_set", split(col("p_type"), " "), Agg.UnionSet),
      // Union's included_empty companion over the red/blue name words —
      // some parts have neither word, so the flag is exercised both ways.
      Measure("rb_word_set", array_intersect(split(col("p_name"), " "),
        array(lit("red"), lit("blue"))), Agg.UnionSet),
      Measure("rb_included_empty", array_intersect(split(col("p_name"), " "),
        array(lit("red"), lit("blue"))), Agg.UnionIncludedEmpty),
    ),
  )

  /** Events cube (the "stream" table, here in batch form). */
  val eventsCube: CubeDef = CubeDef(
    labels = Seq(
      Label("event_type"),
      Label("user_id"),
    ) ++ DateLabels.hierarchy("ts", dim = "event_time") :+
      Label("ts_hour", date_trunc("hour", col("ts")), dimension = Some("event_time"), childOf = Seq("ts_day")),
    measures = Seq(
      Measure("sum_value", col("value"), Agg.Sum),
      Measure("n_events", lit(1), Agg.Count),
      Measure("n_users", col("user_id"), Agg.CountDistinct),
    ),
  )
}
