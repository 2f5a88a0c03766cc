package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All operators take an `sfDir` (scale-factor directory) and read only the
  * tables they need; Catalyst prunes columns at the parquet scan, so loaders
  * never pre-select. At cluster scale these would be catalog tables bucketed
  * by their primary key; here they are plain parquet files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns every operator relies on, asserted at load so a drifted input
    * fails with the contract, not a deep AnalysisException.
    */
  private val requiredCols: Map[String, Seq[String]] = Map(
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "lineitem" -> Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_suppkey"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
    "customer" -> Seq("c_custkey", "c_mktsegment"),
    "part" -> Seq("p_partkey", "p_brand", "p_retailprice"))

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    requiredCols.get(table).foreach { cols =>
      val missing = cols.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"table $table at $sfDir is missing required columns: ${missing.mkString(", ")}")
    }
    df
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read nanos as long (legacy conf) and truncate to microseconds —
    * the same precision DuckDB's TIMESTAMP uses, so oracle comparisons agree.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
}
