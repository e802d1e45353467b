package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus file-layout helpers — at 100 TB the WRITE layout is a query
  * optimization: partition directories turn predicate columns into
  * directory pruning (zero IO for filtered-out partitions), and bounded
  * file sizes keep task granularity sane.
  *
  * `partitionBy` columns should be low-cardinality (source, language,
  * date): each distinct tuple is a directory. High-cardinality layout
  * belongs in bucketing (see ScaleSpec's bucketed-join test) or file-level
  * sorting, not partitions. */
object CorpusLayout {

  /** Write `df` partitioned by `cols`, capping rows per file so one huge
    * partition still parallelizes on read. */
  def writePartitioned(
      df: DataFrame, path: String, cols: Seq[String],
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(cols: _*)
      .parquet(path)

  /** Read back a partitioned corpus (partition columns become data
    * columns; filters on them prune directories, asserted in spec). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read a corpus whose parquet batches were written with EVOLVING
    * schemas (columns added over time — the normal life of a long-lived
    * corpus dir): `mergeSchema` unions all file schemas; rows from
    * batches that predate a column read it as null. Off by default in
    * Spark because schema-merging footer reads cost a pass over every
    * file's metadata — that cost is the price of correctness here, so
    * this helper states it in its name instead of flipping a global
    * conf. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", true).parquet(path)

  /** Write `df` bucketed + sorted on a join key: two tables bucketed the
    * same way join with ZERO exchange on that key (asserted in ScaleSpec)
    * — the co-located-join layout for a fact table that is joined on the
    * same key repeatedly. Catalog-backed (`saveAsTable`) because bucket
    * metadata lives in the table catalog, not the files. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
}
