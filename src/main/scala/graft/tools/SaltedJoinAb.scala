package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Scratch A/B: salted join as sort-merge vs shuffled-hash (not part of
  * the driver contract). `sbt "runMain graft.tools.SaltedJoinAb <sfDir>"` */
object SaltedJoinAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(label: String, hint: Option[String]): Unit = {
      val li = Tables.lineitem(spark, sfDir)
      val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderpriority"))
      val numSalts = 8
      val saltedFact = li.withColumn("skew_salt",
        pmod(monotonically_increasing_id(), lit(numSalts.toLong)))
      val rep0 = o.withColumn("skew_salt",
        explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
      val replicated = hint.map(rep0.hint(_)).getOrElse(rep0)
      val j = saltedFact.join(replicated,
          saltedFact("l_orderkey") === replicated("o_orderkey") &&
            saltedFact("skew_salt") === replicated("skew_salt"))
        .drop("skew_salt")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).as("sum_qty"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").as("sum_price"))
        .orderBy(col("o_orderpriority"))
      // warm + 2 timed runs
      for (i <- 0 until 3) {
        val t0 = System.nanoTime()
        j.write.format("noop").mode("overwrite").save()
        if (i > 0) println(f"[ab] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    run("sort_merge (current)", None)
    run("shuffle_hash", Some("shuffle_hash"))
    spark.stop()
  }
}
