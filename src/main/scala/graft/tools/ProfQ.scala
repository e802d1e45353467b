package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object ProfQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val name = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      val t0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: SparkListenerJobStart): Unit =
        t0.put(j.jobId, (System.nanoTime(), j.properties.getProperty("spark.job.description", "?").take(120)))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        // an unmatched end (start event dropped under listener-bus
        // overflow) must not NPE inside the listener thread
        Option(t0.get(j.jobId)).foreach { case (s, d) =>
          println(f"[job ${j.jobId}%3d] ${(System.nanoTime()-s)/1e9}%7.2f s  $d")
        }
    })
    // optional 3rd arg: iteration count (default 1). Later iterations
    // profile the WARM shape — page cache hot, codegen compiled — the
    // tier Bench's headline measures.
    val iters = if (args.length > 2) args(2).toInt else 1
    for (it <- 1 to iters) {
      println(s"--- iteration $it")
      val t = System.nanoTime()
      graft.Queries.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[total] ${(System.nanoTime()-t)/1e9}%.2f s")
    }
    spark.stop()
  }
}
