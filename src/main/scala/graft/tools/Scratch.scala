package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Throwaway component timer for cost attribution (not part of any
  * contract; contents change per investigation). Current: q120 sf10
  * supralinearity — per-stage wall/CPU/shuffle/spill attribution of the
  * fused wedge plan. Usage: Scratch <sfDir> <shufflePartitions>. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/scale100x")
    val parts = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm codegen on the tiny corpus first (bench protocol)
    graft.Queries.queries("q120_link_prediction")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    graft.operators.LoopCache.clearMemo()
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val wall = (i.completionTime.getOrElse(0L) -
          i.submissionTime.getOrElse(0L)) / 1e3
        println(f"[stage ${i.stageId}%3d] ${i.name.takeWhile(_ != '\n').take(60)}%-60s " +
          f"tasks=${i.numTasks}%4d wall=$wall%7.1fs cpu=${m.executorCpuTime / 1e9}%8.1fs " +
          f"run=${m.executorRunTime / 1e3}%8.1fs " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e9}%6.2fG " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e9}%6.2fG " +
          f"spillMem=${m.memoryBytesSpilled / 1e9}%6.2fG " +
          f"spillDisk=${m.diskBytesSpilled / 1e9}%6.2fG gc=${m.jvmGCTime / 1e3}%5.1fs")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    graft.Queries.queries("q120_link_prediction")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"[scratch] q120 @ $sfDir, shuffle.partitions=$parts: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
