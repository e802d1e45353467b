package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Throwaway component timer for cost attribution (not part of any
  * contract; contents change per investigation). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Paths.get("/tmp/graft_stage")
    val dir = root.resolve(s"scratch_race-${System.nanoTime()}")
    val tmp = root.resolve(s".${dir.getFileName}.tmp-test")
    spark.range(10).write.mode("overwrite").parquet(tmp.toString)
    // simulate winner present
    val winnerTmp = root.resolve(s".${dir.getFileName}.tmp-winner")
    spark.range(10).write.mode("overwrite").parquet(winnerTmp.toString)
    Files.move(winnerTmp, dir, StandardCopyOption.ATOMIC_MOVE)
    try {
      Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      println("[scratch] move SUCCEEDED (unexpected)")
    } catch {
      case e: Throwable =>
        println(s"[scratch] move threw ${e.getClass.getName}: ${e.getMessage}")
    }
    println(s"[scratch] tmp still exists: ${Files.exists(tmp)}")
    spark.stop()
  }
}
