package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for operators/Staging's stage-dir protocol (VERDICT r11 #7):
  * the write-tmp-then-atomic-rename contract is correctness-critical
  * for every staged table, so its failure modes are asserted here —
  * stale unmarked dirs are replaced, concurrent stagers leave one
  * complete winner, and a reader can never see truncated parquet
  * (it either reads a `_SUCCESS`-marked dir or the call throws). */
class StagingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.operators.Staging

  /** Run `body` with SPARK_GRAFT_STAGE_DIR pointed at a fresh temp root.
    * Staging reads the env var per call, so the only way to redirect it
    * in-process is the test-only sys-env override below — not available;
    * instead derive uniqueness from the stage NAME and input fingerprint
    * (each test uses its own name + inputs, so tests never collide). */
  private def freshInput(tag: String): Path = {
    val dir = Files.createTempDirectory(s"staging_spec_$tag")
    val f = dir.resolve("in.txt")
    Files.write(f, s"$tag-${System.nanoTime()}".getBytes("UTF-8"))
    dir
  }

  private def stageRootOf(): Path = Paths.get(
    sys.env.getOrElse("SPARK_GRAFT_STAGE_DIR",
      s"${sys.props("java.io.tmpdir")}/graft_stage"))

  private def stageDirFor(name: String, inputs: Seq[String]): Path =
    stageRootOf().resolve(s"$name-${Staging.fingerprint(inputs)}")

  test("prebuilt stage is read back, not re-derived") {
    val in = freshInput("reuse")
    var derives = 0
    def call() = Staging.stagedOrDerive(spark, "spec_reuse",
        Seq(in.toString)) {
      derives += 1
      spark.range(10).select(col("id"))
    }
    assert(call().count() == 10)
    assert(call().count() == 10)
    assert(derives == 1, "second call must read the staged parquet")
  }

  test("stale unmarked stage dir is replaced and re-derived") {
    val in = freshInput("stale")
    val dir = stageDirFor("spec_stale", Seq(in.toString))
    // fabricate a stale partial dir: exists, has garbage, no _SUCCESS
    Files.createDirectories(dir)
    Files.write(dir.resolve("part-garbage.parquet"), Array[Byte](1, 2, 3))
    assert(!Files.exists(dir.resolve("_SUCCESS")))
    val out = Staging.stagedOrDerive(spark, "spec_stale",
        Seq(in.toString)) {
      spark.range(7).select(col("id"))
    }
    assert(out.count() == 7)
    assert(Files.exists(dir.resolve("_SUCCESS")),
      "re-derived stage must be complete")
    assert(!Files.exists(dir.resolve("part-garbage.parquet")),
      "the stale blocker must be gone, not merged into")
  }

  test("concurrent stagers: one winner, every reader sees complete data") {
    val in = freshInput("race")
    val n = 6
    val derives = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to n).map { _ =>
      new Thread(() =>
        try {
          val df = Staging.stagedOrDerive(spark, "spec_race",
              Seq(in.toString)) {
            // deliberately slow derive so stagers overlap
            derives.incrementAndGet()
            Thread.sleep(50)
            spark.range(100).select(col("id"))
          }
          results.add(df.count())
        } catch { case t: Throwable => errors.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"no stager may fail: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toSeq == Seq.fill(n)(100L),
      "every concurrent reader must see the complete 100-row stage")
    // r18 (VERDICT r17 #8): the advisory lock makes the losers WAIT —
    // the derive body runs exactly once, not once per thread
    assert(derives.get() == 1,
      s"one derive + ${n - 1} wait-and-reads expected, got ${derives.get()} derives")
    val dir = stageDirFor("spec_race", Seq(in.toString))
    assert(Files.exists(dir.resolve("_SUCCESS")))
    // no leftover tmp/trash dirs from THIS run's losers (match on this
    // run's fingerprinted dir name — older runs' garbage is not ours)
    val leftovers = Files.list(stageRootOf()).iterator().asScala
      .map(_.getFileName.toString)
      .filter(f => f.contains(dir.getFileName.toString) &&
        (f.contains(".tmp-") || f.contains(".trash-")))
      .toSeq
    assert(leftovers.isEmpty, s"losers must clean up: $leftovers")
  }

  test("a stage that never completes throws rather than truncating") {
    // deterministic sabotage: suppress Hadoop's _SUCCESS marker, so every
    // derive attempt renames in an unmarked (by protocol: incomplete) dir
    // — the bounded retry loop must exhaust and THROW, never hand the
    // caller a read over an unmarked stage
    val in = freshInput("sabotage")
    // runtime spark.conf.set of spark.hadoop.* does not reach writers —
    // mutate the live hadoopConfiguration (restored in finally)
    val hconf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val prior = hconf.get(key)
    var attempts = 0
    hconf.set(key, "false")
    try {
      val ex = intercept[IllegalStateException] {
        Staging.stagedOrDerive(spark, "spec_sabotage", Seq(in.toString)) {
          attempts += 1
          spark.range(5).select(col("id"))
        }
      }
      assert(ex.getMessage.contains("_SUCCESS"))
      assert(attempts == 3, s"must retry the bounded 3 times, got $attempts")
    } finally {
      if (prior == null) hconf.unset(key) else hconf.set(key, prior)
    }
  }

  test("fingerprint changes when an input file changes") {
    val in = freshInput("fp")
    val f1 = Staging.fingerprint(Seq(in.toString))
    Thread.sleep(5)
    Files.write(in.resolve("in.txt"), "changed-content-xx".getBytes("UTF-8"))
    val f2 = Staging.fingerprint(Seq(in.toString))
    assert(f1 != f2)
  }
}
