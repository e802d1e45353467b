package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Scale-mechanics tests: bucketed co-located joins (shuffle elimination)
  * and IVF recall against the brute-force reference. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle on the bucket key") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
    graft.operators.CorpusLayout.writeBucketed(
      o, "orders_b", s"$wh/orders_b", "o_custkey", 8)
    graft.operators.CorpusLayout.writeBucketed(
      c, "customer_b", s"$wh/customer_b", "c_custkey", 8)
    // disable auto-broadcast so the join would otherwise need a shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == o.count()) // every order has a customer
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("LoopCache: N-round iterative ops leave O(1) live cache entries") {
    val sc = spark.sparkContext
    // small undirected-ish graph with enough structure for 5 rounds
    val edges = (for {
      a <- 1L to 30L; b <- 1L to 30L
      if a != b && (a % 7 == b % 7 || a + 1 == b)
    } yield (a, b)).toDF("src", "dst")
    val seeds = Seq(1L, 2L).toDF("id")

    def delta[T](before: Int)(run: => T): Int = {
      run; sc.getPersistentRDDs.size - before
    }
    // each operator may keep its pinned FINAL table, nothing per-round:
    // 5 rounds without the release would leak 5-6 entries per run
    assert(delta(sc.getPersistentRDDs.size) {
      operators.Bfs.levels(edges, "src", "dst", seeds, "id", rounds = 5).count()
    } <= 1, "Bfs leaked per-round level tables")
    // PageRank keeps TWO deliberate entries: the pinned final plus the
    // 1-row node-count aggregate (LoopCache.pinnedRow — the token scale
    // feeds plan construction, so caching the count is what lets warm
    // re-invocations skip the edge pass entirely)
    assert(delta(sc.getPersistentRDDs.size) {
      operators.PageRank.fixedPoint(edges, "src", "dst", iterations = 5).count()
    } <= 2, "PageRank leaked its edge anchor")
    // re-invocation must add NOTHING: count row + final both probe cached
    assert(delta(sc.getPersistentRDDs.size) {
      operators.PageRank.fixedPoint(edges, "src", "dst", iterations = 5).count()
    } == 0, "warm PageRank re-invocation missed its pinned count/final")
    assert(delta(sc.getPersistentRDDs.size) {
      operators.LabelPropagation.communities(edges, "src", "dst", rounds = 5).count()
    } <= 1, "LPA leaked its edge anchor")
    assert(delta(sc.getPersistentRDDs.size) {
      val vecs = (1L to 40L).map(i => (i, Seq.tabulate(4)(d => ((i * 7 + d) % 13).toInt)))
        .toDF("id", "codes")
      operators.IntCluster.kmeans(vecs, "id", "codes", k = 3, iterations = 4).count()
      // pinned final + the 1-row corpus-count aggregate feeding loopWidth
    } <= 2, "kmeans leaked per-round centroid tables / the corpus anchor")
  }

  test("selective filters and projections reach the parquet scan") {
    val sf = "/root/testdata/sf0.001"
    val q11 = QueriesRelational.filterRevenue(spark, sf)
    val plan = q11.queryExecution.executedPlan.toString
    // predicate pushdown: the lineitem scan must carry pushed filters,
    // not read-everything-then-filter
    assert(plan.contains("PushedFilters: ["), plan)
    assert(!plan.contains("PushedFilters: []"), plan)
    // column pruning: a 2-column aggregate must not read the whole schema
    val scanSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanSchema.contains("l_comment"), scanSchema)
  }

  test("q12 five-way join broadcasts the dimension tables") {
    val plan = QueriesRelational.joinRevenue(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("minhash signatures plan is map-only (no Exchange below the scan)") {
    val sigs = graft.operators.Dedup.minHashSignatures(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
    val plan = sigs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // and the signature expression runs inside WholeStageCodegen
    // (rendered as a `*(n)` stage prefix in the plan string)
    assert(plan.contains("*(1)"), plan)
  }

  test("hash sampling is a pure pushdown-safe filter (no shuffle, no agg)") {
    val s = graft.operators.Sampling.lehmerSample(
      Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", 0.3)
    val plan = s.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("q56 corpus-prep pipeline fuses: shuffles only at dedup window and final agg") {
    val plan = QueriesPipeline.corpusPrep(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // quality filter + sampling are narrow (fused into the scans/window);
    // expected KEYED exchanges: dedup window partitioning, final agg hash
    // partitioning, and the output sort — anything more means a stage
    // leaked. The conditional scan rebalance (round-robin, fires only on
    // coarse single-row-group local scans) is not a keyed stage boundary
    // and is excluded from the count.
    val keyedExchanges =
      "Exchange (hash|range)partitioning".r.findAllIn(plan).length
    assert(keyedExchanges <= 3, s"$keyedExchanges keyed exchanges:\n$plan")
    // and nothing may collapse the pipeline into one task — the failure
    // mode the old count-all-exchanges bound also caught
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition stage leaked into corpusPrep:\n$plan")
  }

  test("sourceOverlap: two keyed shuffles, pair expansion without a self-join") {
    val docs = Seq(
      ("a", "s1 s2 x1 x2"), ("b", "s1 s2 y1 y2"), ("c", "s1 s2"))
      .toDF("source", "text")
    val q = graft.operators.Overlap.sharedBlockMatrix(
      docs, "source", "text", blockTokens = 2)
    val plan = q.queryExecution.executedPlan.toString
    // block groupBy (collect_set) + pair-count groupBy; the (source,block)
    // distinct must fold into the set aggregate, and the upper-triangle
    // expansion is an array expression — a join would mean the block table
    // got self-joined, the shape that explodes at corpus scale
    val keyed = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(keyed == 2, s"$keyed keyed exchanges:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in sourceOverlap:\n$plan")
  }

  test("q72 upsert: rank pushdown trims winners pre-shuffle; snapshot joins in place") {
    val plan = QueriesPipeline.upsertLatest(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // WindowGroupLimit = per-partition top-1 BEFORE the window exchange
    assert(plan.contains("WindowGroupLimit"), plan)
    // two hash exchanges in the STATIC plan — the update path's winners
    // window and the insert path's copy of it, which are canonically
    // identical so AQE's stage reuse executes the shuffle once. The
    // snapshot's full rows never hash-shuffle: winners broadcast into
    // the left join, snapshot KEYS broadcast into the anti join.
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx <= 2, s"$hashEx hash exchanges:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("evolved-schema corpus read: old batches null-fill new columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    try {
      // batch 1: original schema; batch 2: adds a `lang` column
      Seq((1L, "a")).toDF("doc_id", "text")
        .write.parquet(s"$dir/batch=1")
      Seq((2L, "b", "en")).toDF("doc_id", "text", "lang")
        .write.parquet(s"$dir/batch=2")
      val got = graft.operators.CorpusLayout.readEvolved(spark, dir)
        .select($"doc_id", $"lang")
        .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, None), (2L, Some("en"))))
      // the plain reader picks ONE file's schema and would drop `lang`
      // for some read orders — the helper exists precisely for this
      assert(graft.operators.CorpusLayout.readEvolved(spark, dir)
        .columns.contains("lang"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively(): Unit
    }
  }

  test("partitioned corpus layout: filters prune partition directories") {
    val outPath = java.nio.file.Files.createTempDirectory("graft_part")
    val out = outPath.toString
    try {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      graft.operators.CorpusLayout.writePartitioned(docs, out, Seq("source"))
      // directory-per-source on disk
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("source=")).sorted
      assert(dirs.length == 20, dirs.mkString(","))
      val back = graft.operators.CorpusLayout.readPartitioned(spark, out)
        .filter(col("source") === "src3")
      val plan = back.queryExecution.executedPlan.toString
      // the filter must land in PartitionFilters (directory pruning), and
      // the scan must report only the matching partition's files
      assert(plan.contains("PartitionFilters: [isnotnull(source"), plan)
      assert(back.count() == docs.filter(col("source") === "src3").count())
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(outPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("q58 per-key average: one orders scan, window in place of the self-join") {
    val plan = QueriesAnalytics.correlatedAboveAvg(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // r19: the correlated average is computed by a window over ONE scan
    // (the decorrelated aggregate + join re-scanned orders); no subquery,
    // no join, a single parquet scan
    assert(!plan.contains("ScalarSubquery"), plan)
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
  }

  test("q59 star join: all three dimensions broadcast, fact side never shuffles pre-agg") {
    val plan = QueriesAnalytics.partsSupplyStar(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length == 3, plan)
    // only exchanges: final agg partitioning + output sort (+ broadcasts)
    assert(!plan.contains("Exchange hashpartitioning(l_"), plan)
  }

  test("q60 trigram stats are map-only before the output sort") {
    val plan = QueriesAnalytics.trigramStats(
        Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("q62 array HOFs run inside whole-stage codegen, no shuffle before sort") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val noSort = e.select(size(filter(col("embedding"), v => v > lit(0.0f))).as("n"))
    val plan = noSort.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1)"), plan)
  }

  test("q63 argmax-by-struct plans as one partial/final agg, no window sort") {
    val plan = QueriesAnalytics.argmaxTopOrder(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // one hash-partitioned exchange for the agg + one range for the sort
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("int8 knn recalls most of the float brute-force top-5") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 5)
    def topSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"neighbor_id").as[(Long, Long)].collect().toSet
    val exact = topSet(Similarity.bruteForceKnn(emb, queries, k = 5))
    val quant = topSet(Similarity.int8Knn(emb, queries, k = 5))
    // 7-bit codes perturb near-tie orderings but must keep the bulk of
    // the neighborhood: recall@5 >= 60% on random vectors
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@5 = $recall")
  }

  test("LSH knn recovers planted exact duplicates at rank 1") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 5)
    // identical vectors fall in the SAME hyperplane bucket with
    // certainty, so the planted copy must be every query's rank-1 at
    // cosine 1.0 — the deterministic slice of a probabilistic operator
    val planted = queries.select(($"vec_id" + 100000L).as("vec_id"),
      $"embedding", $"label")
    val rank1 = Similarity.lshKnn(emb.unionByName(planted), queries, k = 1)
      .select($"qid", $"neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach(q => assert(rank1(q) == q + 100000L, s"q=$q"))
  }

  test("IVF knn: perfect recall on planted exact duplicates, bounded candidates") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 5)
    val ivf = Similarity.ivfKnn(emb, queries, k = 1, nCentroids = 8, nProbe = 2)
      .collect()
    // rank-1 neighbor under IVF must match brute force for the planted case:
    // query vectors ARE corpus vectors, so their own cell is probed first and
    // the true nearest neighbor of an identical vector is itself — excluded —
    // so compare rank-1 against brute force restricted to the probed cells is
    // circular; instead check the structural contract:
    assert(ivf.length == 5) // every query produced a rank-1 neighbor
    assert(ivf.forall(_.getAs[Int]("rank") == 1))
    // and recall vs brute force at k=1 should be high but is probabilistic;
    // require at least 3/5 agreement for nProbe=2 of 8 cells
    val brute = Similarity.bruteForceKnn(emb, queries, k = 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor_id")).toMap
    val agree = ivf.count(r =>
      brute(r.getAs[Long]("qid")) == r.getAs[Long]("neighbor_id"))
    assert(agree >= 3, s"IVF@1 agreed on only $agree/5 queries")
  }

  test("banded cosine screen: product-free plan, full recall vs exact pairs") {
    val sf = "/root/testdata/sf0.001"
    // 1) the q84 capstone plan must contain NO product operator: the pair
    // stage is a (band, key) equi-join, never a cross join
    val q84plan = QueriesCorpus.semanticDedup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!q84plan.contains("CartesianProduct"), q84plan)
    assert(!q84plan.contains("BroadcastNestedLoopJoin"), q84plan)
    // 2) recall check against the exact ground truth on the planted
    // corpus: the banded screen's verified pairs must equal the exact
    // upper-triangle threshold join's pairs (exact duplicates collide in
    // every band with certainty; organic >=0.99 pairs, if any, must also
    // be caught — this is the assumption q84's oracle greenness rests on)
    val corpus = QueriesText.plantedEmbeddingCorpus(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a".cast("long"), $"id_b".cast("long"))
        .as[(Long, Long)].collect().toSet
    val exact = pairSet(Similarity.exactCosinePairs(corpus, minCosine = 0.99))
    val bandedDf = Similarity.cosineNearDupsBanded(corpus, minCosine = 0.99)
    val banded = pairSet(bandedDf)
    assert(banded == exact,
      s"banded screen missed ${(exact -- banded).size} pairs / " +
        s"invented ${(banded -- exact).size}")
    // 3) the band-keyed exchanges (shuffle OR broadcast — at sf0.001 the
    // tiny id-only screen side broadcasts) must carry ids only, never the
    // embedding payload: a band exchange whose row schema contains an
    // array column means the screen is shipping vectors nBands x through
    // the exchange — the r8-flagged weak shape. Vectors are allowed to
    // move only in the candidate-bounded gather (no band column there).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.types.ArrayType
    // the screen plan lives inside LoopCache-pinned InMemoryRelations
    // (the result frame is pinned, and the candidate frame is pinned
    // inside it), and AQE hides subtrees behind leaf wrappers
    // (AdaptiveSparkPlanExec / query stages) — flatten ALL of them so
    // every physical node in the executed pipeline is visible
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val direct = p.collect { case n => n }
      direct ++ direct.flatMap {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: QueryStageExec => nodes(q.plan)
        case s: InMemoryTableScanExec => nodes(s.relation.cachedPlan)
        case _ => Nil
      }
    }
    val bandExchanges = nodes(bandedDf.queryExecution.sparkPlan).collect {
      case e: Exchange if e.output.exists(_.name == "band") => e
    }
    assert(bandExchanges.nonEmpty, "expected a band-keyed exchange")
    bandExchanges.foreach { e =>
      val arrays = e.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrays.isEmpty,
        s"band exchange carries array payload ${arrays.map(_.name)}:\n$e")
    }
  }

  test("kmeans assignment is map-only: no keyed exchange of the vector side") {
    // iterations=1 isolates the assignment pass; centroid seeding is a
    // bounded top-k (TakeOrdered + single-partition k-row stages), so any
    // hashpartitioning exchange means the vector payload got shuffled —
    // the shape the array-fold argmin exists to avoid
    val vecs = (0L to 99L).map(i => (i, Array.fill(8)(i.toInt % 11)))
      .toDF("vec_id", "codes")
    val plan = graft.operators.IntCluster
      .kmeans(vecs, "vec_id", "codes", k = 4, iterations = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("centroid outliers: codes never reach the ranking window's shuffle") {
    val vecs = (0L to 99L).map(i => (i, s"g${i % 3}", Array.fill(8)(i.toInt % 11)))
      .toDF("vec_id", "label", "codes")
    val q = graft.operators.IntCluster
      .centroidOutliers(vecs, "vec_id", "label", "codes")
    val plan = q.queryExecution.executedPlan.toString
    // expected keyed exchanges: per-dim centroid agg, centroid list agg,
    // rank window — the member table itself re-joins the centroids
    // BROADCAST and drops codes before the window
    val keyed = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(keyed <= 3, s"$keyed keyed exchanges:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("temperature-mix sample is a broadcast-join pure filter: no keyed exchange") {
    val df = (1L to 500L).map(i => (i, s"src${i % 5}")).toDF("doc_id", "source")
    val targets = graft.operators.Sampling.sqrtTemperatureTargets(df, "source")
    val plan = graft.operators.Sampling
      .temperatureMixSample(df, "source", "doc_id", targets)
      .queryExecution.executedPlan.toString
    assert(!"Exchange (hash|range)partitioning".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("fuzzy blockedPairs joins on salt buckets with the distance LAST " +
      "in the residual (the 10x-measured skew/ordering regression pins)") {
    val plan = graft.operators.FuzzyMatch.blockedPairs(
        Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the join must key on the salt-bucket pair (ba, bb), not on blk
    // alone — keying on blk alone is the shape that serialized a hot
    // block's m^2 verifications onto one task at 10x
    assert("\\[blk#\\d+, ba#\\d+, bb#\\d+\\]".r.findFirstIn(plan).isDefined
      || plan.contains("ba#"), plan)
    // and the levenshtein residual must run AFTER the cheap salt/id
    // predicates: a pushed-in distance filter evaluates the edit
    // distance on every bucket-collision pair
    val cond = plan.linesIterator
      .find(l => l.contains("levenshtein") && l.contains("least")).getOrElse("")
    assert(cond.nonEmpty, plan)
    assert(cond.indexOf("least") < cond.indexOf("levenshtein"), cond)
  }

  test("repetition metrics plan: doc-keyed only, no product, no single-partition funnel") {
    val plan = graft.operators.Repetition.metrics(
        Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // every keyed exchange is (doc) or (doc, gram) — corpus-global state
    // would show up as a SinglePartition exchange
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("repetition metrics: production plan is MAP-ONLY (zero exchanges); " +
      "relational gram exchanges carry fixed-width hashes, never strings") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.types.StringType
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val direct = p.collect { case n => n }
      direct ++ direct.flatMap {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: QueryStageExec => nodes(q.plan)
        case _ => Nil
      }
    }
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // production tier: every metric is per-document, so the plan must be
    // scan->project with NO exchange at all — the strongest scale shape
    val prod = graft.operators.Repetition.metrics(docs, "doc_id", "text")
      .queryExecution.executedPlan
    assert(nodes(prod).collect { case e: Exchange => e }.isEmpty,
      prod.toString)
    // relational reference tier: the (doc, gram) shuffles were q140's
    // dominant cost when they keyed on raw 5-gram strings (VERDICT r9
    // #3); the hashed tier must keep them at 3 longs/row
    val rel = graft.operators.Repetition
      .metricsRelational(docs, "doc_id", "text", hashGrams = true)
      .queryExecution.executedPlan
    val gramEx = nodes(rel).collect {
      case e: Exchange if e.output.exists(_.name == "gh") => e
    }
    assert(gramEx.nonEmpty, rel.toString)
    gramEx.foreach { e =>
      val strs = e.output.filter(_.dataType == StringType)
      assert(strs.isEmpty,
        s"gram exchange carries string payload ${strs.map(_.name)}:\n$e")
    }
  }

  test("cross-corpus banded screen: band exchange carries ids only") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.types.ArrayType
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val eval_ = emb.filter($"vec_id" < 20)
      .select(($"vec_id" + 200000L).as("vec_id"), $"embedding")
    val df = graft.operators.Similarity
      .crossCosineNearDupsBanded(emb, eval_, minCosine = 0.99)
    assert(df.count() == 20) // planted copies all recovered
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val direct = p.collect { case n => n }
      direct ++ direct.flatMap {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: QueryStageExec => nodes(q.plan)
        case s: InMemoryTableScanExec => nodes(s.relation.cachedPlan)
        case _ => Nil
      }
    }
    val bandExchanges = nodes(df.queryExecution.sparkPlan).collect {
      case e: Exchange if e.output.exists(_.name == "band") => e
    }
    assert(bandExchanges.nonEmpty, "expected a band-keyed exchange")
    bandExchanges.foreach { e =>
      val arrays = e.output.filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrays.isEmpty,
        s"band exchange carries array payload ${arrays.map(_.name)}:\n$e")
    }
  }

  test("memory envelope ceilings: q121 and q56 run spill-free with bounded " +
      "per-task execution memory at sf0.01") {
    // regression pins on the two memory-heaviest dedup shapes (VERDICT
    // r8 #6): the fuzzy candidate join and the corpus-prep dedup window.
    // Measured ~8 MB peak task memory each at sf0.01; the 256 MB ceiling
    // is ~30x headroom — it exists to catch a blowup (a de-salted join
    // buffering a whole hot block, a window losing its partial
    // aggregation), not to pin noise. Disk spill must be exactly zero:
    // any spill at this scale means a task tried to buffer far beyond
    // the data's working set.
    val sf = "/root/testdata/sf0.01"
    for (name <- Seq("q121_fuzzy_matches", "q56_corpus_prep")) {
      val q = Queries.registry.find(_.name == name).get
      spark.catalog.clearCache()
      graft.operators.LoopCache.clearMemo()
      val e = graft.tools.TaskEnvelope.measure(spark) {
        q.fn(spark, sf).write.format("noop").mode("overwrite").save()
      }
      assert(e.diskSpill == 0L, s"$name spilled ${e.diskSpill} B to disk")
      assert(e.peakTaskMem <= 256L * 1024 * 1024,
        s"$name peak task memory ${e.peakTaskMem} B breached the ceiling")
    }
  }

  test("memory envelope ceilings at sf0.1: dedup/LSH/capstone shapes stay " +
      "spill-free under bounded per-task execution memory") {
    // VERDICT r12 #6: the sf0.01 envelope above catches kernel-level
    // blowups but not scale-dependent ones (a hot fuzzy block, an LSH
    // bucket that grows with the corpus, the capstone's widest join).
    // Measured sf0.1 peaks (r13): q121 65 MB, q56 64 MB, q112 66 MB,
    // q32/q41 similar — the 128 MB ceiling is ~2x headroom, so a kernel
    // edit that regresses task memory by the next power of two fails
    // red here before it becomes a prodcold surprise. Spill must stay
    // exactly zero: these operators are built to never buffer beyond a
    // bounded candidate set per task.
    //
    // q34 is DIFFERENT BY DESIGN and carries its own ceiling: it is the
    // spec-only EXACT all-pairs jaccard tier (bench=false) whose
    // candidate set is every doc pair sharing any token — inherently
    // corpus-quadratic (measured 1.35 GB peak task at sf0.1, the
    // (id_a,id_b) aggregate map; it degrades to sort-spill, not OOM,
    // past the executor's share). The SCREENS (q32 minhash, q33
    // simhash, q124 prefix, q132 SNM) are the scale path; q34's pin
    // exists to catch a regression in the exact tier's CURRENT
    // footprint, not to claim it scales.
    val sf = "/root/testdata/sf0.1"
    for ((name, ceilingMb) <- Seq(
        "q121_fuzzy_matches" -> 128L, "q56_corpus_prep" -> 128L,
        "q112_corpus_prep2" -> 128L, "q34_jaccard_pairs" -> 2048L,
        "q32_minhash_pairs" -> 128L, "q41_knn_lsh" -> 128L)) {
      val q = Queries.registry.find(_.name == name).get
      spark.catalog.clearCache()
      graft.operators.LoopCache.clearMemo()
      val e = graft.tools.TaskEnvelope.measure(spark) {
        q.fn(spark, sf).write.format("noop").mode("overwrite").save()
      }
      info(f"$name: peak task ${e.peakTaskMem / 1024.0 / 1024}%.1f MB, " +
        s"spill ${e.diskSpill} B")
      assert(e.diskSpill == 0L, s"$name spilled ${e.diskSpill} B to disk")
      assert(e.peakTaskMem <= ceilingMb * 1024 * 1024,
        s"$name peak task memory ${e.peakTaskMem} B breached the sf0.1 ceiling")
    }
  }

  // ---- wave-8 plan pins: the load-bearing shapes PLANS.md documents ----

  private def planOf(name: String): String = {
    val q = Queries.registry.find(_.name == name).get
    q.fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
  }
  private def keyedExchanges(plan: String): Int =
    "Exchange (hash|range)partitioning".r.findAllIn(plan).length

  test("q143 DSIR: LLR broadcast, TakeOrdered selection, one shared tokenize exchange") {
    val plan = planOf("q143_dsir_importance")
    // the 4096-row model table must broadcast to the scoring pass, never
    // shuffle-join against the feature stream
    assert(plan.contains("BroadcastHashJoin"), plan)
    // Gumbel top-k is a TakeOrdered tree-reduction, not a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // r18 one-tokenize shape: the feature stream collapses into ONE
    // (doc, target, bucket) count exchange that BOTH models consume —
    // it appears once per consumer in the static plan (AQE dedupes the
    // canonically-identical exchanges into one materialized stage at
    // runtime, measured as the tokenize pass running once, not twice).
    // Keyed stages: that shared exchange (×2 textual), the bucket-model
    // aggregate, the per-doc re-aggregate; distinct signatures ≤ 3.
    assert(keyedExchanges(plan) <= 4, s"${keyedExchanges(plan)} keyed:\n$plan")
    val sigs = "Exchange (hash|range)partitioning\\([^)]*\\)".r
      .findAllIn(plan).map(_.replaceAll("#\\d+[L]?", "")).toSeq
    assert(sigs.distinct.size <= 3, s"${sigs.distinct.size} distinct keyed:\n$plan")
    assert(sigs.size - sigs.distinct.size >= 1,
      s"expected the shared (doc,target,bucket) exchange to appear per consumer:\n$plan")
  }

  // r19 one-pass rewrites (q87/q167/q77): both consumers of the
  // per-(doc, block|chunk) pre-count aggregate must stay CANONICALLY
  // EQUAL below their exchange — that equality is the exact condition
  // for AQE to materialize the tokenize/chunk stage once (measured:
  // one 32-task stage whose shuffle output is read by both branches).
  // Column pruning breaks it silently (dropping an unused partial
  // buffer from one branch forks the subtrees), so the pin asserts the
  // physical condition itself, not a string shape.
  private def hasCanonicallySharedExchange(name: String): Boolean = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val q = Queries.registry.find(_.name == name).get
    val sp = q.fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    sp.collect { case e: ShuffleExchangeExec => e.canonicalized }
      .groupBy(identity).exists(_._2.size >= 2)
  }

  test("q87/q167/q77 one-pass pre-counts: the tokenize exchange is shared") {
    for (n <- Seq("q87_boilerplate_scrub", "q167_cdc_dup_chunks",
        "q77_dup_block_ratio", "q127_vocab_coverage"))
      assert(hasCanonicallySharedExchange(n),
        s"$n: no canonically-equal exchange pair — the pre-count subtree " +
          "forked (column pruning?) and the corpus pays two tokenize passes")
  }

  test("q22 asof: one orders scan, day-grain window") {
    val plan = planOf("q22_asof_prev_spend")
    // day-grain rewrite (r19): the daily aggregate gathers each day's
    // order keys, lag(1) runs over DAY rows, explode restores order
    // grain — the second orders scan and the |orders|+|days| union
    // window are gone
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("Generate explode"), plan)
    assert(keyedExchanges(plan) <= 3, s"${keyedExchanges(plan)} keyed:\n$plan")
  }

  test("q145 BPE: pair mining over word types, TakeOrdered top-k") {
    val plan = planOf("q145_bpe_merges")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // word count + pair aggregate are the only keyed stages
    assert(keyedExchanges(plan) <= 2, s"${keyedExchanges(plan)} keyed:\n$plan")
  }

  test("q146 hard negatives: anchors broadcast, rank-limit pushed below the shuffle") {
    val plan = planOf("q146_hard_negatives")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    // WindowGroupLimit must trim each partition to its per-anchor top-k
    // BEFORE the qid exchange - the property that bounds the shuffle at
    // |anchors|*k rows per partition regardless of corpus size
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(keyedExchanges(plan) <= 2, s"${keyedExchanges(plan)} keyed:\n$plan")
  }

  test("q147 dataset card: document text never rides the distinct shuffle") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val q = Queries.registry.find(_.name == "q147_dataset_card").get
    val df = q.fn(spark, "/root/testdata/sf0.001")
    val sp = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    // the conditional scan rebalance is ROUND-ROBIN and legitimately
    // carries text (it exists to spread the tokenize/md5 work of a
    // coarse local scan; a no-op on real multi-file inputs) — the pin
    // is about the KEYED aggregation shuffles
    val shuffles = sp.collect { case e: ShuffleExchangeExec => e }
      .filterNot(_.outputPartitioning
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning])
    assert(shuffles.nonEmpty)
    assert(shuffles.forall(e => !e.output.exists(_.name == "text")),
      s"text must not ride the dataset-card keyed shuffles:\n$sp")
  }

  test("loop tuning: width from volume, session isolation, kill switch") {
    import graft.operators.LoopCache
    // width grows with volume and caps at the cluster's parallelism
    val cores = spark.sparkContext.defaultParallelism
    assert(LoopCache.loopWidth(spark, 0L) == 1)
    assert(LoopCache.loopWidth(spark, 300000L) == 1)
    assert(LoopCache.loopWidth(spark, 300001L) == math.min(2, cores))
    assert(LoopCache.loopWidth(spark, 2390000L) == math.min(8, cores))
    // loop width caps at the cluster parallelism — the r18 spill guard
    // that grew it to 8×cores at huge volumes was A/B-measured as a
    // 1.7–2× regression at the sf10 replica and removed (SCALE.md §r19:
    // wider rounds reduce map-side combining and cannot reduce the round
    // join's spill, which scales with rows, not reduce width)
    assert(LoopCache.loopWidth(spark, Long.MaxValue / 2) == cores)
    // pairWidth (shared by LPA rounds + BM25 fan-out routing): never
    // below the floor, ~1M rows/task sizing, 64×cores ceiling
    assert(LoopCache.pairWidth(spark, 0L, floor = 3) == 3)
    assert(LoopCache.pairWidth(spark, 5000000L, floor = 1) == 5)
    assert(LoopCache.pairWidth(spark, Long.MaxValue / 2, floor = 1) == 64 * cores)
    // the tuned session is a clone: loop conf set there, parent untouched
    val tuned = LoopCache.loopSession(spark, 3)
    assert(tuned.conf.get("spark.sql.shuffle.partitions") == "3")
    assert(tuned.conf.get("spark.sql.adaptive.enabled") == "false")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.shuffle.partitions") != "3")
    // memoized per (parent, width); pins made under it are visible to the
    // parent (shared CacheManager) — rebind round-trips the same plan
    assert(LoopCache.loopSession(spark, 3) eq tuned)
    val df = spark.range(10).toDF("id")
    val re = org.apache.spark.sql.graftbridge.SqlBridge.rebind(df, tuned)
    assert(re.sparkSession eq tuned)
    re.persist(); re.count()
    assert(LoopCache.cached(spark.range(10).toDF("id")),
      "a pin made under the tuned session must be visible to the parent")
    spark.range(10).toDF("id").unpersist(blocking = true)
  }

  test("k-core adjacency round: node-sized exchanges only, stationary adjacency") {
    import graft.operators.LoopCache
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // mirror KCore.runAdj's round construction (round-13 fix: the
    // edge-layout peel re-shuffled the full edge table per round once
    // the alive set outgrew the broadcast estimate). Pin: a round's
    // live exchanges are ALL node-sized (loop width, over id/src keys),
    // and the adjacency operand reads its cache with no sort/exchange.
    val adj = (1L to 2000L)
      .map(i => (i, 2L, Array(i % 97L + 1L, i % 89L + 2L)))
      .toDF("src", "outdeg", "dsts")
    val w = 4
    val a = LoopCache.tunedInputs(w, adj).head
      .repartition(w, col("src")).sortWithinPartitions("src")
      .persist()
    a.count()
    val alive = a.select(col("src").as("id"), col("outdeg").as("degree"))
      .persist()
    alive.count()
    val kdf = broadcast(alive.agg(
      expr("CAST(sum(degree) * 3 DIV (count(1) * 4) AS BIGINT)").as("k")))
    val contrib = a.join(alive.select(col("id")), col("src") === col("id"))
      .select(explode(col("dsts")).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    val next = contrib
      .join(alive.select(col("id")), Seq("id"), "left_semi")
      .crossJoin(kdf).filter(col("degree") >= col("k"))
      .select(col("id"), col("degree"))
    val sp = next.queryExecution.executedPlan
    val live = sp.collect { case e: ShuffleExchangeExec => e }
    // every live exchange is either the 1-row threshold scalar
    // (SinglePartition, bounded by construction) or runs at the loop
    // width — and none carries the dsts array payload: the adjacency
    // never moves, only node-sized id/degree rows do
    val keyed = live.filterNot(_.outputPartitioning.numPartitions == 1)
    assert(keyed.nonEmpty && keyed.forall(_.outputPartitioning.numPartitions == w),
      s"round exchanges must be loop-width node-sized:\n$sp")
    assert(live.forall(e => !e.output.exists(_.name == "dsts")),
      s"adjacency payload must never ride a round exchange:\n$sp")
    a.unpersist(blocking = true)
    alive.unpersist(blocking = true)
  }

  test("loop-tuned PageRank round: one node-sized exchange, stationary adjacency") {
    import graft.operators.LoopCache
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // mirror fixedPointAdj's round construction on a staged-style
    // adjacency and pin the physical shape the loop relies on: the
    // cached operand is already hash(src, w)-partitioned AND sorted, so
    // a round's ONLY live exchange is the node-sized contribution
    // aggregate — the adjacency never moves and never re-sorts
    val adj = (1L to 2000L)
      .map(i => (i, 2L, Array(i % 97L + 1L, i % 89L + 2L)))
      .toDF("src", "outdeg", "dsts")
    val w = 4
    val a = LoopCache.tunedInputs(w, adj).head
      .repartition(w, col("src")).sortWithinPartitions("src")
      .persist()
    a.count()
    val r1 = a.withColumn("r", lit(1000L))
      .select(expr("(r * 85L) div (100L * outdeg)").as("c"),
        explode(col("dsts")).as("dst"))
      .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      .select(col("dst").as("id"), (lit(1L) + col("contrib")).as("r"))
    val round2 = a.join(r1, col("src") === col("id"), "left")
      .withColumn("r", coalesce(col("r"), lit(7L)))
      .select(expr("(r * 85L) div (100L * outdeg)").as("c"),
        explode(col("dsts")).as("dst"))
      .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
    val sp = round2.queryExecution.executedPlan
    // static plan (AQE off in the tuned session): exchanges are directly
    // collectible. Live exchanges = ENSURE_REQUIREMENTS agg exchanges at
    // the loop width, one per round; the REPARTITION_BY_NUM exchange
    // inside InMemoryRelation's cached build plan is one-time, not live.
    val live = sp.collect { case e: ShuffleExchangeExec => e }
    assert(live.size == 2, s"2 rounds must shuffle exactly twice:\n$sp")
    assert(live.forall(_.outputPartitioning.numPartitions == w),
      s"loop exchanges must run at the derived width $w:\n$sp")
    // the adjacency enters each round's join straight from the cache: no
    // Sort and no Exchange above its InMemoryTableScan. The join itself is
    // SMJ on real data (node-sized rank side exchanged nowhere, sorted
    // only) and BHJ here where the tiny rank side broadcasts statically —
    // both keep the stationary side stationary.
    def adjSide(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.SparkPlan] = p.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.left
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight
        => j.left
    }
    val side = adjSide(sp)
    assert(side.nonEmpty, s"expected a rank join:\n$sp")
    def cacheDirect(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.collectFirst {
        case _: org.apache.spark.sql.execution.SortExec => false
        case _: ShuffleExchangeExec => false
        case _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => true
      }.getOrElse(false)
    assert(cacheDirect(side.get),
      s"adjacency side must read the cache with no sort/exchange:\n${side.get}")
    a.unpersist(blocking = true)
  }

  test("LSH mega-bucket cap: R-way dup groups below the cap yield full pair " +
    "sets; above it they are dropped — and exactDedup-first recovers them") {
    // The q44 growth pin (VERDICT r13 #7), semantics half. The measured
    // half is graft.tools.BucketCensus + SCALE.md round 14: on the
    // UNIFORM replica corpus kept-candidate pairs grow LINEARLY per
    // decade (3.6k→36k→365k at sf0.1→sf1→sf10, max bucket < 2^3), so
    // the next decade is predicted linear. On the SKEWED corpus 100-way
    // duplicate groups load buckets to 2^5–2^7 — below the 200 cap, so
    // their quadratic-in-group pair volume is kept (15M pairs, 41×
    // uniform). The cap's contract has one honest boundary, pinned
    // here: an EXACT-duplicate group larger than the cap shares the
    // same bucket in EVERY band (identical signatures), so "found via
    // other, more selective bands" cannot apply and the group is lost
    // to LSH — which is why the pipeline capstones (q56/q112) run
    // exactDedup BEFORE the LSH pass.
    import graft.operators.Dedup
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    def corpus(groupSize: Int) =
      (0 until groupSize).map(i => (i.toLong, text))
        .toDF("doc_id", "text")
    val sigs30 = Dedup.minHashSignatures(corpus(30), "doc_id", "text")
    // group below the cap: every unordered pair surfaces exactly once
    val below = Dedup.lshCandidatePairs(sigs30, "doc_id",
      maxBucketSize = 200)
    assert(below.count() == 30L * 29 / 2)
    // same group above the cap: every band's bucket is the same 30 ids,
    // so ALL pairs vanish — the documented exact-dup boundary
    val above = Dedup.lshCandidatePairs(sigs30, "doc_id",
      maxBucketSize = 20)
    assert(above.count() == 0)
    // the capstone ordering closes it: exactDedup first leaves one
    // survivor per text, nothing for LSH to lose
    val survivors = Dedup.exactDedup(corpus(30), "doc_id", "text")
    assert(survivors.count() == 1)
  }

  test("budgetSelect: the global running sum never collapses to one task") {
    val docs = (1L to 5000L).map(i => (i, i % 97 + 1, i % 1000))
      .toDF("id", "n_tokens", "score")
    val sel = graft.operators.Sampling.budgetSelect(
      docs, "id", "n_tokens", "score", 1, 2, numRanges = 16)
    sel.count() // materialize so AQE finalizes the executed plan
    val plan = sel.queryExecution.executedPlan.toString
    // the contract is a GLOBAL prefix sum, but the plan must express it
    // as range-partitioned windows + broadcast base offsets — a bare
    // Window.orderBy would show up as a SinglePartition exchange, the
    // shape that funnels a 100 TB corpus through one task
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition stage leaked into budgetSelect:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"range base offsets were not broadcast:\n$plan")
    graft.operators.LoopCache.clearMemo(); spark.catalog.clearCache()
  }
}
