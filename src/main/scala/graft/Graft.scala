package graft

import org.apache.spark.sql.{Column, DataFrame}
import graft.operators._
import graft.functions._

/** One-stop facade over the engine's operator set — the entry point a
  * user migrating off the reference pipeline works against. Every method
  * delegates to the package that owns the implementation (and its specs);
  * nothing here adds behavior.
  *
  * {{{
  * import graft.Graft
  * val kpi      = Graft.kpi(bitacoraDf)                     // stage [3]
  * val report   = Graft.htmlReport(kpi, umbralP90 = 300)    // stage [4]
  * val sigs     = Graft.minHashSignatures(docs, "doc_id", "text")
  * val pairs    = Graft.lshCandidatePairs(sigs, "doc_id")
  * val clusters = Graft.dedupClusters(pairs, "id_a", "id_b")
  * val sample   = Graft.stratifiedSample(docs, "source", "doc_id", rates)
  * }}}
  */
object Graft {

  // --- the reference pipeline (stages [2]-[4]) ---
  def syntheticBitacora(spark: org.apache.spark.sql.SparkSession,
      n: Long, seed: Long): DataFrame =
    gen.SyntheticBitacora.generate(spark, n, seed)
  def kpi(bitacora: DataFrame, crossEngineExact: Boolean = false): DataFrame =
    ops.Kpi.bitacoraKpi(bitacora, crossEngineExact = crossEngineExact)
  def htmlReport(kpi: DataFrame, umbralP90: Double): String =
    report.Report.buildReport(kpi, umbralP90)

  // --- dedup ladder ---
  // (tuning knobs deliberately NOT restated here: each delegate uses its
  // operator's own defaults, so a tuned default can never silently drift
  // between the facade and the implementation — drop to the operator
  // object for the full parameter surface)
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.exactDedup(df, idCol, textCol)
  def exactDedupProjected(df: DataFrame, idCol: String, textCol: String,
      keep: Seq[String]): DataFrame =
    Dedup.exactDedupProjected(df, idCol, textCol, keep)
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.minHashSignatures(df, idCol, textCol)
  def lshCandidatePairs(signatures: DataFrame, idCol: String): DataFrame =
    Dedup.lshCandidatePairs(signatures, idCol)
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.simHash(df, idCol, textCol)
  def simHashNearDups(fp: DataFrame, idCol: String): DataFrame =
    Dedup.simHashNearDups(fp, idCol)
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      minJaccard: Double): DataFrame =
    Dedup.jaccardPairs(df, idCol, textCol, minJaccard)
  def dedupClusters(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame =
    ConnectedComponents.dedupClusters(pairs, srcCol, dstCol)

  // --- similarity search ---
  def knn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    Similarity.bruteForceKnn(corpus, queries, k)
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    Similarity.lshKnn(corpus, queries, k)
  def knnIvf(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame =
    Similarity.ivfKnn(corpus, queries, k)
  def cosineNearDups(corpus: DataFrame, minCosine: Double): DataFrame =
    Similarity.cosineNearDups(corpus, minCosine)
  def cosineNearDupsBanded(corpus: DataFrame, minCosine: Double): DataFrame =
    Similarity.cosineNearDupsBanded(corpus, minCosine)
  def crossCosineNearDups(left: DataFrame, right: DataFrame,
      minCosine: Double): DataFrame =
    Similarity.crossCosineNearDupsBanded(left, right, minCosine)
  def fuzzyMatches(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame =
    operators.FuzzyMatch.blockedPairs(df, idCol, textCol, maxDist = maxDist)
  def fuzzyMatchesMultiPass(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int): DataFrame =
    operators.FuzzyMatch.multiPassPairs(df, idCol, textCol, maxDist = maxDist)

  // --- text analysis ---
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame =
    operators.Repetition.metrics(df, idCol, textCol)
  def langId(c: Column): Column = TextFunctions.langId(c)
  def qualityMetrics(c: Column): Column = TextFunctions.qualityMetrics(c)
  def tokenCountWs(c: Column): Column = TextFunctions.tokenCountWs(c)
  def tokenCountBpe(c: Column): Column = TextFunctions.tokenCountBpe(c)
  def piiScrub(c: Column): Column = TextFunctions.piiScrub(c)
  def fingerprint(c: Column): Column = RollingHashExpression.rollingHash(c)

  // --- selection / sizing ---
  def sample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    Sampling.lehmerSample(df, keyCol, rate)
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Double]): DataFrame =
    Sampling.stratifiedLehmerSample(df, strataCol, keyCol, rates)
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[Column], k: Int): DataFrame =
    TopK.perGroup(df, groupCols, orderBy, k)
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    TfIdf.topTerms(df, idCol, textCol, k)
  def bloomSemiJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, expectedItems: Long): DataFrame =
    BloomJoin.bloomSemiJoin(left, right, leftKey, rightKey, expectedItems)

  // --- temporal / relational extensions ---
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCols: Seq[String],
      strict: Boolean = false): DataFrame =
    AsOfJoin.asOf(left, right, key, leftTime, rightTime, valueCols, strict)
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame =
    Sessionize.userSessionStats(events, userCol, tsCol, idCol, gapSeconds)
  def upsert(snapshot: DataFrame, updates: DataFrame, key: String,
      versionOrder: Seq[Column], setCols: Seq[String]): DataFrame =
    Upsert.applyLatest(snapshot, updates, key, versionOrder, setCols)

  // --- sequence-level corpus prep ---
  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, stride: Int): DataFrame =
    Chunking.tokenWindows(df, idCol, textCol, windowTokens, stride)
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      binTokens: Int): DataFrame =
    Chunking.packSequences(df, idCol, textCol, binTokens)
  def dupBlockStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Chunking.dupBlockStats(df, idCol, textCol)
  def decontaminate(train: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String): DataFrame =
    Decontaminate.overlapReport(train, eval_, idCol, textCol)
  def incrementalLshCandidatePairs(newSigs: DataFrame, oldSigs: DataFrame,
      idCol: String): DataFrame =
    Dedup.incrementalLshCandidatePairs(newSigs, oldSigs, idCol)
  def corpusDiff(prev: DataFrame, next: DataFrame,
      idCol: String, textCol: String): DataFrame =
    CorpusDiff.diff(prev, next, idCol, textCol)

  // --- embeddings / layout / stats utilities ---
  def quantizeInt8(df: DataFrame, embCol: String): DataFrame =
    Quantize.quantized(df, embCol)
  def decodeMedia(payloads: DataFrame, codec: String = "stub"): DataFrame =
    operators.Multimodal.decodeFeatures(payloads, codec = codec)
  def resizeMedia(payloads: DataFrame, maxW: Int, maxH: Int,
      codec: String = "stub"): DataFrame =
    operators.Multimodal.resizeTo(payloads, maxW, maxH, codec)
  def zorderWrite(df: DataFrame, path: String, dimA: String, dimB: String,
      numFiles: Int): Unit =
    ZOrder.zorderWrite(df, path, dimA, dimB, numFiles)
  def columnProfile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame =
    Profile.columnProfile(df, cols, approxDistinct)

  // --- graph & event-sequence analytics (exact integer numerics) ---

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5): DataFrame =
    PageRank.fixedPoint(edges, srcCol, dstCol, iterations)

  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iterations: Int = 5): DataFrame =
    PageRank.personalized(edges, srcCol, dstCol, seeds, seedCol, iterations)

  def communities(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 4): DataFrame =
    LabelPropagation.communities(edges, srcCol, dstCol, rounds)

  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, rounds: Int): DataFrame =
    Bfs.levels(edges, srcCol, dstCol, seeds, seedCol, rounds)

  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Long, rounds: Int): DataFrame =
    KCore.survivors(edges, srcCol, dstCol, k, rounds)

  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 3): DataFrame =
    Hits.scores(edges, srcCol, dstCol, rounds)

  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: DataFrame, seedCol: String,
      rounds: Int = 3): DataFrame =
    ShortestPath.distances(edges, srcCol, dstCol, weightCol, seeds,
      seedCol, rounds)

  def setSimilarityJoin(docs: DataFrame, idCol: String, tokensCol: String,
      tNum: Int, tDen: Int): DataFrame =
    PrefixJoin.selfJoin(docs, idCol, tokensCol, tNum, tDen)

  def triangleCounts(pairs: DataFrame, srcCol: String, dstCol: String,
      topKNeighbors: Int = 10): DataFrame =
    TriangleCensus.perNodeTriangles(
      TriangleCensus.topKNeighborEdges(pairs, srcCol, dstCol, topKNeighbors))

  def linkPredictions(pairs: DataFrame, srcCol: String, dstCol: String,
      topKNeighbors: Int = 10, topN: Int = 20): DataFrame =
    LinkPredict.topCommonNeighborPairs(
      TriangleCensus.topKNeighborEdges(pairs, srcCol, dstCol, topKNeighbors),
      topN)

  def funnel(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame =
    EventSeq.funnel(events, entityCol, tsCol, typeCol, stages)

  def kMeansInt8(df: DataFrame, idCol: String, codesCol: String,
      k: Int, iterations: Int): DataFrame =
    IntCluster.kmeans(df, idCol, codesCol, k, iterations)

  // --- mergeable distinct-count registers (engine-exact HLL state) ---

  def distinctRegisters(df: DataFrame, groupCols: Seq[String],
      keyCol: String): DataFrame =
    DistinctSketch.registers(df, groupCols, keyCol)

  def distinctSketchSummary(registers: DataFrame,
      groupCols: Seq[String]): DataFrame =
    DistinctSketch.summary(registers, groupCols)

  def distinctEstimate(regSum: Long, registersHit: Long): Double =
    DistinctSketch.estimate(regSum, registersHit)

  /** DSIR importance weights (per-doc hashed-n-gram LLR vs a target
    * slice); resample with [[dsirResample]]. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame =
    Dsir.importanceWeights(docs, idCol, textCol, isTarget, buckets)

  /** Gumbel top-k selection over [[dsirWeights]] output. */
  def dsirResample(weights: DataFrame, idCol: String, k: Int): DataFrame =
    Dsir.gumbelTopK(weights, idCol, k)

  /** UniMax water-filled token budget across sources. */
  def unimaxAllocations(perSource: DataFrame, srcCol: String, tokCol: String,
      epochCap: Int, budgetNum: Long, budgetDen: Long): DataFrame =
    UniMax.epochAllocations(perSource, srcCol, tokCol, epochCap,
      budgetNum, budgetDen)

  /** Top-k BPE merge candidates (adjacent char pairs by word frequency). */
  def bpeMergeCandidates(docs: DataFrame, textCol: String,
      k: Int = 50): DataFrame =
    Bpe.mergeCandidates(docs, textCol, k)

  /** Per-anchor hardest wrong-label neighbors (contrastive mining). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      labelCol: String = "label"): DataFrame =
    Similarity.hardNegatives(corpus, queries, k, idCol, embCol, labelCol)

  // --- exact quotas, privacy, uncertainty (round 16) ---

  /** Keep EXACTLY min(target, |stratum|) rows per stratum. */
  def exactQuotaSample(df: DataFrame, strataCol: String, keyCol: String,
      targets: DataFrame): DataFrame =
    Sampling.exactQuotaSample(df, strataCol, keyCol, targets)

  /** Quasi-identifier class sizes + a `suppressed` flag below k. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    Privacy.kAnonymity(df, quasiCols, k)

  /** Poisson-bootstrap replica means of an integer metric. */
  def bootstrapMeans(df: DataFrame, keyCol: String, groupCol: String,
      valueCol: String, replicas: Int = 32): DataFrame =
    Bootstrap.replicaMeans(df, keyCol, groupCol, valueCol, replicas)

  /** Percentile-method interval over [[bootstrapMeans]] output. */
  def bootstrapCi(means: DataFrame, groupCol: String): DataFrame =
    Bootstrap.percentileCi(means, groupCol)

  // --- media analysis across the modality triple (round 16) ---

  /** 16-bit perceptual hash over decoded feature vectors. */
  def imagePHash(features: DataFrame): DataFrame = Multimodal.aHash16(features)

  /** ALL image pairs within hamming 1 of each other's pHash. */
  def imageNearDups(hashed: DataFrame, idCol: String): DataFrame =
    Multimodal.phashNearDups16(hashed, idCol)

  /** Stub audio decode: (media_id, source, pos, amp) sample stream. */
  def audioWaveform(payloads: DataFrame): DataFrame =
    Multimodal.stubWaveform(payloads)

  /** Dead-air runs of ≥ minRun samples below the threshold. */
  def silenceRuns(samples: DataFrame, silenceBelow: Int,
      minRun: Int): DataFrame =
    Multimodal.silenceRuns(samples, silenceBelow, minRun)

  /** Scene segmentation: cut flags + prefix-sum scene ids. */
  def sceneCuts(samples: DataFrame, minDelta: Int): DataFrame =
    Multimodal.sceneCuts(samples, minDelta)

  // --- embeddings, joins, tokenizers, time (round 16) ---

  /** Johnson–Lindenstrauss ±1 projection of integer embedding codes. */
  def jlProject(df: DataFrame, codesCol: String, dIn: Int,
      dOut: Int): DataFrame =
    Projection.signProject(df, codesCol, dIn, dOut)

  /** d×w count-min counter sketch of a join key. */
  def joinKeySketch(df: DataFrame, keyCol: String, width: Int): DataFrame =
    JoinEstimate.sketch(df, keyCol, width)

  /** CM upper bound on |A ⋈ B| from two aligned sketches. */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame): DataFrame =
    JoinEstimate.joinSizeEstimate(skA, skB)

  /** Unbiased AMS self-join size estimate of a key column. */
  def selfJoinSizeEstimate(df: DataFrame, keyCol: String,
      width: Int = 4096): DataFrame =
    JoinEstimate.amsSelfJoinEstimate(JoinEstimate.amsSketch(df, keyCol, width))

  /** Top-k BPE merge candidates (tokenizer training, step 1). */
  def bpeMerges(docs: DataFrame, textCol: String, k: Int): DataFrame =
    Bpe.mergeCandidates(docs, textCol, k)

  /** Apply a mined merge list: the encode half of BPE. */
  def bpeApply(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame =
    Bpe.applyMerges(words, wordCol, merges)

  /** Per-day peak in-flight intervals (sweep line). */
  def dailyPeakConcurrency(intervals: DataFrame, startCol: String,
      endCol: String): DataFrame =
    SweepLine.dailyPeakConcurrency(intervals, startCol, endCol)

  /** Event-time lateness distribution for watermark sizing. */
  def latenessProfile(events: DataFrame, entityCol: String, tsCol: String,
      seqCols: Seq[String], bucketBoundsSec: Seq[Long]): DataFrame =
    EventSeq.latenessProfile(events, entityCol, tsCol, seqCols,
      bucketBoundsSec)

  /** Streaming distribution-drift monitor vs a static reference mix. */
  def driftMonitor(events: DataFrame, typeCol: String, tsCol: String,
      buckets: Seq[String], ref: DataFrame, windowLen: String = "1 day",
      watermark: String = "2 hours",
      thresholdPpm: Long = 200000L): DataFrame =
    streaming.StreamingOps.driftStream(events, typeCol, tsCol, buckets,
      ref, windowLen, watermark, thresholdPpm)

  /** Reference histogram for [[driftMonitor]]. */
  def typeHistogram(df: DataFrame, typeCol: String,
      buckets: Seq[String]): DataFrame =
    streaming.StreamingOps.typeHistogram(df, typeCol, buckets)

  // --- weighted draws, content-defined chunking (round 17) ---

  /** The k rows with the smallest (md5·10⁶ div weight) priority — a
    * fixed-size sample drawn proportional to a per-row weight. */
  def weightedBottomK(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame =
    Sampling.weightedBottomK(df, keyCol, weightCol, k)

  /** Content-defined chunks: cut after every md5-anchor token. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      divisor: Int = 16): DataFrame =
    Chunking.cdcChunks(df, idCol, textCol, divisor)

  /** Duplicated-chunk stats over [[cdcChunks]] (token-weighted ppm). */
  def cdcDupStats(df: DataFrame, idCol: String, textCol: String,
      divisor: Int = 16): DataFrame =
    Chunking.cdcDupStats(df, idCol, textCol, divisor)

  /** Near-dup pairs crossing a train/eval split boundary (leakage). */
  def splitLeakage(pairs: DataFrame, aCol: String, bCol: String,
      assignment: DataFrame, idCol: String, splitCol: String): DataFrame =
    Dedup.splitLeakage(pairs, aCol, bCol, assignment, idCol, splitCol)
}
