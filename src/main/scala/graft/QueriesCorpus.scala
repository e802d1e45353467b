package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Bm25, Bpe, Chunking, CorpusDiff, Decontaminate, Dedup, EventSeq, LoopCache, NgramLm, Overlap}

/** Corpus-preparation wave 2: the sequence-level operators between a
  * cleaned document corpus and model-ready training batches — train/eval
  * decontamination, repeated-block quality signals, context-window
  * chunking, and concat-and-split sequence packing. All DuckDB-oracled:
  * the shared tokenization is the same
  * `string_split(lower(trim(regexp_replace(text,'\s+',' '))), ' ')`
  * convention as q60's trigrams, so both engines see identical tokens.
  */
object QueriesCorpus {

  /** DuckDB CTE producing (doc_id, t = token list) for every document —
    * the cross-engine tokenization contract. */
  private val toksCte: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents
      |  WHERE length(trim(regexp_replace(text, '\s+', ' ', 'g'))) > 0)""".stripMargin

  // -------------------------------------------------------------------
  // q76 — train/eval decontamination: every 10th document plays the eval
  // benchmark; the report flags training docs sharing any word 8-gram
  // with it. Eval grams broadcast — the training side never shuffles
  // until the final per-doc agg.
  // -------------------------------------------------------------------
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame =
    // the overlap report is staged once per corpus (Tables.deconOverlap8)
    // — this query and the q112 capstone read the same verdict artifact
    Tables.deconOverlap8(spark, sfDir).orderBy(col("doc_id"))

  val decontaminateSql: String =
    s"""$toksCte,
      |grams AS (
      |  SELECT DISTINCT doc_id, gram FROM (
      |    SELECT doc_id,
      |           unnest(CASE WHEN len(t) >= 8
      |             THEN list_transform(range(1, len(t) - 8 + 2),
      |                                 i -> array_to_string(list_slice(t, i, i + 7), ' '))
      |             ELSE [array_to_string(t, ' ')] END) AS gram
      |    FROM toks)),
      |eval_grams AS (
      |  SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
      |hits AS (
      |  SELECT g.doc_id, count(*) AS n_overlap
      |  FROM grams g JOIN eval_grams e USING (gram)
      |  WHERE g.doc_id % 10 <> 0
      |  GROUP BY g.doc_id)
      |SELECT d.doc_id,
      |       coalesce(h.n_overlap, 0) AS n_overlap,
      |       coalesce(h.n_overlap, 0) > 0 AS contaminated
      |FROM documents d LEFT JOIN hits h USING (doc_id)
      |WHERE d.doc_id % 10 <> 0
      |ORDER BY d.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q77 — duplicated-block ratio (Gopher/C4 repeated-chunk signal):
  // 10-token blocks, corpus-wide block frequency, per-doc dup fraction.
  // -------------------------------------------------------------------
  def dupBlockRatio(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    Chunking.dupBlockStats(docs, "doc_id", "text", blockTokens = 10)
      .orderBy(col("doc_id"))
  }

  val dupBlockRatioSql: String =
    s"""$toksCte,
      |blocks AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(1, len(t) + 1, 10),
      |                i -> array_to_string(list_slice(t, i, i + 9), ' '))) AS block
      |  FROM toks),
      |freq AS (SELECT block, count(*) AS block_df FROM blocks GROUP BY block)
      |SELECT b.doc_id, count(*) AS n_blocks,
      |       count(*) FILTER (WHERE f.block_df > 1) AS n_dup_blocks,
      |       CAST(count(*) FILTER (WHERE f.block_df > 1) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS dup_ratio
      |FROM blocks b JOIN freq f USING (block)
      |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q78 — context-window chunking: 32-token windows, stride 16 (50%
  // overlap). Pure narrow explode — zero shuffles before the output sort.
  // -------------------------------------------------------------------
  def chunkWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    Chunking.tokenWindows(docs, "doc_id", "text",
        windowTokens = 32, stride = 16)
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val chunkWindowsSql: String =
    s"""$toksCte,
      |w AS (
      |  SELECT doc_id, t, unnest(range(1, len(t) + 1, 16)) AS s
      |  FROM toks)
      |SELECT doc_id,
      |       CAST((s - 1) // 16 AS INT) AS chunk_idx,
      |       CAST(least(32, len(t) - s + 1) AS INT) AS n_tokens,
      |       array_to_string(list_slice(t, s, s + 31), ' ') AS chunk_text
      |FROM w ORDER BY doc_id, chunk_idx""".stripMargin

  // -------------------------------------------------------------------
  // q79 — concat-and-split sequence packing: documents head-to-tail in
  // doc_id order, cut every 256 tokens. The running offset is the
  // two-level prefix sum (range subtotals broadcast as bases) — no
  // global single-task window anywhere in the plan.
  // -------------------------------------------------------------------
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    // rebalance like siblings q77/q78: the tokenize pass is the CPU hot
    // loop and a single-row-group local scan would pin it to one task
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    Chunking.packSequences(docs, "doc_id", "text", binTokens = 256)
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------------------------
  // q80 — domain reweighting: resample sources toward target weights
  // w_i ∝ (source index + 1). The weight is DERIVED from the source name
  // in both engines ((idx+1)/210 in one double division), so no literal
  // table can drift between them; the sample itself is the q45 Lehmer
  // draw against rate = min(1, w·N/n_s). The per-source report shows the
  // mix moving: before = uniform 5%, after ≈ proportional to idx+1.
  // -------------------------------------------------------------------
  def domainReweight(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, sfDir).select("doc_id", "source")
    // src0..src19 → w_i = (i+1)/210 (sums to 1 over the 20 sources);
    // single integer→double division, bit-identical to the oracle's
    val weights = (0 until 20)
      .map(i => s"src$i" -> ((i + 1).toDouble / 210.0)).toMap
    val rates = operators.Sampling.reweightRates(d, "source", weights)
    val after = operators.Sampling
      .domainReweightSample(d, "source", "doc_id", rates)
      .groupBy(col("source")).agg(count(lit(1)).as("n_after"))
    // achieved_share over the ≤|strata|-row report table: a global frame
    // is fine here — the frame is the RESULT, not data — but an EMPTY
    // partition spec fires WindowExec's "No Partition Defined" warning on
    // every run (alarm fatigue); partition on a non-foldable constant
    // (pmod(x, 1) = 0 for every non-null x; n_after is coalesced below)
    // so the intent is explicit and the log stays clean
    val wAll = Window.partitionBy(pmod(col("n_after"), lit(1)))
    rates.join(after, Seq("source"), "left")
      .select(col("source"), col("n_before"), col("rate"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .withColumn("achieved_share",
        col("n_after").cast("double") /
          sum(col("n_after")).over(wAll).cast("double"))
      .orderBy(col("source"))
  }

  val domainReweightSql: String =
    """WITH c AS (
      |  SELECT source, count(*) AS n_before FROM documents GROUP BY source),
      |n AS (SELECT count(*) AS n_total FROM documents),
      |r AS (
      |  SELECT source, n_before,
      |         least(1.0,
      |           (CAST(CAST(substr(source, 4) AS INT) + 1 AS DOUBLE) / 210.0)
      |             * CAST(n_total AS DOUBLE) / CAST(n_before AS DOUBLE)) AS rate
      |  FROM c CROSS JOIN n),
      |s AS (
      |  SELECT d.source, count(*) AS n_after
      |  FROM documents d JOIN r USING (source)
      |  WHERE CAST(((doc_id * 48271) % 2147483647) * 48271 % 2147483647 AS DOUBLE)
      |          / 2147483647.0 < r.rate
      |  GROUP BY d.source)
      |SELECT r.source, r.n_before, r.rate,
      |       coalesce(s.n_after, 0) AS n_after,
      |       CAST(coalesce(s.n_after, 0) AS DOUBLE)
      |         / CAST((SELECT sum(n_after) FROM s) AS DOUBLE) AS achieved_share
      |FROM r LEFT JOIN s USING (source)
      |ORDER BY r.source""".stripMargin

  // -------------------------------------------------------------------
  // q81 — incremental dedup verdict: every 5th document arrives as the
  // "new batch"; the rest are the historical corpus whose signatures are
  // already on disk. Candidates touch the batch only (new×old, new×new —
  // never old×old), so per-batch cost is O(batch + collisions); each
  // candidate is then VERIFIED with exact shingle jaccard (the screen →
  // verify production shape, q32's contract), so the verdict table is
  // SQL-expressible: a new doc is a duplicate iff some doc at exact
  // jaccard ≥ 0.8 is in history, or is an EARLIER (smaller-id) doc of
  // its own batch. The `keep` param carries the screen's vs_old flag
  // through verification — re-deriving it from the scored pairs would
  // recompute the whole screen.
  // -------------------------------------------------------------------
  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    // the signature table is the artifact an incremental dedup KEEPS
    // between batches (that is the whole point of the operator) — staged
    // per corpus; xxhash64-based, so the staged rows are deterministic
    val sigs = Tables.rebalance(
      operators.Staging.stagedOrDerive(spark, "minhash_sigs",
          Seq(Tables.path(sfDir, "documents"))) {
        Dedup.minHashSignatures(docs, "doc_id", "text")
      })
    // one-pass batch split (r19): the new/old sides partition ONE staged
    // table by an id rule, so tag rows in place instead of unioning two
    // filters of it — one scan, and the banding stages keep the table's
    // partition count instead of doubling it
    val newSigs = sigs.filter(col("doc_id") % 5 === 0)
    val cands = Dedup.incrementalLshCandidatePairsTagged(
      sigs.withColumn("is_new", col("doc_id") % 5 === 0), "doc_id", "is_new")
    val hits = Dedup
      .shingleJaccardOnCandidates(docs, "doc_id", "text", cands,
        minJaccard = 0.8, keep = Seq("vs_old"))
      // duplicate-vs: history always counts; within-batch only the later
      // (larger-id) member is the duplicate — id_a < id_b is canonical
      // for new×new pairs, id_a = the new side for new×old
      .select(when(col("vs_old"), col("id_a")).otherwise(col("id_b")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_matches"))
    newSigs.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dup_matches"), lit(0L)).as("n_dup_matches"))
      .withColumn("is_dup", col("n_dup_matches") > 0)
      .orderBy(col("doc_id"))
  }

  val incrementalDedupSql: String =
    s"""WITH ${QueriesText.shingleJaccardCte},
      |p AS (SELECT id_a, id_b FROM jp WHERE jaccard >= 0.8),
      |e AS (SELECT id_a AS n, id_b AS m FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |hits AS (
      |  SELECT n AS doc_id, count(*) AS n_dup_matches FROM e
      |  WHERE n % 5 = 0 AND (m % 5 <> 0 OR m < n)
      |  GROUP BY n)
      |SELECT d.doc_id,
      |       CAST(coalesce(h.n_dup_matches, 0) AS BIGINT) AS n_dup_matches,
      |       coalesce(h.n_dup_matches, 0) > 0 AS is_dup
      |FROM documents d LEFT JOIN hits h USING (doc_id)
      |WHERE d.doc_id % 5 = 0 ORDER BY d.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q82 — corpus snapshot diff: next = current corpus minus every 7th
  // doc (removed), with every 11th surviving doc's text revised
  // (changed) and five synthetic documents appended (added). The diff
  // joins 16-byte digests, never bodies; the summary is one row per
  // status. Fully oracle-checked — both engines md5 the same UTF-8.
  // -------------------------------------------------------------------
  def corpusDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).select("doc_id", "text")
    val next = d.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(d.filter(col("doc_id") < 5)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("new doc "), col("doc_id").cast("string")).as("text")))
    CorpusDiff.diffSummary(d, next, "doc_id", "text")
      .orderBy(col("status"))
  }

  val corpusDiffSql: String =
    """WITH p AS (SELECT doc_id, md5(text) AS dp FROM documents),
      |nx AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 100000, 'new doc ' || CAST(doc_id AS VARCHAR)
      |  FROM documents WHERE doc_id < 5),
      |n2 AS (SELECT doc_id, md5(text) AS dn FROM nx),
      |j AS (
      |  SELECT coalesce(p.doc_id, n2.doc_id) AS doc_id,
      |         CASE WHEN dp IS NULL THEN 'added'
      |              WHEN dn IS NULL THEN 'removed'
      |              WHEN dp = dn THEN 'unchanged'
      |              ELSE 'changed' END AS status
      |  FROM p FULL OUTER JOIN n2 USING (doc_id))
      |SELECT status, count(*) AS n_docs,
      |       min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM j GROUP BY status ORDER BY status""".stripMargin

  // -------------------------------------------------------------------
  // q85 — time-series gap fill: the event stream resampled onto a dense
  // per-type hourly grid (absent buckets surface as explicit gap rows —
  // the reference's KPI CSV silently omits them), with last-observation-
  // carried-forward sums. Grid is generated, never shuffled; the LOCF
  // window partitions by event type.
  // -------------------------------------------------------------------
  def gapFillHourly(spark: SparkSession, sfDir: String): DataFrame =
    operators.Resample
      .hourlyGapFill(Tables.events(spark, sfDir), "event_type", "ts", "value")
      .select(col("event_type"),
        unix_timestamp(col("h")).as("hour_epoch"),
        col("n_events"), col("is_gap"), col("sum_value"), col("filled_sum"))
      .orderBy(col("event_type"), col("hour_epoch"))

  val gapFillHourlySql: String =
    """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      |h AS (
      |  SELECT date_trunc('hour', ts) AS h, event_type,
      |         count(*) AS n_events,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |  FROM ev GROUP BY 1, 2),
      |span AS (SELECT date_trunc('hour', min(ts)) AS h0,
      |                date_trunc('hour', max(ts)) AS h1 FROM ev),
      |grid AS (
      |  SELECT t.event_type, unnest(generate_series(s.h0, s.h1, INTERVAL 1 HOUR)) AS h
      |  FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN span s),
      |j AS (
      |  SELECT g.event_type, g.h, h.n_events, h.sum_value
      |  FROM grid g LEFT JOIN h ON g.event_type = h.event_type AND g.h = h.h)
      |SELECT event_type, CAST(epoch(h) AS BIGINT) AS hour_epoch,
      |       coalesce(n_events, 0) AS n_events,
      |       n_events IS NULL AS is_gap,
      |       sum_value,
      |       last_value(sum_value IGNORE NULLS) OVER (
      |         PARTITION BY event_type ORDER BY h
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
      |FROM j ORDER BY event_type, hour_epoch""".stripMargin

  // -------------------------------------------------------------------
  // q86 — SCD-2 state history: each user's event-type stream collapsed
  // into validity episodes (valid_from/valid_to, open-ended = current).
  // One shuffle on the user key; (ts, event_id) is the deterministic
  // per-key total order both engines sort by.
  // -------------------------------------------------------------------
  def scd2History(spark: SparkSession, sfDir: String): DataFrame =
    operators.Upsert
      .scd2History(Tables.events(spark, sfDir),
        "user_id", "event_type", "ts", "event_id")
      // microsecond epochs: raw event times carry sub-second parts, and
      // second-grain casts round differently across engines (DuckDB
      // rounds double→int, Spark floors) — micros are integer-exact
      .select(col("user_id"), col("event_type"),
        unix_micros(col("valid_from")).as("valid_from"),
        unix_micros(col("valid_to")).as("valid_to"),
        col("is_current"))
      // valid_to (nulls last, stated explicitly — Spark defaults nulls
      // FIRST asc, DuckDB nulls LAST) completes the total order: two
      // episodes of the same (user, type) can share a valid_from when
      // events carry identical timestamps
      .orderBy(col("user_id"), col("valid_from"), col("event_type"),
        col("valid_to").asc_nulls_last)

  val scd2HistorySql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
      |  FROM events),
      |c AS (
      |  SELECT *, lag(event_type) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM ev),
      |ch AS (
      |  SELECT user_id, event_type, ts, event_id FROM c
      |  WHERE event_type IS DISTINCT FROM prev),
      |h AS (
      |  SELECT user_id, event_type, ts AS vf,
      |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
      |  FROM ch)
      |SELECT user_id, event_type,
      |       epoch_us(vf) AS valid_from,
      |       epoch_us(vt) AS valid_to,
      |       vt IS NULL AS is_current
      |FROM h ORDER BY user_id, valid_from, event_type,
      |              valid_to NULLS LAST""".stripMargin

  // -------------------------------------------------------------------
  // q84 — semantic-dedup capstone, FULLY oracle-checked: banded-LSH
  // screen → exact-cosine verified near-dup pairs (q42's planted corpus
  // and threshold) → transitive closure → cluster table. DuckDB computes
  // the same clusters with a recursive-CTE transitive closure over the
  // EXACT all-pairs threshold join and takes min-reachable-id as the
  // representative — so the oracle checks the screen's recall end to
  // end: a candidate the banded screen dropped would under-merge a
  // cluster and hash-mismatch. (q44 remains rows-only because its PAIRS
  // come from xxhash LSH buckets; here the pairs themselves are
  // oracle-expressible.)
  // -------------------------------------------------------------------
  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // Screen → verify, NOT the O(n²) cross join: candidates meet only in
    // shared hyperplane-band buckets (4 OR'd bands of 12 planes — exact
    // duplicates collide in every band with certainty, and band 0 is
    // bit-identical to q42's oracle-green single-band screen, so the
    // candidate set strictly contains a screen already proven complete
    // on this corpus), then every candidate is exact-cosine verified.
    // The oracle's recursive closure over the exact all-pairs join keeps
    // the completeness claim HONEST: any recall loss surfaces as a hash
    // mismatch, not a silent under-merge.
    // the verified pair table is staged per corpus — the same
    // pipeline-handoff artifact as q32's minhash pairs (SemDeDup
    // materializes exactly this table between its screen and its merge)
    val pairs = operators.Staging.stagedOrDerive(spark, "semantic_pairs_c99",
        Seq(Tables.path(sfDir, "embeddings"))) {
      operators.Similarity.cosineNearDupsBanded(
        QueriesText.plantedEmbeddingCorpus(spark, sfDir), minCosine = 0.99)
    }.select(col("id_a"), col("id_b"))
    operators.ConnectedComponents.dedupClusters(pairs, "id_a", "id_b")
      .groupBy(col("representative"))
      .agg(count(lit(1)).as("cluster_size"),
        max(col("id")).as("max_member"))
      .orderBy(col("representative"))
  }

  val semanticDedupSql: String =
    s"""WITH ${QueriesText.plantedEmbeddingCorpusCte},
      |p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM c a, c b
      |  WHERE a.vec_id < b.vec_id
      |    AND list_cosine_similarity(a.emb, b.emb) >= 0.99),
      |e AS (SELECT id_a AS a, id_b AS b FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |closure AS (
      |  WITH RECURSIVE reach(src, dst) AS (
      |    SELECT a, b FROM e
      |    UNION
      |    SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a)
      |  SELECT * FROM reach),
      |lab AS (
      |  SELECT src AS id, least(src, min(dst)) AS representative
      |  FROM closure GROUP BY src)
      |SELECT representative,
      |       count(*) AS cluster_size,
      |       max(id) AS max_member
      |FROM lab GROUP BY representative ORDER BY representative""".stripMargin

  // -------------------------------------------------------------------
  // q83 — curriculum binning: exact global token-count deciles (one
  // 8-bytes-per-row stats agg), cutpoints broadcast back, every document
  // classified map-side — the corpus never shuffles on its way to a bin.
  // decile d = 1 + #cutpoints strictly below the doc's token count, so
  // ties land in the lower bin in both engines. Spark's exact
  // `percentile` interpolates exactly like DuckDB's quantile_cont (the
  // q01/q57-verified (n−1)·p rule); at 100 TB swap the cutpoint agg to
  // `percentile_approx` (the q53 pattern) — the classify side is
  // unchanged.
  // -------------------------------------------------------------------
  def qualityDeciles(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.rebalance(
        Tables.documents(spark, sfDir).select("doc_id", "text"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCountWs(col("text")).as("n_tokens"))
    val cuts = d.agg(
      percentile(col("n_tokens"),
        array((1 to 9).map(i => lit(i / 10.0)): _*)).as("cuts"))
    d.crossJoin(broadcast(cuts))
      .withColumn("decile",
        (lit(1) + aggregate(col("cuts"), lit(0), (acc, c) =>
          acc + when(col("n_tokens").cast("double") > c, 1).otherwise(0)))
          .cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy(col("decile"))
  }

  val qualityDecilesSql: String = {
    val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    val ntok = s"CASE WHEN length($norm) = 0 THEN 0 " +
      s"ELSE CAST(len(string_split($norm, ' ')) AS INT) END"
    s"""WITH t AS (SELECT doc_id, $ntok AS n_tokens FROM documents),
      |c0 AS (SELECT ${OracleSql.sortedListSql("n_tokens")} AS lv FROM t),
      |c AS (SELECT ${OracleSql.percentileListSql("lv",
               (1 to 9).map(i => s"0.$i"))} AS cuts FROM c0),
      |b AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(1 + len(list_filter(cuts,
      |           x -> CAST(n_tokens AS DOUBLE) > x)) AS INT) AS decile
      |  FROM t CROSS JOIN c)
      |SELECT decile, count(*) AS n_docs,
      |       min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
      |FROM b GROUP BY decile ORDER BY decile""".stripMargin
  }

  // Every derived column is CAST back to BIGINT: DuckDB's windowed
  // sum(BIGINT) escapes to HUGEINT and // propagates it, while the Spark
  // side emits LongType — the driver's hash compare is type-sensitive
  // (same fix class as q61's epoch() DOUBLE).
  val packSequencesSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         CAST(CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
      |              ELSE len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
      |              END AS BIGINT) AS n_tokens
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
      |  FROM d)
      |SELECT doc_id, n_tokens, start_offset,
      |       CAST(start_offset // 256 AS BIGINT) AS first_bin,
      |       CAST((start_offset + greatest(n_tokens, 1) - 1) // 256 AS BIGINT) AS last_bin,
      |       CAST(((start_offset + greatest(n_tokens, 1) - 1) // 256)
      |         - (start_offset // 256) + 1 AS BIGINT) AS n_bins
      |FROM s ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q87 — boilerplate block scrub (the C4 "remove repeated boilerplate"
  // step at 10-token-block granularity): blocks in > 3 documents are
  // dropped and each document is reassembled from its survivors.
  // -------------------------------------------------------------------
  def boilerplateScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    Chunking.boilerplateScrub(docs, "doc_id", "text",
        blockTokens = 10, maxDocFreq = 3)
      .orderBy(col("doc_id"))
  }

  val boilerplateScrubSql: String =
    s"""$toksCte,
      |blocks AS (
      |  SELECT doc_id, u.i AS start,
      |         array_to_string(list_slice(t, u.i, u.i + 9), ' ') AS block
      |  FROM toks, UNNEST(range(1, len(t) + 1, 10)) AS u(i)),
      |rm AS (
      |  SELECT block FROM blocks GROUP BY block
      |  HAVING count(DISTINCT doc_id) > 3)
      |SELECT b.doc_id, count(*) AS n_blocks,
      |       count(*) FILTER (WHERE r.block IS NOT NULL) AS n_removed,
      |       coalesce(string_agg(b.block, ' ' ORDER BY b.start)
      |                  FILTER (WHERE r.block IS NULL), '') AS cleaned_text
      |FROM blocks b LEFT JOIN rm r ON b.block = r.block
      |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q88 — unigram-LM surprisal scoring (the KenLM-style perplexity-filter
  // shape): each document's mean -ln p(token) under the corpus's own
  // unigram distribution, NLLs staged through DECIMAL(18,6) so the
  // cross-row sum is order-independent (q03/q50 determinism rule).
  // -------------------------------------------------------------------
  def unigramSurprisal(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    NgramLm.unigramScores(docs, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  val unigramSurprisalSql: String =
    s"""$toksCte,
      |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
      |counts AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
      |total AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM counts),
      |model AS (
      |  SELECT tok,
      |         CAST(-ln(CAST(c AS DOUBLE) / (SELECT n FROM total))
      |              AS DECIMAL(18,6)) AS nll
      |  FROM counts)
      |SELECT t.doc_id, count(*) AS n_tokens,
      |       CAST(sum(m.nll) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_nll
      |FROM tok t JOIN model m USING (tok)
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q90 — cross-source contamination matrix: distinct 10-token blocks
  // shared by each pair of sources (what a data-mixing owner checks
  // before assigning mixture weights).
  // -------------------------------------------------------------------
  def sourceOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("source", "text"))
    Overlap.sharedBlockMatrix(docs, "source", "text", blockTokens = 10)
      .orderBy(col("n_shared_blocks").desc, col("source_a"), col("source_b"))
  }

  val sourceOverlapSql: String =
    """WITH s AS (
      |  SELECT source,
      |         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents
      |  WHERE length(trim(regexp_replace(text, '\s+', ' ', 'g'))) > 0),
      |b AS (
      |  SELECT DISTINCT source,
      |         array_to_string(list_slice(t, u.i, u.i + 9), ' ') AS block
      |  FROM s, UNNEST(range(1, len(t) + 1, 10)) AS u(i)),
      |p AS (
      |  SELECT a.source AS source_a, c.source AS source_b
      |  FROM b a JOIN b c USING (block)
      |  WHERE a.source < c.source)
      |SELECT source_a, source_b, count(*) AS n_shared_blocks
      |FROM p GROUP BY source_a, source_b
      |ORDER BY n_shared_blocks DESC, source_a, source_b""".stripMargin

  // -------------------------------------------------------------------
  // q91 — bigram-LM surprisal with stupid backoff (the step up from
  // q88's unigrams): -ln p(tok|prev) with p = c2/c1(prev) on a bigram
  // hit, alpha*c1(tok)/N on backoff, unigram for each document's first
  // token. Same DECIMAL(18,6) NLL staging.
  // -------------------------------------------------------------------
  def bigramSurprisal(spark: SparkSession, sfDir: String): DataFrame = {
    val docsPath = Tables.path(sfDir, "documents")
    def docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    // the fitted LM (unigram + bigram count tables) is STAGED once per
    // corpus — a trained model is the offline artifact of a perplexity
    // filter; the per-call plan only tokenizes for SCORING
    val uni = operators.Staging.stagedOrDerive(spark, "bigram_lm_uni",
        Seq(docsPath)) {
      NgramLm.uniCountTable(docs, "doc_id", "text")
    }
    val bi = operators.Staging.stagedOrDerive(spark, "bigram_lm_bi",
        Seq(docsPath)) {
      NgramLm.biCountTable(docs, "doc_id", "text")
    }
    val n = operators.LoopCache.pinnedRow(
      uni.agg(sum(col("c1")))).getLong(0)
    NgramLm.bigramScoresWithModel(docs, "doc_id", "text",
        NgramLm.BigramModel(uni, bi, n), alpha = 0.4)
      .orderBy(col("doc_id"))
  }

  val bigramSurprisalSql: String =
    s"""$toksCte,
      |uni AS (SELECT unnest(t) AS tok FROM toks),
      |c1 AS (SELECT tok, count(*) AS c1 FROM uni GROUP BY tok),
      |total AS (SELECT CAST(sum(c1) AS DOUBLE) AS n FROM c1),
      |bg AS (
      |  SELECT doc_id, t[u.i] AS prev, t[u.i + 1] AS tok
      |  FROM toks, UNNEST(range(1, len(t))) AS u(i)),
      |c2 AS (SELECT prev, tok, count(*) AS c2 FROM bg GROUP BY prev, tok),
      |interior AS (
      |  SELECT b.doc_id,
      |         CAST(CASE WHEN c2.c2 IS NOT NULL
      |              THEN -ln(CAST(c2.c2 AS DOUBLE) / CAST(p1.c1 AS DOUBLE))
      |              ELSE -ln(0.4 * (CAST(t1.c1 AS DOUBLE) / (SELECT n FROM total)))
      |              END AS DECIMAL(18,6)) AS nll
      |  FROM bg b
      |  LEFT JOIN c2 ON b.prev = c2.prev AND b.tok = c2.tok
      |  JOIN c1 p1 ON b.prev = p1.tok
      |  JOIN c1 t1 ON b.tok = t1.tok),
      |firsts AS (
      |  SELECT f.doc_id,
      |         CAST(-ln(CAST(c1.c1 AS DOUBLE) / (SELECT n FROM total))
      |              AS DECIMAL(18,6)) AS nll
      |  FROM (SELECT doc_id, t[1] AS tok FROM toks) f JOIN c1 USING (tok)),
      |allpos AS (SELECT * FROM interior UNION ALL SELECT * FROM firsts)
      |SELECT doc_id, count(*) AS n_tokens,
      |       CAST(sum(nll) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_nll
      |FROM allpos GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q92 — BM25 top-k retrieval: every ~97th document's first 8 tokens
  // play the query set (deterministic, corpus-derived); Okapi BM25 with
  // the Lucene +1 idf floor, k1=1.2, b=0.75, top-5 per query.
  // -------------------------------------------------------------------
  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame = {
    val docsPath = Tables.path(sfDir, "documents")
    def docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    // the inverted index + its stats row are STAGED once per corpus
    // (VERDICT r11 #6): a cold call probes the index — it never
    // re-tokenizes the corpus. Identical arithmetic (Bm25.topKFromIndex),
    // so scores are bit-identical to the derive-per-call path.
    // the index is staged TOKEN-SORTED (range-partitioned + sorted) so
    // the per-call vocabulary IN filter prunes parquet row groups via
    // min/max stats — an index SEEK, not a full-index scan per retrieval
    // call (see Bm25.topKFromIndex)
    val n = spark.sparkContext.defaultParallelism
    val index = graft.operators.Staging.stagedOrDerive(spark,
        s"bm25_postings_bytok_p$n", Seq(docsPath)) {
      Bm25.postingsIndex(docs, "doc_id", "text")
        .repartitionByRange(n, col("tok")).sortWithinPartitions("tok")
    }
    // per-token df staged WITH the index (the offline IDF table): the
    // per-call plan is one pass over the vocabulary slice — no per-call
    // slice pin, no per-call df aggregate
    val dfTable = graft.operators.Staging.stagedOrDerive(spark,
        "bm25_df_bytok", Seq(docsPath)) {
      Bm25.docFrequencies(index).sort(col("tok"))
    }
    val stats = graft.operators.LoopCache.pinnedRow(
      graft.operators.Staging.stagedOrDerive(spark, "bm25_stats",
          Seq(docsPath)) {
        Bm25.corpusStats(docs, "doc_id", "text")
      })
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val queries = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 97 === 0)
      .filter(length(trim(regexp_replace(col("text"), "\\s+", " "))) > 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(split(norm, " "), 1, 8)).as("qtext"))
    Bm25.topKFromIndex(index, dfTable, stats.getLong(0), stats.getLong(1),
        queries, "qid", "qtext", k = 5)
      .orderBy(col("qid"), col("rank"))
  }

  val bm25TopKSql: String =
    s"""$toksCte,
      |stats AS (
      |  SELECT count(*) AS n_docs,
      |         CAST(sum(len(t)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      |  FROM toks),
      |q AS (SELECT doc_id AS qid, list_slice(t, 1, 8) AS qt
      |      FROM toks WHERE doc_id % 97 = 0),
      |qterms AS (SELECT DISTINCT qid, unnest(qt) AS tok FROM q),
      |qvocab AS (SELECT DISTINCT tok FROM qterms),
      |post AS (SELECT doc_id AS doc, len(t) AS dl, unnest(t) AS tok FROM toks),
      |postq AS (SELECT p.doc, p.dl, p.tok FROM post p JOIN qvocab v USING (tok)),
      |tf AS (SELECT doc, tok, count(*) AS tf, min(dl) AS dl
      |       FROM postq GROUP BY doc, tok),
      |dfs AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      |partial AS (
      |  SELECT qt.qid, tf.doc,
      |         CAST(
      |           ln(1.0 + (CAST((SELECT n_docs FROM stats) AS DOUBLE)
      |                       - CAST(df AS DOUBLE) + 0.5)
      |                    / (CAST(df AS DOUBLE) + 0.5))
      |           * (CAST(tf AS DOUBLE) * 2.2
      |              / (CAST(tf AS DOUBLE)
      |                 + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
      |                                 / (SELECT avgdl FROM stats))))
      |         AS DECIMAL(18,6)) AS s
      |  FROM tf JOIN dfs USING (tok) JOIN qterms qt USING (tok)),
      |scored AS (SELECT qid, doc, CAST(sum(s) AS DOUBLE) AS score
      |           FROM partial GROUP BY qid, doc),
      |r AS (SELECT qid, doc, score,
      |             row_number() OVER (PARTITION BY qid
      |                                ORDER BY score DESC, doc) AS rank
      |      FROM scored)
      |SELECT qid, rank, doc, score FROM r WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  // -------------------------------------------------------------------
  // q100 — duplicated-SPAN report (operators/DupSpans): sliding 8-token
  // windows, corpus-wide counts, longest consecutive duplicated run per
  // document — the window approximation of suffix-array substring dedup
  // (a run of R dup windows ≡ a duplicated span of R+7 tokens).
  // -------------------------------------------------------------------
  def dupSpans(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    // hashed=false: the gate tier groups RAW window text — byte-for-byte
    // the oracle's own key, collision-free by construction (no hash on
    // the gate at all); the hashed scale tier stays covered by the
    // hashed≡string spec
    operators.DupSpans.report(docs, "doc_id", "text", windowTokens = 8,
        hashed = false)
      .orderBy(col("doc_id"))
  }

  val dupSpansSql: String =
    s"""$toksCte,
      |tk AS (SELECT doc_id, t, len(t) AS n_tokens FROM toks),
      |g AS (
      |  SELECT doc_id, n_tokens,
      |         CASE WHEN n_tokens >= 8
      |           THEN list_transform(range(1, n_tokens - 8 + 2),
      |                               i -> array_to_string(list_slice(t, i, i + 7), ' '))
      |           ELSE [array_to_string(t, ' ')] END AS grams
      |  FROM tk),
      |wdw AS (
      |  SELECT doc_id, n_tokens,
      |         unnest(range(0, len(grams))) AS widx,
      |         unnest(grams) AS digest
      |  FROM g),
      |cnt AS (SELECT digest, count(*) AS c FROM wdw GROUP BY digest),
      |fl AS (
      |  SELECT w.doc_id, w.n_tokens, w.widx, c.c > 1 AS dup
      |  FROM wdw w JOIN cnt c USING (digest)),
      |runs AS (
      |  SELECT doc_id,
      |         widx - row_number() OVER (PARTITION BY doc_id
      |                                   ORDER BY widx) AS island
      |  FROM fl WHERE dup),
      |mr AS (
      |  SELECT doc_id, CAST(max(rl) AS BIGINT) AS max_run
      |  FROM (SELECT doc_id, island, count(*) AS rl
      |        FROM runs GROUP BY doc_id, island)
      |  GROUP BY doc_id),
      |pd AS (
      |  SELECT doc_id, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
      |         count(*) AS n_windows,
      |         count(*) FILTER (WHERE dup) AS n_dup_windows
      |  FROM fl GROUP BY doc_id)
      |SELECT p.doc_id, p.n_tokens, p.n_windows, p.n_dup_windows,
      |       CASE WHEN m.max_run IS NULL THEN 0
      |            ELSE least(p.n_tokens, m.max_run + 7) END AS max_dup_span_tokens
      |FROM pd p LEFT JOIN mr m USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin

  // -------------------------------------------------------------------
  // q108 — source-level similarity via MERGED MinHash sketches
  // (operators/SketchMerge): the union-signature property gives each
  // source a corpus-level signature from one partial-aggregable min —
  // then the slot-agreement estimate is audited against the EXACT
  // per-source shingle-set jaccard (the oracle-expressible tier). The
  // output carries the exact numbers plus a sketch-within-tolerance
  // boolean (q46's self-validating pattern: ±0.25 ≈ 4σ at numPerm=64).
  // -------------------------------------------------------------------
  def sourceSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    val docsPath = Tables.path(sfDir, "documents")
    def d = Tables.rebalance(
      Tables.documents(spark, sfDir).select("source", "text"))
    // both per-source corpus digests are STAGED artifacts (|sources|
    // merged sketches; the distinct source-shingle postings): a cold
    // call joins them instead of re-shingling the corpus twice
    val mergedSigs = operators.Staging.stagedOrDerive(spark,
        "source_merged_sigs", Seq(docsPath)) {
      operators.SketchMerge.mergedSignatures(
        Dedup.minHashSignatures(d, "source", "text"), "source", "sig")
    }
    val est = operators.SketchMerge.pairwiseEstimates(
      mergedSigs, "source", "sig")
    val sh = Tables.rebalance(operators.Staging.stagedOrDerive(spark,
        "source_shingles", Seq(docsPath)) {
      Dedup.shingles(d, "source", "text", n = 3, dedup = true)
        .toDF("source", "shingle")
    })
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    val pairs = sizes.as("x").join(sizes.as("y"),
        col("x.source") < col("y.source"))
      .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
        col("x.sz").as("sza"), col("y.sz").as("szb"))
    pairs.join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        (col("sza") + col("szb") - coalesce(col("n_inter"), lit(0L)))
          .as("n_union"))
      .withColumn("exact_jaccard",
        col("n_inter").cast("double") / col("n_union").cast("double"))
      .join(est.withColumnRenamed("grp_a", "src_a")
        .withColumnRenamed("grp_b", "src_b"), Seq("src_a", "src_b"))
      .withColumn("sketch_within_tol",
        abs(col("n_agree").cast("double") / col("n_slots").cast("double")
          - col("exact_jaccard")) <= 0.25)
      .select(col("src_a"), col("src_b"), col("n_inter"), col("n_union"),
        col("exact_jaccard"), col("sketch_within_tol"))
      .orderBy(col("src_a"), col("src_b"))
      // pin the per-pair result, release the shingle anchor
      .transform(operators.LoopCache.finish(_, sh))
  }

  val sourceSimilaritySql: String =
    """WITH tt AS (
      |  SELECT source,
      |         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT source,
      |         unnest(CASE WHEN len(t) >= 3
      |           THEN list_transform(range(1, len(t) - 3 + 2),
      |                               i -> array_to_string(list_slice(t, i, i + 2), ' '))
      |           ELSE [array_to_string(t, ' ')] END) AS shingle
      |  FROM tt),
      |sz AS (SELECT source, count(*) AS sz FROM sh GROUP BY source),
      |it AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
      |  GROUP BY 1, 2),
      |pr AS (
      |  SELECT x.source AS src_a, y.source AS src_b, x.sz AS sza, y.sz AS szb
      |  FROM sz x JOIN sz y ON x.source < y.source)
      |SELECT pr.src_a, pr.src_b,
      |       coalesce(it.n_inter, 0) AS n_inter,
      |       pr.sza + pr.szb - coalesce(it.n_inter, 0) AS n_union,
      |       CAST(coalesce(it.n_inter, 0) AS DOUBLE)
      |         / CAST(pr.sza + pr.szb - coalesce(it.n_inter, 0) AS DOUBLE)
      |         AS exact_jaccard,
      |       TRUE AS sketch_within_tol
      |FROM pr LEFT JOIN it USING (src_a, src_b)
      |ORDER BY src_a, src_b""".stripMargin

  // -------------------------------------------------------------------
  // q112 — corpus-prep capstone v2: the wave operators COMPOSED as one
  // plan — eval-split decontamination (q76) → exact dedup (q30) →
  // √-temperature mixing (q99) → sequence packing (q79) — reported as a
  // stage funnel (docs, tokens, bins per stage). The integration proof
  // that the pieces chain: every stage count is oracle-replayed by the
  // composed DuckDB CTEs.
  // -------------------------------------------------------------------
  def corpusPrep2(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // token counts ride as a COLUMN computed once at the scan: the funnel
    // sums them at four stages, and each stage re-tokenizing its cached
    // text was four extra regex passes over the corpus per cold call
    val ntok = col("ntok")
    val docs = Tables.rebalance(
        Tables.documents(spark, sfDir).select("doc_id", "source", "text"))
      .withColumn("ntok", graft.functions.TextFunctions
        .tokenCountWs(col("text")).cast("long"))
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val contaminated = Tables.deconOverlap8(spark, sfDir)
      .filter(col("contaminated")).select("doc_id")
    val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
      .persist(MEMORY_AND_DISK)
    val deduped = Dedup.exactDedup(clean, "doc_id", "text")
      .persist(MEMORY_AND_DISK)
    val targets = operators.Sampling
      .sqrtTemperatureTargets(deduped.select("doc_id", "source"), "source")
    val mixed = deduped
      .join(operators.Sampling.temperatureMixSample(
        deduped.select("doc_id", "source"), "source", "doc_id", targets)
        .select("doc_id"), Seq("doc_id"))
      .persist(MEMORY_AND_DISK)
    val packed = Chunking.packSequences(
      mixed.select(col("doc_id"), col("text")), "doc_id", "text", 256)
    def stat(df: DataFrame, idx: Int, name: String) =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(ntok), lit(0L)).as("n_tokens"))
        .select(lit(idx).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"), lit(0L).as("n_bins"))
    stat(train, 0, "input_train")
      .unionByName(stat(clean, 1, "decontaminated"))
      .unionByName(stat(deduped, 2, "deduped"))
      .unionByName(stat(mixed, 3, "mixed"))
      .unionByName(packed
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
          coalesce(max(col("last_bin")) + 1, lit(0L)).as("n_bins"))
        .select(lit(4).as("stage_idx"), lit("packed").as("stage"),
          col("n_docs"), col("n_tokens"), col("n_bins")))
      .orderBy(col("stage_idx"))
      // pin the 5-row funnel stats, release the three stage anchors
      .transform(operators.LoopCache.finish(_, clean, deduped, mixed))
  }

  val corpusPrep2Sql: String = {
    val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    val ntok = s"CASE WHEN length($norm) = 0 THEN 0 " +
      s"ELSE CAST(len(string_split($norm, ' ')) AS BIGINT) END"
    s"""WITH tr AS (
      |  SELECT doc_id, source, text FROM documents WHERE doc_id % 10 <> 0),
      |toks8 AS (
      |  SELECT doc_id,
      |         string_split($norm, ' ') AS t
      |  FROM documents
      |  WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0),
      |grams AS (
      |  SELECT DISTINCT doc_id, gram FROM (
      |    SELECT doc_id,
      |           unnest(CASE WHEN len(t) >= 8
      |             THEN list_transform(range(1, len(t) - 8 + 2),
      |                                 i -> array_to_string(list_slice(t, i, i + 7), ' '))
      |             ELSE [array_to_string(t, ' ')] END) AS gram
      |    FROM toks8)),
      |eg AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0),
      |bad AS (
      |  SELECT DISTINCT g.doc_id FROM grams g JOIN eg USING (gram)
      |  WHERE g.doc_id % 10 <> 0),
      |clean AS (
      |  SELECT * FROM tr WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
      |ded AS (
      |  SELECT * FROM clean WHERE doc_id IN (
      |    SELECT min(doc_id) FROM clean GROUP BY md5(text))),
      |c AS (SELECT source, count(*) AS n_before FROM ded GROUP BY source),
      |w AS (SELECT source, n_before,
      |             CAST(floor(sqrt(CAST(n_before AS DOUBLE))) AS BIGINT) AS weight
      |      FROM c),
      |t AS (SELECT source, n_before, weight,
      |             least(n_before,
      |               (((SELECT CAST(sum(n_before) AS BIGINT) FROM c) // 2) * weight)
      |                 // greatest((SELECT CAST(sum(weight) AS BIGINT) FROM w), 1)) AS target_n
      |      FROM w),
      |mixed AS (
      |  SELECT d.* FROM ded d JOIN t USING (source)
      |  WHERE (((d.doc_id * 48271) % 2147483647) * 48271 % 2147483647)
      |          * t.n_before < t.target_n * 2147483647),
      |mt AS (SELECT doc_id, $ntok AS n_tokens FROM mixed),
      |pk AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT) AS so
      |  FROM mt),
      |nb AS (
      |  SELECT coalesce(max((so + greatest(n_tokens, 1) - 1) // 256) + 1, 0) AS nb
      |  FROM pk)
      |SELECT * FROM (
      |  SELECT 0 AS stage_idx, 'input_train' AS stage, count(*) AS n_docs,
      |         CAST(coalesce(sum($ntok), 0) AS BIGINT) AS n_tokens,
      |         CAST(0 AS BIGINT) AS n_bins FROM tr
      |  UNION ALL
      |  SELECT 1, 'decontaminated', count(*),
      |         CAST(coalesce(sum($ntok), 0) AS BIGINT), 0 FROM clean
      |  UNION ALL
      |  SELECT 2, 'deduped', count(*),
      |         CAST(coalesce(sum($ntok), 0) AS BIGINT), 0 FROM ded
      |  UNION ALL
      |  SELECT 3, 'mixed', count(*),
      |         CAST(coalesce(sum($ntok), 0) AS BIGINT), 0 FROM mixed
      |  UNION ALL
      |  SELECT 4, 'packed', count(*),
      |         CAST(coalesce(sum(n_tokens), 0) AS BIGINT),
      |         CAST((SELECT nb FROM nb) AS BIGINT) FROM mt)
      |ORDER BY stage_idx""".stripMargin
  }

  // -------------------------------------------------------------------
  // q109 — padding-waste report: pad each document's token count up to
  // the next 64-token boundary (the training-batch shape) and report,
  // per padded length, how many tokens of compute the padding burns —
  // the batch-scheduling efficiency signal length-binning exists to
  // improve. All integer arithmetic + one exact final division.
  // -------------------------------------------------------------------
  def paddingWaste(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.rebalance(
        Tables.documents(spark, sfDir).select("doc_id", "text"))
      .select(graft.functions.TextFunctions.tokenCountWs(col("text"))
        .cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .select(col("n_tokens"),
        expr("((n_tokens + 63) div 64) * 64").as("padded_len"))
    d.groupBy(col("padded_len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("padded_len") - col("n_tokens")).as("sum_waste"))
      .withColumn("waste_frac",
        col("sum_waste").cast("double") /
          (col("padded_len") * col("n_docs")).cast("double"))
      .orderBy(col("padded_len"))
  }

  val paddingWasteSql: String = {
    val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    val ntok = s"CASE WHEN length($norm) = 0 THEN 0 " +
      s"ELSE CAST(len(string_split($norm, ' ')) AS BIGINT) END"
    s"""WITH t AS (SELECT $ntok AS n_tokens FROM documents),
      |p AS (
      |  SELECT n_tokens, ((n_tokens + 63) // 64) * 64 AS padded_len
      |  FROM t WHERE n_tokens > 0)
      |SELECT padded_len, count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |       CAST(sum(padded_len - n_tokens) AS BIGINT) AS sum_waste,
      |       CAST(CAST(sum(padded_len - n_tokens) AS BIGINT) AS DOUBLE)
      |         / CAST(padded_len * count(*) AS DOUBLE) AS waste_frac
      |FROM p GROUP BY padded_len ORDER BY padded_len""".stripMargin
  }

  // -------------------------------------------------------------------
  // q145 — BPE merge-candidate mining (Sennrich et al. 2016): top-50
  // adjacent character pairs weighted by word frequency — the first
  // tokenizer-training merge step. Pair counting runs over the WORD-TYPE
  // table (operators/Bpe.scala), so the corpus-scale work is exactly a
  // word count; everything downstream is vocabulary-sized.
  // -------------------------------------------------------------------
  def bpeMergeCandidates(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("text"))
    Bpe.mergeCandidates(docs, "text", k = 50).orderBy(col("rank"))
  }

  val bpeMergeCandidatesSql: String =
    """WITH t AS (
      |  SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents
      |  WHERE length(trim(regexp_replace(text, '\s+', ' ', 'g'))) > 0),
      |wc AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT unnest(t) AS word FROM t) GROUP BY word),
      |pairs AS (
      |  SELECT substr(word, u.i, 1) AS lhs, substr(word, u.i + 1, 1) AS rhs,
      |         cnt
      |  FROM wc, UNNEST(range(1, len(word))) AS u(i)
      |  WHERE len(word) >= 2),
      |agg AS (
      |  SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS pair_freq
      |  FROM pairs GROUP BY lhs, rhs)
      |SELECT lhs, rhs, pair_freq,
      |       row_number() OVER (ORDER BY pair_freq DESC, lhs, rhs) AS rank
      |FROM agg ORDER BY pair_freq DESC, lhs, rhs LIMIT 50""".stripMargin

  // -------------------------------------------------------------------
  // q147 — dataset card: the per-source statistics table a corpus
  // release ships (docs, tokens, length envelope, exact-dup rate, lang
  // mix). One grouped pass; the only non-trivial aggregate is the exact
  // distinct-normalized-text count, which shuffles 32-char md5 digests,
  // never bodies (the q56 rule). All outputs integer or exact-ratio
  // doubles — engine-reproducible by construction.
  // -------------------------------------------------------------------
  def datasetCard(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val d = Tables.rebalance(
      Tables.documents(spark, sfDir).select("source", "lang", "text"))
    val norm = TextFunctions.normalizeText(col("text"))
    d.select(col("source"), col("lang"),
        size(TextFunctions.tokensWs(col("text"))).cast("long").as("ntok"),
        md5(norm).as("dig"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"),
        min(col("ntok")).as("min_tokens"),
        max(col("ntok")).as("max_tokens"),
        countDistinct(col("dig")).as("n_distinct_norm"),
        count_if(col("lang") === "en").as("n_en"),
        count_if(col("lang") === "es").as("n_es"),
        count_if(col("lang") === "fr").as("n_fr"),
        count_if(col("lang") === "de").as("n_de"),
        count_if(col("lang") === "zh").as("n_zh"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("min_tokens"), col("max_tokens"),
        (col("n_tokens").cast("double") / col("n_docs").cast("double"))
          .as("avg_tokens"),
        col("n_distinct_norm"),
        expr("((n_docs - n_distinct_norm) * 10000) DIV n_docs").as("dup_bps"),
        col("n_en"), col("n_es"), col("n_fr"), col("n_de"), col("n_zh"))
      .orderBy(col("source"))
  }

  val datasetCardSql: String =
    """WITH s AS (
      |  SELECT source, lang,
      |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS p
      |  FROM documents),
      |t AS (
      |  SELECT source, lang, md5(p) AS dig,
      |         CASE WHEN length(p) = 0 THEN 0
      |              ELSE len(string_split(p, ' ')) END AS ntok
      |  FROM s)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(ntok) AS BIGINT) AS n_tokens,
      |       CAST(min(ntok) AS BIGINT) AS min_tokens,
      |       CAST(max(ntok) AS BIGINT) AS max_tokens,
      |       CAST(CAST(sum(ntok) AS BIGINT) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS avg_tokens,
      |       CAST(count(DISTINCT dig) AS BIGINT) AS n_distinct_norm,
      |       CAST((count(*) - count(DISTINCT dig)) * 10000 AS BIGINT)
      |         // count(*) AS dup_bps,
      |       CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en,
      |       CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS n_es,
      |       CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS n_fr,
      |       CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT) AS n_de,
      |       CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS n_zh
      |FROM t GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------------
  // q152 — skip-gram association mining (word2vec/GloVe preprocessing):
  // unordered token pairs co-occurring within a 2-token forward window,
  // ranked by the exact integer association ratio c_ab·T·10^6 div
  // (n_a·n_b) — PMI's monotone-equivalent without the float log (the
  // q105 lift trick at token scale). Pair generation is NARROW
  // (posexplode + slice, no self-join), so the corpus collapses
  // map-side into the pair-count aggregate; top-20 is a TakeOrdered
  // with a full (score, a, b) tiebreak.
  // ------------------------------------------------------------------
  def skipgramAssociations(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.SkipGram.associations(
      Tables.rebalance(Tables.documents(spark, sfDir).select("text")),
      "text", window = 2, minCount = 5L, topK = 20)

  val skipgramAssociationsSql: String = {
    val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    s"""WITH tk AS (
      |  SELECT string_split($norm, ' ') AS ts
      |  FROM documents WHERE length($norm) > 0),
      |idx AS (SELECT ts, unnest(range(1, len(ts) + 1)) AS i FROM tk),
      |prs AS (
      |  SELECT least(ts[i], ts[i + k.k]) AS a,
      |         greatest(ts[i], ts[i + k.k]) AS b
      |  FROM idx, (VALUES (1), (2)) k(k)
      |  WHERE i + k.k <= len(ts)),
      |pc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
      |       FROM prs GROUP BY 1, 2),
      |uni AS (
      |  SELECT t AS tok, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT unnest(ts) AS t FROM tk) GROUP BY 1),
      |tot AS (SELECT CAST(sum(c_ab) AS BIGINT) AS t_pairs FROM pc)
      |SELECT a, b, c_ab,
      |       (c_ab * t_pairs * 1000000) // (ua.n * ub.n) AS score
      |FROM pc, tot
      |JOIN uni ua ON ua.tok = a
      |JOIN uni ub ON ub.tok = b
      |WHERE c_ab >= 5
      |ORDER BY score DESC, a, b LIMIT 20""".stripMargin
  }

  // -------------------------------------------------------------------
  // q160 — event-time lateness profile (EventSeq.latenessProfile): the
  // measurement a streaming watermark is chosen from. The raw log is
  // perfectly ordered, so the query replays the realistic disorder
  // source — a 4-shard collector (shard = event_id % 4) shipping
  // 1-HOUR batches, merged in (batch, shard) arrival order — and
  // profiles how far event time regresses behind the per-user running
  // max in that order. Fixed buckets with a cumulative column: the
  // watermark covering >=99.9% of events is read straight off the
  // output. One user-keyed exchange; the cumulative window runs over
  // <=6 rows.
  // -------------------------------------------------------------------
  def latenessProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("shard", expr("event_id % 4"))
      .withColumn("batch_hr", expr("unix_micros(ts) div 3600000000"))
    EventSeq.latenessProfile(ev, "user_id", "ts",
      Seq("batch_hr", "shard", "ts", "event_id"),
      Seq(60L, 300L, 900L, 3600L))
  }

  val latenessProfileSql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |         event_id % 4 AS shard,
      |         epoch_us(ts) // 3600000000 AS batch_hr
      |  FROM events),
      |l AS (
      |  SELECT greatest(0, coalesce(max(epoch_us(ts)) OVER (
      |             PARTITION BY user_id
      |             ORDER BY batch_hr, shard, ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |           epoch_us(ts)) - epoch_us(ts)) AS late
      |  FROM e),
      |b AS (
      |  SELECT CASE WHEN late = 0 THEN 0
      |              WHEN late <= 60000000 THEN 1
      |              WHEN late <= 300000000 THEN 2
      |              WHEN late <= 900000000 THEN 3
      |              WHEN late <= 3600000000 THEN 4
      |              ELSE 5 END AS bucket, late
      |  FROM l),
      |g AS (
      |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_events,
      |         CAST(max(late) AS BIGINT) AS max_lateness_us
      |  FROM b GROUP BY bucket)
      |SELECT bucket,
      |       CASE bucket WHEN 0 THEN 'on_time' WHEN 1 THEN '(0s,60s]'
      |            WHEN 2 THEN '(60s,300s]' WHEN 3 THEN '(300s,900s]'
      |            WHEN 4 THEN '(900s,3600s]' ELSE '>3600s' END AS lateness_bucket,
      |       n_events, max_lateness_us,
      |       CAST(sum(n_events) OVER (ORDER BY bucket
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |            AS BIGINT) AS cum_events
      |FROM g ORDER BY bucket""".stripMargin

  // -------------------------------------------------------------------
  // q163 — BPE encoding (the deploy half of q145): apply the top-20
  // mined merges, in rank order, to the word-type table via the
  // wrapped-separator literal-replace fold (operators/Bpe.applyMerges —
  // greedy leftmost, boundary-safe, regex-free), and report per-source
  // compression: chars -> symbols, ratio in ppm. Corpus-scale cost is a
  // word count; the fold runs over word TYPES. The oracle re-mines the
  // same merges and replays the fold as a 20-step recursive CTE with
  // the same replace() left-to-right contract.
  // -------------------------------------------------------------------
  def bpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("source", "text"))
    // plan-construction scalar rows (q70's pinnedRows rationale): the 20
    // mined merges become literals inside the per-word fold expression
    val merges = LoopCache.pinnedRows(
        Bpe.mergeCandidates(docs.select("text"), "text", k = 20))
      .toSeq.sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getString(0), r.getString(1)))
    val sw = docs.select(col("source"),
        explode(graft.functions.TextFunctions.tokensWs(col("text")))
          .as("word"))
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("cnt"))
    val types = Bpe.applyMerges(
      sw.select(col("word")).distinct(), "word", merges)
    sw.join(types.select(col("word"), col("n_syms")), Seq("word"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * length(col("word")).cast("long")).as("n_chars"),
        sum(col("cnt") * col("n_syms").cast("long")).as("n_syms"))
      .select(col("source"), col("n_words"), col("n_chars"), col("n_syms"),
        expr("CAST((CAST(n_syms AS DECIMAL(38,0)) * 1000000)" +
          " DIV n_chars AS BIGINT)").as("compression_ppm"))
      .orderBy(col("source"))
  }

  val bpeEncodeSql: String =
    """WITH RECURSIVE t AS (
      |  SELECT source,
      |         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents
      |  WHERE length(trim(regexp_replace(text, '\s+', ' ', 'g'))) > 0),
      |ws AS (
      |  SELECT source, word, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT source, unnest(t) AS word FROM t) GROUP BY 1, 2),
      |wc AS (SELECT word, CAST(sum(cnt) AS BIGINT) AS cnt FROM ws GROUP BY 1),
      |pairs AS (
      |  SELECT substr(word, u.i, 1) AS lhs, substr(word, u.i + 1, 1) AS rhs,
      |         cnt
      |  FROM wc, UNNEST(range(1, len(word))) AS u(i)
      |  WHERE len(word) >= 2),
      |agg AS (
      |  SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS pair_freq
      |  FROM pairs GROUP BY lhs, rhs),
      |merges AS (
      |  SELECT lhs, rhs,
      |         row_number() OVER (ORDER BY pair_freq DESC, lhs, rhs) AS rank
      |  FROM agg ORDER BY pair_freq DESC, lhs, rhs LIMIT 20),
      |sym0 AS (
      |  SELECT word,
      |         chr(1) || regexp_replace(word, '(.)', '\1' || chr(1), 'g') AS sym
      |  FROM (SELECT DISTINCT word FROM ws)),
      |r AS (
      |  SELECT word, sym, 0 AS step FROM sym0
      |  UNION ALL
      |  SELECT r.word,
      |         replace(r.sym, chr(1) || m.lhs || chr(1) || m.rhs || chr(1),
      |                        chr(1) || m.lhs || m.rhs || chr(1)),
      |         r.step + 1
      |  FROM r JOIN merges m ON m.rank = r.step + 1
      |  WHERE r.step < 20),
      |fin AS (
      |  SELECT word,
      |         len(sym) - len(replace(sym, chr(1), '')) - 1 AS n_syms
      |  FROM r WHERE step = 20)
      |SELECT ws.source,
      |       CAST(sum(ws.cnt) AS BIGINT) AS n_words,
      |       CAST(sum(ws.cnt * len(ws.word)) AS BIGINT) AS n_chars,
      |       CAST(sum(ws.cnt * fin.n_syms) AS BIGINT) AS n_syms,
      |       CAST((CAST(sum(ws.cnt * fin.n_syms) AS HUGEINT) * 1000000)
      |            // sum(ws.cnt * len(ws.word)) AS BIGINT) AS compression_ppm
      |FROM ws JOIN fin USING (word)
      |GROUP BY ws.source ORDER BY ws.source""".stripMargin

  // -------------------------------------------------------------------
  // q167 — content-defined-chunk duplication (operators/Chunking
  // .cdcDupStats): q77's duplicated-block signal with CDC boundaries —
  // cuts after every token whose md5word32 % 16 == 0, so an inserted
  // token shifts only its own chunk and duplication stays visible (the
  // fixed 10-token grid hides it after any edit). Chunking is one
  // narrow HOF projection (filter over positions + transform/slice —
  // no explode, no per-doc window); shuffles only at the corpus
  // frequency groupBy and the per-doc rollup. The token-weighted dup
  // ratio is an exact integer ppm. Oracle replays cuts, slices and
  // frequencies verbatim.
  // -------------------------------------------------------------------
  def cdcDupChunks(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.rebalance(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    Chunking.cdcDupStats(docs, "doc_id", "text", divisor = 16)
      .orderBy(col("doc_id"))
  }

  val cdcDupChunksSql: String =
    s"""$toksCte,
      |c0 AS (
      |  SELECT doc_id, t,
      |         list_sort(list_distinct(list_append(
      |           list_filter(range(1, len(t) + 1),
      |             i -> ('0x' || substr(md5(t[i]), 1, 8))::BIGINT % 16 = 0),
      |           len(t)))) AS cuts
      |  FROM toks),
      |ch AS (
      |  SELECT doc_id,
      |         unnest(list_transform(range(1, len(cuts) + 1), j ->
      |           struct_pack(
      |             txt := array_to_string(
      |               t[(CASE WHEN j = 1 THEN 1 ELSE cuts[j - 1] + 1 END):cuts[j]],
      |               ' '),
      |             nt := cuts[j] -
      |               (CASE WHEN j = 1 THEN 0 ELSE cuts[j - 1] END)))) AS c
      |  FROM c0),
      |cc AS (SELECT doc_id, c.txt AS txt, CAST(c.nt AS BIGINT) AS nt FROM ch),
      |f AS (SELECT txt, count(*) AS df FROM cc GROUP BY txt)
      |SELECT cc.doc_id,
      |       count(*) AS n_chunks,
      |       count(*) FILTER (WHERE f.df > 1) AS n_dup_chunks,
      |       CAST(sum(nt) AS BIGINT) AS n_toks,
      |       CAST(sum(CASE WHEN f.df > 1 THEN nt ELSE 0 END) AS BIGINT)
      |         AS dup_toks,
      |       CAST((CAST(sum(CASE WHEN f.df > 1 THEN nt ELSE 0 END) AS HUGEINT)
      |             * 1000000) // CAST(sum(nt) AS HUGEINT) AS BIGINT)
      |         AS dup_token_ppm
      |FROM cc JOIN f USING (txt)
      |GROUP BY cc.doc_id ORDER BY cc.doc_id""".stripMargin
}
