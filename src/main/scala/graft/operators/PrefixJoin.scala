package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via rare-first prefix filtering — the
  * PPJoin-family screen (Chaudhuri et al. SSJoin / Xiao et al. PPJoin),
  * the LOSSLESS member of the near-dup screen family: MinHash-LSH
  * ([[Dedup]]) and SimHash trade false negatives for speed; the prefix
  * filter guarantees completeness — every pair with Jaccard ≥ t shares
  * at least one token in both prefixes (pigeonhole over a global token
  * order), so screen + exact verify returns EXACTLY the ≥ t pairs.
  * That makes the DuckDB oracle self-validating: it computes all-pairs
  * Jaccard with no prefix logic at all, and any screen incompleteness
  * would surface as a missing row in the hash compare.
  *
  * Scale shape: tokens are ordered rarest-first (global document
  * frequency, ties by token), and each set keeps only its first
  * `n − ⌈t·n⌉ + 1` tokens as join keys — frequent tokens (the quadratic
  * buckets) are exactly the ones dropped from prefixes, so candidate
  * buckets stay small by construction; a length filter
  * (`max(|A|,|B|)·tNum ≤ min(|A|,|B|)·tDen`, necessary for J ≥ t)
  * prunes cross-size pairs before the distinct. The per-set ordering
  * window partitions by set id (small per-doc groups, never global).
  *
  * Everything stays FLAT (id, n, token) end to end — candidates are
  * verified by joining the token stream back on (id, token) and
  * counting matches, not by intersecting collected arrays: the flat
  * verify is an ordinary distributed join keyed by the candidate ids,
  * and nothing array-typed is ever cached (columnar cache encoding of
  * array<string> cost ~10 s alone at sf0.1 — more than the whole
  * operator). An array-side verify (gather per-doc token arrays, one
  * `array_intersect` per candidate) was MEASURED SLOWER at sf1 — the
  * joined intermediate carries two ~50-string arrays per candidate and
  * ArrayIntersect runs interpreted — so the flat shape stays.
  * Integer similarity only: `jacc_pct = (100·|∩|) div |∪|`.
  *
  * Anchor lifecycle: the token stream feeds three plans (frequency agg,
  * prefix rank, verify) and the prefix table both self-join sides —
  * each is pinned for the invocation and released once the pinned
  * result materializes ([[LoopCache.finish]]), which also gives warm
  * re-invocations the plan-identity fast path.
  */
object PrefixJoin {

  /** Pairs (a < b) of `docs(idCol)` whose DISTINCT `tokensCol` sets have
    * Jaccard ≥ tNum/tDen. Returns (a, b, inter_sz, union_sz, jacc_pct).
    * Token arrays are taken as-is — normalize/tokenize upstream. */
  def selfJoin(docs: DataFrame, idCol: String, tokensCol: String,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val tok = docs
      .select(col(idCol).cast("long").as("id"),
        array_distinct(col(tokensCol)).as("ts"))
      .select(col("id"), size(col("ts")).cast("long").as("n"),
        explode(col("ts")).as("tok"))
    tok.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // rare-first rank within each set; prefix keeps pos ≤ n − ⌈t·n⌉ + 1
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("tok"))
    val prefix = tok.join(df, "tok")
      .select(col("id"), col("tok"), col("n"),
        row_number().over(w).as("pos"))
      .filter(col("pos") <=
        col("n") - ((col("n") * tNum + tDen - 1) / tDen).cast("long") + 1L)
    prefix.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          col("a.n") * tNum <= col("b.n") * tDen &&
          col("b.n") * tNum <= col("a.n") * tDen)
      .select(col("a.id").as("a"), col("a.n").as("na"),
        col("b.id").as("b"), col("b.n").as("nb"))
      .distinct()
    val out = cand
      .join(tok.select(col("id").as("a"), col("tok")), "a")
      .join(tok.select(col("id").as("b"), col("tok")), Seq("b", "tok"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter_sz"))
      .select(col("a"), col("b"), col("inter_sz"),
        (col("na") + col("nb") - col("inter_sz")).as("union_sz"))
      .filter(col("inter_sz") * tDen >= col("union_sz") * tNum)
      .select(col("a"), col("b"), col("inter_sz"), col("union_sz"),
        expr("(100 * inter_sz) div union_sz").as("jacc_pct"))
      .orderBy(col("a"), col("b"))
    LoopCache.finish(out, tok, prefix)
  }

  /** DIRECTED pairs (a, b), a ≠ b, where the CONTAINMENT of A in B —
    * `|A∩B| / |A|` over the DISTINCT `tokensCol` sets — is ≥ tNum/tDen.
    * Returns (id_a, id_b, inter_sz, n_a, cont_pct).
    *
    * Containment is the ASYMMETRIC member of the near-dup family: it
    * finds documents NESTED inside other documents (a page republished
    * inside a boilerplate wrapper, a paragraph quoted into a longer
    * post) that symmetric Jaccard misses — a 100-shingle doc fully
    * contained in a 1000-shingle doc has containment 1.0 but Jaccard
    * only ~0.1, so no Jaccard threshold that keeps real pairs can catch
    * it. Training-data dedup pipelines run BOTH screens: Jaccard for
    * mutual near-dups, containment to demote subsumed fragments.
    *
    * Lossless screen, same pigeonhole as [[selfJoin]] but one-sided: if
    * `|A∩B| ≥ ⌈t·|A|⌉`, then A has at most `|A| − ⌈t·|A|⌉` tokens outside
    * B, so among A's first `|A| − ⌈t·|A|⌉ + 1` tokens (rare-first global
    * order) at least one is in B. Hence prefix(A) ⋈ tokens(B) proposes
    * every qualifying pair, and only A's side can be prefix-shortened —
    * B must be probed over its FULL token stream (there is no lower
    * bound on which of B's tokens the shared one is). Candidate buckets
    * stay bounded because prefix tokens are by construction the RAREST
    * in each set — a prefix token with document frequency f costs f
    * probe rows. The only size filter containment admits is
    * `|B| ≥ ⌈t·|A|⌉` (|A∩B| ≤ |B|); unlike Jaccard there is no upper
    * bound on |B|.
    *
    * Same flat (id, n, token) shape as [[selfJoin]] end to end, same
    * self-validating oracle property: the DuckDB oracle computes
    * all-pairs containment with no prefix logic, so any screen
    * incompleteness surfaces as a missing row in the hash compare. */
  def containmentJoin(docs: DataFrame, idCol: String, tokensCol: String,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen not in (0,1]")
    val tok = docs
      .select(col(idCol).cast("long").as("id"),
        array_distinct(col(tokensCol)).as("ts"))
      .select(col("id"), size(col("ts")).cast("long").as("n"),
        explode(col("ts")).as("tok"))
    tok.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("tok"))
    // A-side prefix: first n − ⌈t·n⌉ + 1 rare-first tokens
    val prefix = tok.join(df, "tok")
      .select(col("id"), col("tok"), col("n"),
        row_number().over(w).as("pos"))
      .filter(col("pos") <=
        col("n") - ((col("n") * tNum + tDen - 1) / tDen).cast("long") + 1L)
    prefix.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = prefix.as("a").join(tok.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") =!= col("b.id") &&
          // |A∩B| ≤ |B|, so |B|·tDen ≥ |A|·tNum is necessary
          col("b.n") * tDen >= col("a.n") * tNum)
      .select(col("a.id").as("a"), col("a.n").as("na"), col("b.id").as("b"))
      .distinct()
    val out = cand
      .join(tok.select(col("id").as("a"), col("tok")), "a")
      .join(tok.select(col("id").as("b"), col("tok")), Seq("b", "tok"))
      .groupBy(col("a"), col("b"), col("na"))
      .agg(count(lit(1)).as("inter_sz"))
      .filter(col("inter_sz") * tDen >= col("na") * tNum)
      .select(col("a").as("id_a"), col("b").as("id_b"), col("inter_sz"),
        col("na").as("n_a"),
        expr("(100 * inter_sz) div na").as("cont_pct"))
      .orderBy(col("id_a"), col("id_b"))
    LoopCache.finish(out, tok, prefix)
  }
}
