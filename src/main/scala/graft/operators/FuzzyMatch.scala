package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Edit-distance (typo-level) near-duplicate matching — the dedup tier
  * between exact digests (q30) and shingle/minhash similarity (q32):
  * pairs whose normalized text differs by a handful of character edits,
  * the shape OCR noise and hand-edited copies take.
  *
  * All-pairs edit distance is O(n²·len²) — intractable. This uses the
  * standard blocking strategy: candidates must share a `blockLen`-char
  * normalized prefix, so candidate generation is ONE equi-join on the
  * block key (an ordinary shuffle join, Σ blockSize² pairs — the
  * blocking analogue of the LSH band join), and each candidate is then
  * verified by `levenshtein` over a `prefixLen`-char window. Edit costs
  * are unit integers, so the verdict is engine-exact (DuckDB's
  * levenshtein replays it verbatim — no float, no hash).
  *
  * Recall caveat, as with any blocking scheme: an edit INSIDE the block
  * key hides the pair. When recall matters, [[multiPassPairs]] runs
  * extra passes with SHIFTED block keys (chars (shift, shift+blockLen])
  * and union-dedups — a pair escapes only if every pass's key region
  * contains an edit, so two default passes already require edits in
  * both of the first two 12-char regions. Each pass is the same bounded
  * triangle-salted join.
  */
object FuzzyMatch {

  /** Candidate pairs sharing a `blockLen`-char normalized-prefix block,
    * verified at levenshtein ≤ `maxDist` over `prefixLen`-char windows.
    * Returns (id_a, id_b, edit_distance) with id_a < id_b.
    *
    * Skew shape: a hot block of size m costs m²/2 verifications — that
    * count is inherent to key blocking (SNM is the linear-candidates
    * alternative), but it must PARALLELIZE, not serialize. A bare
    * self-join on `blk` lands each block's whole m² on one task, and AQE
    * makes it worse at scale: it coalesces partitions by the join's
    * INPUT bytes (tiny — one short prefix row per doc) while the output
    * is Σ m², so the measured 10× corpus ran 2.3M verifications on a
    * single core (SCALE.md round-7: 96× cold for 10× data). The join is
    * therefore triangle-salted: each row gets a stable salt s ∈ [0, g)
    * and is replicated to the g unordered salt buckets containing s;
    * pair (sx, sy) matches ONLY in bucket (min, max) — every logical
    * pair still appears exactly once, but a block's m² now spreads over
    * g(g+1)/2 tasks at a g× row-replication cost on block-sized input.
    * Results are identical to the unsalted join (the oracle replays it
    * with no salt logic — completeness is hash-checked, and the spec
    * asserts salted ≡ unsalted pair-for-pair). */
  def blockedPairs(df: DataFrame, idCol: String, textCol: String,
      blockLen: Int = 12, prefixLen: Int = 64, maxDist: Int = 5,
      saltGroups: Int = 8): DataFrame =
    blockedPairsAt(df, idCol, textCol, blockLen, prefixLen, maxDist,
      saltGroups, shift = 0)

  /** One blocking pass with the block key taken from normalized chars
    * (shift, shift+blockLen]. shift=0 is [[blockedPairs]]. For a SHIFTED
    * key the chars before the key are not known identical, so the verify
    * window is the full first `prefixLen` chars — the reported distance
    * is the full-window distance in every pass (pass 0 gets the same
    * number from its reduced window because a byte-identical prefix is
    * the identity region of the DP). Docs with ≤ shift normalized chars
    * are excluded from a shifted pass: they have no key material there,
    * and an empty key would collapse every short doc into one
    * unboundedly-hot block. */
  private def blockedPairsAt(df: DataFrame, idCol: String, textCol: String,
      blockLen: Int, prefixLen: Int, maxDist: Int,
      saltGroups: Int, shift: Int): DataFrame = {
    require(blockLen >= 1 && prefixLen >= blockLen && maxDist >= 0,
      s"need 1 <= blockLen ($blockLen) <= prefixLen ($prefixLen), maxDist >= 0")
    require(saltGroups >= 1, s"saltGroups=$saltGroups must be >= 1")
    require(shift >= 0 && shift + blockLen <= prefixLen,
      s"shifted key (${shift}..${shift + blockLen}] must sit inside prefixLen=$prefixLen")
    val g = saltGroups
    val norm = TextFunctions.normalizeText(col(textCol))
    // `pfx` carries only chars (blockLen, prefixLen]: the join already
    // requires byte-identical blk prefixes, and a shared prefix never
    // changes edit distance (the DP's first blockLen rows/cols are the
    // identity), so lev(pfx_x, pfx_y) == lev(full64_x, full64_y) for
    // every joined pair — the oracle computes the full-window distance
    // and hash-agrees. Dropping the redundant blockLen chars cuts both
    // the g×-replicated shuffle payload and every banded-levenshtein's
    // window by blockLen/prefixLen.
    val base = df
      .select(col(idCol).cast("long").as("id"), norm.as("norm"))
      .filter(length(col("norm")) > shift)
      .select(col("id"),
        substring(col("norm"), shift + 1, blockLen).as("blk"),
        (if (shift == 0)
          substring(col("norm"), blockLen + 1, prefixLen - blockLen)
        else substring(col("norm"), 1, prefixLen)).as("pfx"),
        // stable per-row salt: a pure function of the id, so both
        // replicated sides derive the same s for the same row
        pmod(xxhash64(col("id")), lit(g.toLong)).cast("int").as("s"))
    // replicate each row to every unordered bucket (a, b) with s ∈ {a, b}:
    // (s, t) normalized to (least, greatest) for all t — exactly g buckets
    val buckets = explode(array((0 until g).map(t =>
      struct(least(col("s"), lit(t)).as("a"),
        greatest(col("s"), lit(t)).as("b"))): _*)).as("bkt")
    val rep = base.select(col("id"), col("blk"), col("pfx"), col("s"), buckets)
      .select(col("id"), col("blk"), col("pfx"), col("s"),
        col("bkt.a").as("ba"), col("bkt.b").as("bb"))
    // Predicate order is deliberate: the cheap salt-uniqueness and id
    // predicates run BEFORE the levenshtein test (a post-join filter
    // would be pushed into the join condition AHEAD of them, paying the
    // edit distance on every bucket-collision row pair — measured 3x on
    // the unskewed base corpus). The distance test itself uses the
    // THRESHOLD variant — banded O(len·maxDist) instead of O(len²),
    // returning -1 past the threshold — and the projection re-derives
    // the exact distance only for the few surviving pairs.
    rep.as("x").join(rep.as("y"),
        col("x.blk") === col("y.blk") &&
          col("x.ba") === col("y.ba") && col("x.bb") === col("y.bb") &&
          // the pair's OWN salt pair must equal this bucket — the one
          // bucket where both orders of (sx, sy) coincide — so a pair
          // co-resident in several buckets is emitted exactly once
          least(col("x.s"), col("y.s")) === col("x.ba") &&
          greatest(col("x.s"), col("y.s")) === col("x.bb") &&
          col("x.id") < col("y.id") &&
          levenshtein(col("x.pfx"), col("y.pfx"), maxDist) >= 0)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        levenshtein(col("x.pfx"), col("y.pfx"), maxDist).as("edit_distance"))
  }

  /** Multi-pass blocking: one [[blockedPairsAt]] pass per shift in
    * `shifts`, union-deduped on the pair (min distance — the passes
    * agree on the full-window distance wherever they overlap). The
    * recall upgrade over single-pass blocking: a true pair is missed
    * only if EVERY pass's key region contains an edit; with the default
    * shifts (0, blockLen) a ≤ maxDist-edit pair escapes only when edits
    * land in both of the first two blockLen-char regions. Cost is
    * `shifts.size` bounded joins — linear, never quadratic. */
  def multiPassPairs(df: DataFrame, idCol: String, textCol: String,
      blockLen: Int = 12, prefixLen: Int = 64, maxDist: Int = 5,
      saltGroups: Int = 8, shiftsOpt: Seq[Int] = Nil): DataFrame = {
    // the default derives from blockLen so the two key regions never
    // overlap — a hardcoded Seq(0, 12) with blockLen > 12 would leave
    // chars 13..blockLen inside BOTH keys, and one edit there hides a
    // pair from both passes
    val shifts = if (shiftsOpt.isEmpty) Seq(0, blockLen) else shiftsOpt
    require(shifts.distinct.size == shifts.size,
      s"shifts $shifts must be distinct")
    shifts.map(sh => blockedPairsAt(
        df, idCol, textCol, blockLen, prefixLen, maxDist, saltGroups, sh))
      .reduce(_ unionByName _)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("edit_distance")).as("edit_distance"))
  }
}
