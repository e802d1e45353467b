package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins upsert — the MERGE INTO / SCD-1 semantic without a table
  * format: fold a batch of keyed updates into a snapshot, keeping the
  * newest update per key (total version order required for determinism)
  * and passing through untouched snapshot rows.
  *
  * Scale shape: one window shuffle on the update batch (usually ≪ the
  * snapshot) to pick winners — rank-pushdown (WindowGroupLimit) trims
  * each map partition to its per-key top-1 before that exchange — then
  * TWO snapshot touches: a left join applying winners (broadcast while
  * winners fit the threshold, key-shuffle beyond it — where a bucketed
  * snapshot joins without moving) and an anti join of winners against
  * the snapshot's KEY COLUMN for the WHEN NOT MATCHED inserts (key
  * column broadcast at small scale; a key-only shuffle at 100 TB). This
  * is what a lakehouse MERGE compiles to; no row-level mutation is
  * needed. */
object Upsert {

  /** Reduce `updates` to one winner per `key` by `versionOrder`
    * (DESCENDING precedence list — first column is the newest-wins
    * criterion; include a unique tiebreaker for determinism). */
  def latestPerKey(updates: DataFrame, key: String,
      versionOrder: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(versionOrder: _*)
    updates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply `updates` to `snapshot` with full MERGE semantics:
    *  - matched keys take the update's values for `setCols` (which must
    *    exist in both frames); their other columns pass through;
    *  - unmatched snapshot rows pass through untouched;
    *  - unmatched UPDATE keys are INSERTED (the WHEN NOT MATCHED half):
    *    `setCols` from the update, every other snapshot column null.
    * Adds `was_updated` (row took update values — matched or inserted)
    * and `was_inserted` (key absent from the snapshot). */
  def applyLatest(snapshot: DataFrame, updates: DataFrame, key: String,
      versionOrder: Seq[Column], setCols: Seq[String]): DataFrame = {
    val winners = latestPerKey(updates, key, versionOrder)
      .select(col(key) +: lit(true).as("__u_hit") +:
        setCols.map(c => col(c).as(s"__u_$c")): _*)
    // NOT full outer (which no broadcast join supports — it would force
    // the whole snapshot through a shuffle): the matched/pass-through
    // path is a LEFT join that keeps the snapshot in place with winners
    // broadcast, and the insert half is a separate anti join that
    // touches only the key column of the snapshot.
    val joined = snapshot.join(winners, Seq(key), "left")
    // the match marker (not the value) decides precedence, so an update
    // that explicitly sets NULL still wins over the snapshot value
    val merged = snapshot.columns.map {
      case c if setCols.contains(c) =>
        when(col("__u_hit"), col(s"__u_$c")).otherwise(col(c)).as(c)
      case c => col(c)
    }
    val updatedOrPass = joined.select(merged :+
      coalesce(col("__u_hit"), lit(false)).as("was_updated") :+
      lit(false).as("was_inserted"): _*)
    val inserted = winners
      .join(snapshot.select(col(key)), Seq(key), "left_anti")
      .select(snapshot.columns.map {
        case c if c == key => col(c)
        case c if setCols.contains(c) => col(s"__u_$c").as(c)
        case c => lit(null).cast(snapshot.schema(c).dataType).as(c)
      } :+ lit(true).as("was_updated") :+ lit(true).as("was_inserted"): _*)
    updatedOrPass.unionByName(inserted)
  }

  /** SCD-2 history reconstruction from an event stream: collapse
    * consecutive identical states per key, then interval-ize with
    * `lead()` — one row per state EPISODE with `valid_from`/`valid_to`
    * (null `valid_to` = current). The history twin of [[applyLatest]]:
    * SCD-1 keeps only the newest value, SCD-2 keeps when each value
    * held.
    *
    * Two windows over the same (key, order) partitioning — Catalyst
    * plans them into a single sort+exchange, so the whole
    * reconstruction is one shuffle on the entity key. `tieCol` must
    * make (tsCol, tieCol) a total order per key (e.g. a unique event
    * id); without it, same-timestamp events would make the episode
    * boundaries nondeterministic.
    *
    * @return keyCol, stateCol, valid_from (= tsCol of the episode's
    *         first event), valid_to (next episode's start, null if
    *         current), is_current */
  def scd2History(df: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = df
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      // null-safe inequality: the first row per key (prev = null) opens
      // an episode; genuine null states still compare correctly
      .filter(!(col(stateCol) <=> col("__prev")))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(stateCol), col("valid_from"),
        col("valid_to"), col("is_current"))
  }
}
