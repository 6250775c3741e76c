package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension merge, pure Spark (no Delta).
  *
  * Re-expresses the reference's Delta `MERGE`-based algorithm
  * (`scripts/batch/gold_dim_payment.py:63-124`, SURVEY.md §2.8) as a
  * declarative three-way union:
  *
  *   result = history ∪ unchanged-current ∪ closed-current ∪ inserts
  *
  * Change detection uses `xxhash64` over the attribute columns, exactly as
  * the reference does (`gold_dim_payment.py:84-85`). The reference's
  * double-row merge-key trick (`:87-93`) exists only to drive Delta's single
  * MERGE pass; with explicit unions it disappears.
  *
  * Intentional divergences from reference bugs (SURVEY.md §7.5): we use a
  * left join for the probe everywhere (the stores variant's accidental inner
  * join dropped brand-new keys, `gold_dim_stores.py:71-74`), keep
  * `is_current` boolean (not string, cf. `gold_dim_products.py:53`), and
  * union by name (positional union is order-fragile).
  *
  * Scale notes: the probe join and the semi/anti splits all shuffle on the
  * same business key, so with AQE the exchange is reused; `changes` is
  * typically tiny vs the dimension, so the semi/anti joins broadcast under
  * AQE. No driver collects — the reference's `max(key)` round-trip is
  * replaced by either `monotonically_increasing_id` (scalable,
  * non-deterministic) or hash keys.
  */
object Scd2 {

  val StartDate = "start_date"
  val EndDate = "end_date"
  val IsCurrent = "is_current"

  /** Turn a plain source snapshot into an initial SCD2 target (all rows
    * current, open-ended) — mirrors the initial Delta overwrite load
    * (`gold_dim_payment.py:44-59`). */
  def initialLoad(source: DataFrame, effectiveDate: Column): DataFrame =
    source
      .withColumn(StartDate, effectiveDate.cast("date"))
      .withColumn(EndDate, lit(null).cast("date"))
      .withColumn(IsCurrent, lit(true))

  /** Merge a new source snapshot into an SCD2 target.
    *
    * @param target  existing SCD2 table (business key + attrs + start/end/is_current)
    * @param source  new snapshot (business key + attrs only)
    * @param key     business-key column name
    * @param attrs   attribute columns participating in change detection
    * @param effectiveDate date the new versions become effective (and old close)
    */
  def merge(target: DataFrame, source: DataFrame, key: String,
            attrs: Seq[String], effectiveDate: Column): DataFrame = {
    val history = target.filter(!col(IsCurrent))
    val current = target.filter(col(IsCurrent))

    val srcHash = xxhash64(attrs.map(col): _*)
    val tgtProbe = current
      .select(col(key).as("__tgt_key"), xxhash64(attrs.map(col): _*).as("__tgt_hash"))

    // Probe: source ⟕ current target on the business key; keep rows that are
    // brand-new (no target) or attribute-changed (hash differs).
    // Mirrors J3 + F7 (`gold_dim_payment.py:73-85`).
    val changes = source
      .join(tgtProbe, col(key) === col("__tgt_key"), "left")
      .filter(col("__tgt_hash").isNull || col("__tgt_hash") =!= srcHash)
      .select(key, attrs: _*)

    val changedKeys = changes.select(col(key))

    val closed = current
      .join(changedKeys, Seq(key), "left_semi")
      .withColumn(EndDate, effectiveDate.cast("date"))
      .withColumn(IsCurrent, lit(false))

    val untouched = current.join(changedKeys, Seq(key), "left_anti")

    val inserts = initialLoad(changes, effectiveDate)

    history
      .unionByName(untouched)
      .unionByName(closed)
      .unionByName(inserts.select(history.columns.map(col): _*))
  }

  /** Deterministic surrogate keying for oracle-checkable tests: dense
    * row_number over (key, start_date). Single-partition window — use ONLY
    * at test scale; production keying is [[scalableKey]]. */
  def deterministicKey(dim: DataFrame, key: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    dim.withColumn(keyCol,
      row_number().over(Window.orderBy(col(key), col(StartDate))).cast("long"))
  }

  /** Production surrogate keying: collision-checked hash of (business key,
    * version start) — fully parallel, no global sort, no driver round-trip
    * (vs the reference's `max(key)` collect at `gold_dim_payment.py:96-100`).
    *
    * The collision check is real, not aspirational: xxhash64 collides at
    * birthday scale (~2³² rows, within reach of a 100 TB dimension), and a
    * silent collision would hand two versions one surrogate key. One
    * aggregation pass compares total rows against distinct surrogate keys
    * and fails loudly on mismatch. The check costs a single
    * map-side-combined agg over the keyed frame; callers that re-verify
    * downstream can disable it via `check = false`. */
  def scalableKey(dim: DataFrame, key: String, keyCol: String,
                  check: Boolean = true): DataFrame =
    scalableKeyWith(dim, key, keyCol, xxhash64(col(key), col(StartDate)), check)

  /** Test seam for [[scalableKey]]: the hash expression is injectable so a
    * spec can force a collision (xxhash64 collisions are unfindable at test
    * scale) and prove the guard actually fires. */
  private[graft] def scalableKeyWith(dim: DataFrame, key: String, keyCol: String,
                                     hashExpr: Column, check: Boolean): DataFrame = {
    val keyed = dim.withColumn(keyCol, hashExpr)
    if (check) {
      val r = keyed.agg(
        countDistinct(col(key), col(StartDate)).as("__inputs"),
        countDistinct(col(keyCol)).as("__keys")).head()
      val (inputs, keys) = (r.getLong(0), r.getLong(1))
      if (inputs != keys) throw new IllegalStateException(
        s"scalableKey collision: $inputs distinct ($key, $StartDate) inputs " +
          s"but only $keys distinct '$keyCol' values — xxhash64 collided; " +
          "use a wider key (e.g. add a salt column) or deterministicKey at this scale")
    }
    keyed
  }
}
