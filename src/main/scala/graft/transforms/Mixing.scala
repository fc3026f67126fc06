package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mixing operators for training-data assembly: deterministic
  * stratified (quota) sampling and token-budget sequence packing.
  *
  * The reference pipeline rebalances its per-dataset candidate pools by
  * plain index slicing on the driver
  * (/root/reference/new_project/fastsklearnfeature/splitting/Splitter.py:20-47);
  * at corpus scale the equivalent is a per-stratum sampling rate applied as
  * a ROW-LOCAL hash filter — no shuffle, no fitted state, reproducible
  * across runs, engines, and partitionings. The hash is the same portable
  * Knuth multiplicative scheme the text fingerprints use
  * ([[graft.text.TextFeatures.fingerprint]]), so the DuckDB oracle replays
  * the exact decision per row rather than checking rates statistically.
  */
object Mixing {

  /** Portable per-row coin: pmod(pmod(id, 2^31) * 2654435761 + 1013904223,
    * 2^32) — plain 64-bit arithmetic (max intermediate ~5.7e18 < 2^63), so
    * any ANSI SQL engine computes the identical value. NOT cryptographic;
    * it only needs to be uncorrelated with the id sequence.
    *
    * Portability caveat: Spark's `pmod` is non-negative while plain SQL `%`
    * is sign-of-dividend, so the "identical in any engine" claim holds for
    * NON-NEGATIVE ids only; an oracle replaying the decision for signed ids
    * must spell pmod as `((x % m) + m) % m`. Corpus doc ids here are
    * non-negative by construction.
    */
  def portableCoin(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(2147483648L)) * lit(2654435761L)
      + lit(1013904223L), lit(4294967296L))

  /** Deterministic stratified sampling: keep a row iff its portable coin
    * (mod 1e6) falls under the stratum's quota. `fracs` maps stratum value →
    * sampling fraction (quantized to 1e-6); unlisted strata get
    * `defaultFrac`. The rate lookup compiles to a literal CASE chain —
    * whole-stage codegen, zero joins, zero exchanges; at 100 TB this is a
    * pure scan+filter whose selectivity is exactly the mixing recipe.
    *
    * Sampling is CONSISTENT in the id: re-running on a grown corpus keeps
    * the same decision for every old row (sampling by coordinate, not by
    * position), which is what incremental corpus refreshes need.
    */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
      fracs: Map[String, Double], defaultFrac: Double): DataFrame = {
    def quota(f: Double): Long = math.round(f * 1e6)
    val rate = fracs.foldLeft(lit(quota(defaultFrac))) { case (acc, (g, f)) =>
      when(col(groupCol) === lit(g), lit(quota(f))).otherwise(acc)
    }
    df.filter(pmod(portableCoin(col(idCol)), lit(1000000L)) < rate)
  }

  /** Next-fit sequence packing for LM-pretraining batch assembly: shard the
    * corpus by `pmod(id, shards)`, order each shard by id, and chunk the
    * concatenated weight stream (token counts) into `budget`-sized bins.
    * Emits `shard`, `offset` (stream position where the doc starts) and
    * `bin = floor(offset / budget)` — a doc whose span crosses a boundary
    * starts in the bin its offset lands in, the contiguous-stream semantics
    * of standard pretraining packing (documents are split at bin edges by
    * the downstream tokenizer, not dropped).
    *
    * Scale shape: ONE hash exchange on the shard key, then a per-shard
    * sort + running sum (window, no second exchange). `shards` bounds both
    * parallelism and per-task sort size — at 100 TB pick shards so each
    * shard's (id, weight) pairs fit a task (the window needs only those two
    * columns; text stays out of the exchange).
    *
    * Requires UNIQUE ids per shard (corpus doc ids are): the running-sum
    * window's default RANGE frame would fold all rows tied on `idCol` into
    * one offset, which is not a valid packing stream.
    */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, s"budget=$budget shards=$shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    df.withColumn("shard", pmod(col(idCol).cast("long"), lit(shards.toLong)))
      .withColumn("offset",
        sum(col(weightCol).cast("long")).over(w) - col(weightCol).cast("long"))
      // integer floor-div (offset >= 0, budget > 0): the double-division
      // formulation misbins once a cumulative offset passes 2^53
      .withColumn("bin", expr(s"offset div $budget"))
  }
}
