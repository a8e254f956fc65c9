package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew-join splitting can't help (e.g. the skew is in the build of an
  * aggregation, or the join is inside a stateful stream with fixed
  * partitioning).
  *
  * Mechanics: the skewed (large) side gets a random-but-deterministic salt
  * in `[0, n)` appended to its key; the small side is replicated n ways, one
  * copy per salt value, via an `explode` of a literal range. The join key
  * becomes `(key, salt)`, so one hot key's rows spread over n reducers
  * instead of one. Replication multiplies the small side by n — choose n ≈
  * (hot-key rows) / (target partition rows), not "big".
  *
  * The salt is `pmod(hash(<every column of the row>), n)` — a pure function
  * of row CONTENT. This matters for fault tolerance: a salt from
  * `monotonically_increasing_id` or `rand` changes when a lost map task is
  * recomputed and re-enumerates rows in a different order, so reducers that
  * already committed see one assignment and re-run reducers another —
  * silently dropping/duplicating rows (the SPARK-23207 class of bug).
  * Content-hashing is retry-stable. Caveat: byte-identical duplicate rows
  * share a salt; if the hot key's rows are exact duplicates, dedup or add a
  * distinguishing column first.
  */
object SkewOps {

  private def contentSalt(df: DataFrame, n: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(n))

  /** Inner-join `big` with `small` on `bigKey === smallKey`, salting `big`
    * n ways and replicating `small` n ways.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    val salted = big.withColumn("__salt", contentSalt(big, n))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted
      .join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * first aggregate on `(key, salt)`, then re-aggregate the n partials per
    * key. `sum`/`count`/`min`/`max` re-aggregate with themselves; this
    * helper does counts and sums, the pattern generalizes to any
    * commutative monoid (cf. TopKAggregator's bounded merge).
    */
  def saltedCountSum(df: DataFrame, key: String, sumCol: String, n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    val salted = df.withColumn("__salt", contentSalt(df, n))
    salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(col(sumCol)).as("__sum"))
      .groupBy(col(key))
      .agg(sum($"__cnt").as("cnt"), sum($"__sum").as("sum"))
  }

  private implicit class Interp(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
