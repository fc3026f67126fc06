package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-shuffle dictionary encoding of low-cardinality string columns.
  *
  * Why: in an UnsafeRow a string field costs 8 bytes of offset/length plus
  * its padded bytes ("assistant" = 24 bytes), and every exchange + every
  * window sort copies the whole row (round-1/2 thread dumps of the flagship
  * job: all executor threads in `UTF8String.copy`/`Platform.copyMemory` —
  * the single-host memory-bandwidth ceiling). Encoding an enum-like column
  * to a small int before the shuffle cuts that to one 8-byte slot, and the
  * decode after the window pass is a row-local `element_at` projection.
  *
  * fit = ONE agg job collecting each column's (bounded) distinct values;
  * encode = codegen'd when-chain (no join, no broadcast of a dict table);
  * decode = array-literal lookup. Null round-trips to null, so
  * `last(col, ignoreNulls)`-style backfills behave identically on the
  * encoded column.
  */
object DictEncode {

  final case class Dict(column: String, values: Seq[String]) {
    /** value -> 1-based id; null -> null (int). */
    def encode: Column = encodeOf(col(column))
    def encodeOf(c: Column): Column =
      values.zipWithIndex.foldLeft(lit(null).cast("int")) {
        case (acc, (v, i)) => when(c === lit(v), lit(i + 1)).otherwise(acc)
      }
    /** 1-based id -> value; null -> null. */
    def decode(c: Column): Column = element_at(typedLit(values), c)
    def id(value: String): Int = values.indexOf(value) + 1
  }

  /** Fit dictionaries for `cols` in one batched agg. Fails loudly when a
    * column exceeds `maxCard` distinct values — dictionary-encoding a
    * high-cardinality column would trade the copy cost for a giant
    * when-chain, which is never the right call.
    */
  def fit(df: DataFrame, cols: Seq[String], maxCard: Int = 1024): Map[String, Dict] = {
    require(cols.nonEmpty, "no columns to encode")
    val aggs = cols.map(c => collect_set(col(c)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      val vs = row.getSeq[String](row.fieldIndex(c)).sorted
      require(vs.size <= maxCard,
        s"$c has ${vs.size} distinct values (> $maxCard); not an enum column")
      c -> Dict(c, vs)
    }.toMap
  }
}
