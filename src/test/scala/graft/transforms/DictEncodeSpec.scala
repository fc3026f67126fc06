package graft.transforms

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DictEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("fit/encode/decode round-trips including nulls; one fit job") {
    val df = Seq(
      ("a", Some("x")), ("b", None), ("c", Some("y")), ("a", None), ("b", Some("x")))
      .toDF("r", "t")
    val dicts = DictEncode.fit(df, Seq("r", "t"))
    assert(dicts("r").values == Seq("a", "b", "c"))
    assert(dicts("t").values == Seq("x", "y"))
    assert(dicts("r").id("b") == 2)
    val enc = df.select(
      col("r"), col("t"),
      dicts("r").encode.as("rid"), dicts("t").encode.as("tid"))
    // null encodes to null (so ignoreNulls backfills behave identically)
    assert(enc.filter(col("t").isNull && col("tid").isNotNull).count() == 0)
    val dec = enc.select(
      col("r"), col("t"),
      dicts("r").decode(col("rid")).as("r2"), dicts("t").decode(col("tid")).as("t2"))
    assert(dec.filter(!(col("r") <=> col("r2")) || !(col("t") <=> col("t2"))).count() == 0)
  }

  test("fit fails loudly on high-cardinality columns") {
    val df = spark.range(100).select(col("id").cast("string").as("c"))
    intercept[IllegalArgumentException] {
      DictEncode.fit(df, Seq("c"), maxCard = 10)
    }
  }
}
