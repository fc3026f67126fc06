package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("co-located join and groupBy on bucketed tables plan with ZERO exchange") {
    val ev = Tables.events(spark, sf0001)
    val left = ev.select(col("user_id"), col("event_id"), col("value"))
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value").as("pval"))
    Bucketing.writeBucketed(left, "b_left", "user_id", 8)
    Bucketing.writeBucketed(right, "b_right", "user_id", 8)
    // at 100 TB neither side broadcasts — model that condition, otherwise
    // the planner (correctly) picks a broadcast join at test scale and the
    // bucketed layout never gets exercised
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bl = Bucketing.read(spark, "b_left")
      val br = Bucketing.read(spark, "b_right")

      val joined = bl.join(br, "user_id")
      val pj = plan(joined)
      assert(!pj.contains("Exchange"),
        s"bucketed equi-join must not shuffle:\n$pj")
      assert(pj.contains("SortMergeJoin"), pj)

      val agged = bl.groupBy("user_id").agg(sum("value"))
      val pa = plan(agged)
      assert(!pa.contains("Exchange"),
        s"bucketed groupBy must not shuffle:\n$pa")

      // contrast: the identical unbucketed join DOES shuffle (so the
      // assertion above is meaningful, not vacuous)
      val pu = plan(left.join(right, "user_id"))
      assert(pu.contains("Exchange"), s"unbucketed contrast:\n$pu")

      // and the data round-trips
      assert(joined.count() == left.join(right, "user_id").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Bucketing.drop(spark, "b_left")
      Bucketing.drop(spark, "b_right")
    }
  }
}
