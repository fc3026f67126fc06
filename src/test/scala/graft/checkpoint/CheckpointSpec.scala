package graft.checkpoint

import graft.SparkSpec
import graft.exprs._
import graft.search.{Cdfc, CdfcConfig}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

class CheckpointSpec extends SparkSpec {

  private def planted = spark.range(3000).select(
    (pmod(xxhash64(col("id")), lit(100)).cast("double") / 100 + 0.5).as("x1"),
    (pmod(xxhash64(col("id") + 7), lit(100)).cast("double") / 100 + 0.5).as("x2"))
    .withColumn("y", (col("x1") * col("x2") > lit(1.0)).cast("int"))

  // lrTopK=0: checkpoint MECHANICS under test (resume-under-LR incl. the
  // lrauc.parquet round-trip is covered by CdfcSpec "resume under lrTopK")
  private val cfg = CdfcConfig(cMax = 3, binaryOps = Seq(BinOp.Mul),
    unaryOps = Seq(UnaryOp.Minus, UnaryOp.Log, UnaryOp.MinMax), groupByAggs = Seq.empty,
    lrTopK = 0)

  test("resume equals fresh: restart mid-search continues on the same path") {
    val dir = Files.createTempDirectory("ckpt").toString
    val df = planted
    val fresh = new Cdfc(df, Seq("x1", "x2"), Nil, Nil, col("y"), cfg).run()

    // partial run: stop after layer 2 (cMax=2), committing layers 1-2
    new Cdfc(df, Seq("x1", "x2"), Nil, Nil, col("y"),
      cfg.copy(cMax = 2), Some(dir)).run()
    assert(Files.exists(Paths.get(s"$dir/layer=2/manifest.json")))

    // resumed run to cMax=3 picks up from the checkpoint
    val resumed = new Cdfc(df, Seq("x1", "x2"), Nil, Nil, col("y"),
      cfg, Some(dir)).run()

    def canon(r: graft.search.CdfcResult) =
      r.survivors.map(s => (s.key, s.complexity, math.rint(s.score * 1e9), s.passed, s.inherited)).sortBy(_._1)
    assert(canon(resumed) == canon(fresh))
    assert(resumed.best.key == fresh.best.key)
    assert(math.abs(resumed.best.score - fresh.best.score) < 1e-12)
  }

  test("audit and lineage tables are appended per layer") {
    val dir = Files.createTempDirectory("ckpt2").toString
    new Cdfc(planted, Seq("x1", "x2"), Nil, Nil, col("y"),
      cfg.copy(cMax = 2), Some(dir)).run()
    val audit = spark.read.parquet(s"$dir/audit.parquet")
    assert(audit.count() > 0)
    assert(audit.columns.toSet ==
      Set("layer", "expr", "score", "complexity", "passed", "inherited", "duration_ms"))
    val lineage = spark.read.parquet(s"$dir/lineage.parquet")
    assert(lineage.select("layer").distinct().count() == 2)
    assert(lineage.agg(sum("rows")).head().getLong(0) == 3000L * 2)
  }

  test("aborted layer (no manifest) is ignored on load") {
    val dir = Files.createTempDirectory("ckpt3").toString
    new Cdfc(planted, Seq("x1", "x2"), Nil, Nil, col("y"),
      cfg.copy(cMax = 2), Some(dir)).run()
    // simulate a crash mid-commit of layer 3: parquet written, no manifest
    Files.createDirectories(Paths.get(s"$dir/layer=3"))
    val st = Checkpoint.load(spark, dir, 5)
    assert(st.exists(_.layer == 2))
  }
}
