package graft

import org.apache.spark.sql.functions._

/** Connected-components stress row (r5-verdict item 7): run
  * [[graft.dedup.Dedup.connectedComponents]] on a ~10^7-edge Zipf-like pair
  * list and record rounds-to-converge and the per-round edge counts — the
  * empirical evidence for the large-star/small-star O(log^2) convergence
  * claim and the maxIter=25 margin.
  *
  * Edge distribution: src drawn log-uniformly over [0, nVertices) (a
  * Zipf-like heavy head: vertex 0's expected degree is ~edges/ln(nV)), dst
  * uniform — so the biggest component swallows most vertices and the hot
  * head stresses the star rounds. Pure function of the edge id:
  * reproducible under any partitioning.
  *
  * Usage: runMain graft.CcBench [nEdges] [nVertices] [outJson]
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nVerts = args.lift(1).map(_.toLong).getOrElse(20000000L)
    val outJson = args.lift(2).getOrElse("/root/repo/BENCH_CC.json")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = ScalingBench.session(cores)
    try {
      val e = spark.range(0, nEdges, 1, cores * 4)
      val u = pmod(xxhash64(col("id"), lit(1)), lit(1000003L)).cast("double") / 1000003.0
      // log-uniform head: src = floor(exp(u * ln(nVerts))) - 1 in [0, nVerts)
      val src = least(floor(exp(u * math.log(nVerts.toDouble))).cast("long") - 1, lit(nVerts - 1))
      val dst = pmod(xxhash64(col("id"), lit(2)), lit(nVerts))
      val pairs = e.select(greatest(src, lit(0L)).as("a"), dst.as("b"))
      val verts = spark.range(0, nVerts).select(col("id").as("doc_id"))
      val rounds = collection.mutable.ArrayBuffer[(Int, Long)]()
      val t0 = System.nanoTime()
      val labels = graft.dedup.Dedup.connectedComponents(pairs, verts,
        onRound = (r, n) => rounds += ((r, n)))
      val nComponents = labels.select(col("component")).distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      val roundJson = rounds.map { case (r, n) => s"""{"round":$r,"edges":$n}""" }
        .mkString("[", ",", "]")
      val json =
        s"""{"n_edges_in":$nEdges,"n_vertices":$nVerts,"cores":$cores,
           |"rounds_to_converge":${rounds.size},"max_iter_margin":${25 - rounds.size},
           |"peak_round_edges":${if (rounds.isEmpty) 0L else rounds.map(_._2).max},
           |"n_components":$nComponents,"sec_total":${math.rint(sec * 1000) / 1000},
           |"per_round":$roundJson}""".stripMargin.replace("\n", "")
      println(json)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), json + "\n")
    } finally spark.stop()
  }
}
