package graft.tools

import java.nio.file.Files

import graft.ops.{CompactionPolicy, EdgeIndex}
import org.apache.spark.sql.SparkSession

/** Measures the count-triggered compaction POLICY end-to-end — the
  * closing of the loop [[BatchCountProbe]] opened: that probe measured
  * the degradation curve (EdgeIndex reads ~0.10 s per uncompacted
  * batch, linear), [[CompactionPolicy]] turned the curve into a batch
  * threshold K = readBudget / perBatchCost, and this probe verifies the
  * policy DELIVERS the budget: two identical EdgeIndex stores ingest
  * the same batch stream, one running `compactIfDue(K)` after every
  * append (the maintenance-loop shape), one never compacting (control).
  * The policy store's read latency must stay bounded near
  * floor + budget at every point while the control's grows linearly
  * without bound; the record carries both series plus the compaction
  * count so the bound is auditable, not asserted prose.
  *
  * Run: `sbt "Test/runMain graft.tools.PolicyProbe <out.json> [n]"`
  * (test scope beside BatchCountProbe — a measurement harness, not
  * product code). One JSON line: {"probe":"compaction_policy","n":N,
  * "budget_s":B,"k":K,"policy_read_s":[...],"control_read_s":{...},
  * "compactions":C,"policy_max_read_s":...,"control_max_read_s":...}.
  */
object PolicyProbe {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/BATCH_POLICY.json")
    val n = args.lift(1).map(_.toInt).getOrElse(60)
    val budgetS = 0.5
    val k = CompactionPolicy.maxBatches(readBudgetS = budgetS)
    val controlCps = Seq(1, 15, 30, 45, 60, 100).filter(_ <= n) :+ n
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("policy-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("policy-probe").toFile.getAbsolutePath
    val policy = new EdgeIndex(spark, s"$root/policy")
    val control = new EdgeIndex(spark, s"$root/control")

    def batch(i: Int) =
      (0 until 20).map(j => ((i * 20 + j).toLong, (i * 20 + j + 1).toLong))
        .toDF("src", "dst")

    var compactions = 0
    val policyReads = Seq.newBuilder[Double]
    val controlReads = scala.collection.mutable.LinkedHashMap.empty[Int, Double]
    (1 to n).foreach { i =>
      val b = batch(i)
      policy.addEdges(b, i.toLong)
      if (policy.compactIfDue(k)) compactions += 1
      policyReads += timed(policy.edges().count())
      control.addEdges(b, i.toLong)
      if (controlCps.contains(i))
        controlReads(i) = timed(control.edges().count())
    }

    val pr = policyReads.result()
    def fmt(d: Double) = graft.JsonNum.fmt(d, 3)
    val line =
      s"""{"probe":"compaction_policy","n":$n,"budget_s":$budgetS,""" +
      s""""k":$k,"per_batch_cost_s":${CompactionPolicy.EdgePerBatchReadCostS},""" +
      s""""compactions":$compactions,""" +
      s""""policy_read_s":[${pr.map(fmt).mkString(",")}],""" +
      s""""control_read_s":{${controlReads.map { case (i, t) =>
          s""""$i":${fmt(t)}""" }.mkString(",")}},""" +
      s""""policy_max_read_s":${fmt(pr.max)},""" +
      s""""policy_median_read_s":${fmt(pr.sorted.apply(pr.size / 2))},""" +
      s""""control_max_read_s":${fmt(controlReads.values.max)}}"""
    spark.stop()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    println(line)
  }
}
