package graft.tools

import java.nio.file.Files

import graft.ops.{CompactionPolicy, ExactDedupIndex}
import org.apache.spark.sql.SparkSession

/** [[PolicyProbe]]'s sibling for the PROBE-store family (partition-pruned
  * mode("append") stores — exact-dedup here): verifies the generalized
  * count-triggered policy on the family's own measured constant
  * ([[CompactionPolicy.ProbeStorePerBatchReadCostS]], ~50× milder than
  * the edge store's union-plan growth, so K is ~50× larger). Two
  * identical fingerprint stores ingest the same batch stream; the policy
  * store runs `compactIfDue(K)` after every append (the maintenance-loop
  * shape), the control never compacts. Because the family's degradation
  * is FILE-COUNT growth (listing + parquet footers), the record carries
  * both the read-latency series and the appendDepth series — the policy
  * store's depth must saw-tooth bounded by K while the control's grows
  * without bound, and the policy read stays at the floor.
  *
  * Run: `sbt "Test/runMain graft.tools.ProbeStorePolicyProbe <out.json>
  * [n] [budgetS]"`. One JSON line: {"probe":"probe_store_policy",...}.
  */
object ProbeStorePolicyProbe {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/PROBE_STORE_POLICY.json")
    val n = args.lift(1).map(_.toInt).getOrElse(150)
    val budgetS = args.lift(2).map(_.toDouble).getOrElse(0.1)
    val k = CompactionPolicy.maxBatches(budgetS,
      CompactionPolicy.ProbeStorePerBatchReadCostS)
    val cps = Seq(1, 25, 50, 75, 100, 125, 150, 200).filter(_ <= n) :+ n
    val controlCps = cps.distinct.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("probe-store-policy-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("probe-policy").toFile.getAbsolutePath
    val policy = new ExactDedupIndex(spark, s"$root/policy", "id", "text")
    val control = new ExactDedupIndex(spark, s"$root/control", "id", "text")

    // 10 docs per batch, ~half drawn from a shared pool so the probe
    // also exercises dup arbitration across compactions, not just appends
    def batch(i: Int) = (0 until 10).map { j =>
      val id = (i * 10 + j).toLong
      val text = if (j % 2 == 0) s"shared pool doc ${j / 2}"
                 else s"unique doc $id body"
      (id, text)
    }.toDF("id", "text")

    var compactions = 0
    val policyReads = Seq.newBuilder[Double]
    val policyDepths = Seq.newBuilder[Int]
    val controlReads = scala.collection.mutable.LinkedHashMap.empty[Int, Double]
    val controlDepths = scala.collection.mutable.LinkedHashMap.empty[Int, Int]
    (1 to n).foreach { i =>
      val b = batch(i)
      policy.addAndDedup(b, i.toLong).count()
      if (policy.compactIfDue(k)) compactions += 1
      policyReads += timed(policy.keepers().count())
      policyDepths += policy.appendDepth
      control.addAndDedup(b, i.toLong).count()
      if (controlCps.contains(i)) {
        controlReads(i) = timed(control.keepers().count())
        controlDepths(i) = control.appendDepth
      }
    }

    val pr = policyReads.result()
    val pd = policyDepths.result()
    def fmt(d: Double) = graft.JsonNum.fmt(d, 3)
    val line =
      s"""{"probe":"probe_store_policy","n":$n,"budget_s":$budgetS,""" +
      s""""k":$k,"per_batch_cost_s":${
          CompactionPolicy.ProbeStorePerBatchReadCostS},""" +
      s""""compactions":$compactions,""" +
      s""""policy_read_s":[${pr.map(fmt).mkString(",")}],""" +
      s""""policy_depth":[${pd.mkString(",")}],""" +
      s""""control_read_s":{${controlReads.map { case (i, t) =>
          s""""$i":${fmt(t)}""" }.mkString(",")}},""" +
      s""""control_depth":{${controlDepths.map { case (i, d) =>
          s""""$i":$d""" }.mkString(",")}},""" +
      s""""policy_max_depth":${pd.max},""" +
      s""""policy_max_read_s":${fmt(pr.max)},""" +
      s""""policy_median_read_s":${fmt(pr.sorted.apply(pr.size / 2))},""" +
      s""""control_max_read_s":${fmt(controlReads.values.max)}}"""
    spark.stop()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    println(line)
  }
}
