package graft.tools

import java.nio.file.Files

import graft.ops.{Bm25Index, EdgeIndex, ExactDedupIndex}
import org.apache.spark.sql.SparkSession

/** Measures the UNCOMPACTED-BATCH-COUNT axis of the persisted stores —
  * the degradation curve the maintenance-loop compaction cadence bounds
  * in production but nothing had measured (r12 verdict ask): every
  * batch-dir store read pays per-batch cost until the next compaction —
  * [[EdgeIndex.rawRows]] unions one parquet scan PER batch dir (plan
  * width grows with appends), while the mode("append") stores
  * (exact-dedup, BM25) keep one scan whose FILE COUNT grows (listing +
  * footer reads). This probe appends `n` small batches with NO
  * compaction, times each store's read face at checkpoint counts
  * (median of 3), then compacts and re-times — the post-compact read
  * must return to the small-count floor.
  *
  * Run: `sbt "Test/runMain graft.tools.BatchCountProbe <out.json> [n]"`
  * (test scope beside ScaleUp — a measurement harness, not product
  * code). One JSON line: {"probe":"batch_count","n":N,
  * "checkpoints":[...],"read_s":{store:[...]},"append_s":{store:[...]},
  * "post_compact_s":{store:...}}.
  */
object BatchCountProbe {

  private def median3(f: => Unit): Double = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    ts(1)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/BATCH_COUNT.json")
    val n = args.lift(1).map(_.toInt).getOrElse(200)
    val checkpoints = Seq(1, 25, 50, 100, 150, 200, 300, 400)
      .filter(_ <= n) :+ n
    val cps = checkpoints.distinct.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("batch-count-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("batch-count").toFile.getAbsolutePath
    val edges = new EdgeIndex(spark, s"$root/edges")
    val exact = new ExactDedupIndex(spark, s"$root/exact", "id", "text")
    val bm25 = new Bm25Index(spark, s"$root/bm25", "id", "text")
    val stores = Seq("edges", "exact", "bm25")
    val qs = Seq("q1" -> "alpha beta", "q2" -> "gamma")

    // tiny deterministic batches: 20 edges / 10 docs each, half the doc
    // content drawn from a shared pool so the probe also exercises dup
    // arbitration, not just appends of disjoint rows
    def edgeBatch(i: Int) = (0 until 20)
      .map(j => ((i * 7 + j) % 97L, (i * 3 + j * 11) % 97L)).toDF("src", "dst")
    def docBatch(i: Int) = (0 until 10).map { j =>
      val id = i * 1000L + j
      val text = if (j % 2 == 0) s"alpha beta doc b$i j$j gamma"
      else s"shared pool delta ${(i + j) % 13} epsilon"
      (id, text)
    }.toDF("id", "text")

    def readOnce(store: String): Unit = store match {
      case "edges" => edges.edges().count()
      case "exact" => exact.keepers().count()
      case "bm25"  => bm25.search(qs, 10).count()
    }

    val readS = stores.map(_ -> collection.mutable.ArrayBuffer.empty[Double]).toMap
    val appendS = stores.map(_ -> collection.mutable.ArrayBuffer.empty[Double]).toMap
    var lastAppend = Map.empty[String, Double]
    for (i <- 1 to n) {
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      lastAppend = Map(
        "edges" -> timed(edges.addEdges(edgeBatch(i), i.toLong)),
        "exact" -> timed { exact.addAndDedup(docBatch(i), i.toLong).count(); () },
        "bm25" -> timed(bm25.add(docBatch(i), i.toLong)))
      if (cps.contains(i)) {
        stores.foreach { s =>
          readS(s) += median3(readOnce(s))
          appendS(s) += lastAppend(s)
        }
        System.err.println(f"PROBE batches=$i: " + stores.map(s =>
          f"$s read ${readS(s).last}%.2fs append ${appendS(s).last}%.2fs")
          .mkString(", "))
      }
    }
    val compactS = Map(
      "edges" -> { val t0 = System.nanoTime(); edges.compact()
        (System.nanoTime() - t0) / 1e9 },
      "exact" -> { val t0 = System.nanoTime(); exact.compact()
        (System.nanoTime() - t0) / 1e9 },
      "bm25" -> { val t0 = System.nanoTime(); bm25.compact()
        (System.nanoTime() - t0) / 1e9 })
    val postS = stores.map(s => s -> median3(readOnce(s))).toMap
    def arr(m: Map[String, collection.mutable.ArrayBuffer[Double]]) =
      stores.map(s => "\"" + s + "\":[" +
        m(s).map(v => graft.JsonNum.fmt(v, 3)).mkString(",") + "]").mkString("{", ",", "}")
    def obj(m: Map[String, Double]) =
      stores.map(s => "\"" + s + "\":" + graft.JsonNum.fmt(m(s), 3))
        .mkString("{", ",", "}")
    val line = s"""{"probe":"batch_count","n":$n,"checkpoints":[${
      cps.mkString(",")}],"read_s":${arr(readS)},"append_s":${
      arr(appendS)},"compact_s":${obj(compactS)},"post_compact_read_s":${
      obj(postS)}}"""
    spark.stop()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    println(s"GRAFT_PROBE_JSON: $line")
  }
}
