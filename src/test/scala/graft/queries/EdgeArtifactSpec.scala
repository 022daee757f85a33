package graft.queries

import java.io.File
import java.nio.file.Files

import graft.SparkSuite

/** The shared link-edge list is a persisted, corpus-fingerprint-keyed
  * APPENDABLE store ([[graft.ops.EdgeIndex]]): crawl batches append their
  * edge deltas, the build is completeness-marked after the last append +
  * compact, and all four graph queries — and later sessions — read the
  * same compacted union with no rebuild (no in-process registry; a
  * second process takes the identical found-on-disk path). */
class EdgeArtifactSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("appended store equals full rebuild; four graph queries share it") {
    val base = Files.createTempDirectory("edge-artifacts").toFile
    val prev = sys.props.get("graft.artifacts.dir")
    sys.props("graft.artifacts.dir") = base.getAbsolutePath
    try {
      val pr = WebQueries.queries("q_pagerank")(spark, sfDir).collect()
      assert(pr.nonEmpty)
      val kindDir = new File(base, "link-edge-index")
      val stores = kindDir.listFiles().filter(_.isDirectory)
      assert(stores.length == 1, "q_pagerank published ONE edge store")
      val marker = new File(stores.head, "_complete")
      assert(marker.exists(), "the build is completeness-marked")
      val stamp = marker.lastModified()
      def genListing() = stores.head.listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
        .map(f => (f.getName, f.lastModified())).sortBy(_._1).toSeq
      val gens = genListing()

      // the appended (two crawl batches + compact) store holds EXACTLY
      // the one-shot rebuild's edge set
      import spark.implicits._
      val idx = new graft.ops.EdgeIndex(spark, stores.head.getAbsolutePath)
      val got = idx.edges().as[(Long, Long)].collect().toSet
      val want = WebQueries
        .linkEdges(graft.core.Tables.documents(spark, sfDir))
        .distinct().as[(Long, Long)].collect().toSet
      assert(got == want, "appended union must equal the full rebuild")

      // the other three graph queries + a re-run all hit the same store
      val hits = WebQueries.queries("q_hits")(spark, sfDir).collect()
      val deg = WebQueries.queries("q_degree_dist")(spark, sfDir).collect()
      val rec = WebQueries.queries("q_reciprocal_links")(spark, sfDir).collect()
      val pr2 = WebQueries.queries("q_pagerank")(spark, sfDir).collect()
      assert(hits.nonEmpty && deg.nonEmpty && rec.nonEmpty)
      assert(pr2.toSeq == pr.toSeq, "warm-store rank identical")
      assert(marker.lastModified() == stamp && genListing() == gens,
        "no rebuild: one marked store, generations untouched, across all " +
          "four graph queries — the path a second session takes warm")
    } finally prev match {
      case Some(p) => sys.props("graft.artifacts.dir") = p
      case None => sys.props -= "graft.artifacts.dir"
    }
  }
}
