package graft.queries

import java.io.File
import java.nio.file.Files

import graft.SparkSuite

/** The shared link-edge list is a persisted, corpus-fingerprint-keyed
  * artifact: extracted once per corpus snapshot, reused by all four graph
  * queries and by later sessions (no in-process registry — a second
  * process takes the identical found-on-disk path). */
class EdgeArtifactSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("four graph queries share ONE edge build; warm store is reused") {
    val base = Files.createTempDirectory("edge-artifacts").toFile
    val prev = sys.props.get("graft.artifacts.dir")
    sys.props("graft.artifacts.dir") = base.getAbsolutePath
    try {
      val pr = WebQueries.queries("q_pagerank")(spark, sfDir).collect()
      assert(pr.nonEmpty)
      val kindDir = new File(base, "link-edges")
      val committed = kindDir.listFiles().filter(
        f => f.isDirectory && new File(f, "_SUCCESS").exists())
      assert(committed.length == 1, "q_pagerank published the edge artifact")
      val stamp = committed.head.lastModified()

      // the other three graph queries + a re-run all hit the same artifact
      val hits = WebQueries.queries("q_hits")(spark, sfDir).collect()
      val deg = WebQueries.queries("q_degree_dist")(spark, sfDir).collect()
      val rec = WebQueries.queries("q_reciprocal_links")(spark, sfDir).collect()
      val pr2 = WebQueries.queries("q_pagerank")(spark, sfDir).collect()
      assert(hits.nonEmpty && deg.nonEmpty && rec.nonEmpty)
      assert(pr2.toSeq == pr.toSeq, "warm-store rank identical")
      val after = kindDir.listFiles().filter(
        f => f.isDirectory && new File(f, "_SUCCESS").exists())
      assert(after.length == 1 && after.head.lastModified() == stamp,
        "no rebuild: one committed artifact, untouched, across all four " +
          "graph queries — the path a second session takes on a warm store")
    } finally prev match {
      case Some(p) => sys.props("graft.artifacts.dir") = p
      case None => sys.props -= "graft.artifacts.dir"
    }
  }
}
