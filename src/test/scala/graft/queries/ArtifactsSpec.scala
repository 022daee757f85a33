package graft.queries

import java.io.File
import java.nio.file.Files

import graft.SparkSuite

/** [[Artifacts]] — the persisted, fingerprint-keyed artifact store: one
  * build per corpus snapshot shared across sessions, staleness detection on
  * corpus regeneration, lock-free nested builds, and maintenance reaping. */
class ArtifactsSpec extends SparkSuite {
  import spark.implicits._

  private def withStore[A](f: File => A): A = {
    val base = Files.createTempDirectory("artifacts-spec").toFile
    val prev = sys.props.get("graft.artifacts.dir")
    sys.props("graft.artifacts.dir") = base.getAbsolutePath
    try f(base)
    finally prev match {
      case Some(p) => sys.props("graft.artifacts.dir") = p
      case None => sys.props -= "graft.artifacts.dir"
    }
  }

  private def mkCorpus(): File = {
    val d = Files.createTempDirectory("artifacts-corpus").toFile
    Files.writeString(new File(d, "data.parquet").toPath, "payload-v1")
    d
  }

  test("one build per corpus snapshot, reused by later calls (and processes)") {
    withStore { _ =>
      val corpus = mkCorpus()
      var builds = 0
      def read() = Artifacts.materialized(spark, corpus.getAbsolutePath, "t") {
        builds += 1
        Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      }
      assert(read().count() == 2)
      assert(read().count() == 2)
      // no in-process registry exists, so the second call took the same
      // path a brand-new JVM would: found the committed artifact on disk
      assert(builds == 1, "second call must reuse the committed artifact")
    }
  }

  test("regenerated corpus at the same path routes to a fresh artifact") {
    withStore { _ =>
      val corpus = mkCorpus()
      var builds = 0
      def read() = Artifacts.materialized(spark, corpus.getAbsolutePath, "t") {
        builds += 1
        Seq((builds.toLong, "x")).toDF("id", "v")
      }
      assert(read().as[(Long, String)].collect().toSeq == Seq((1L, "x")))
      // driver regenerates testdata in place: same file name, new content
      val f = new File(corpus, "data.parquet")
      Files.writeString(f.toPath, "payload-v2-longer")
      f.setLastModified(f.lastModified() + 10000)
      assert(read().as[(Long, String)].collect().toSeq == Seq((2L, "x")),
        "stale artifact served after the corpus changed")
      assert(builds == 2)
    }
  }

  test("nested builds (artifact depending on another artifact) take no lock") {
    withStore { _ =>
      val corpus = mkCorpus()
      val d = corpus.getAbsolutePath
      def pairs = Artifacts.materialized(spark, d, "pairs")(
        Seq((1L, 2L)).toDF("a", "b"))
      val derived = Artifacts.materialized(spark, d, "cc") {
        pairs.selectExpr("a as id", "b as component")
      }
      assert(derived.count() == 1)
      assert(pairs.count() == 1)
    }
  }

  test("reapExcept keeps live snapshots, drops stale ones and tmp orphans") {
    withStore { base =>
      val live = mkCorpus()
      val stale = mkCorpus()
      Artifacts.materialized(spark, live.getAbsolutePath, "t")(
        Seq(1L).toDF("id"))
      Artifacts.materialized(spark, stale.getAbsolutePath, "t")(
        Seq(2L).toDF("id"))
      // a crashed build's orphan
      val orphan = new File(new File(base, "t"), ".tmp-deadbeef-crashed")
      orphan.mkdirs()
      Artifacts.reapExcept(Seq(live.getAbsolutePath))
      val left = new File(base, "t").listFiles().map(_.getName).toSet
      assert(left ==
        Set(Artifacts.corpusFingerprint(live.getAbsolutePath)),
        s"reap left $left")
      // the surviving artifact still reads
      assert(Artifacts.materialized(spark, live.getAbsolutePath, "t")(
        sys.error("must not rebuild")).count() == 1)
    }
  }
}
