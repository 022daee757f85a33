package graft.queries

import java.io.File
import java.nio.file.Files

import graft.SparkSuite

/** [[ProbeBudgets]] — the persisted tuned-nprobe artifact: one tuning run
  * per (corpus, family, layout) shared across sessions, keyed by the same
  * corpus fingerprint as the quantizer artifacts it sits beside. */
class ProbeBudgetsSpec extends SparkSuite {

  private def withStore[A](f: File => A): A = {
    val base = Files.createTempDirectory("probe-budget-spec").toFile
    val prev = sys.props.get("graft.artifacts.dir")
    sys.props("graft.artifacts.dir") = base.getAbsolutePath
    try f(base)
    finally prev match {
      case Some(p) => sys.props("graft.artifacts.dir") = p
      case None => sys.props -= "graft.artifacts.dir"
    }
  }

  private def mkCorpus(): File = {
    val d = Files.createTempDirectory("probe-budget-corpus").toFile
    Files.writeString(new File(d, "data.parquet").toPath, "payload-v1")
    d
  }

  test("a new process reads the persisted budget instead of re-tuning") {
    withStore { _ =>
      val corpus = mkCorpus().getAbsolutePath
      var tunes = 0
      def tuned() = ProbeBudgets.tuned(spark, corpus, "knn", 32) {
        tunes += 1; (6, 0.73)
      }
      assert(tuned() == 6)
      assert(tunes == 1)
      // same key, cold memo — exactly a NEW JVM's shape over the shared
      // artifact store: the profile loop must NOT run again
      ProbeBudgets.dropMemo(corpus, "knn", 32)
      assert(tuned() == 6)
      assert(tunes == 1,
        "a fresh process must read the persisted budget, not re-profile")
    }
  }

  test("budgets key on the layout: a different cell count re-tunes") {
    withStore { _ =>
      val corpus = mkCorpus().getAbsolutePath
      var tunes = 0
      assert(ProbeBudgets.tuned(spark, corpus, "knn", 8) {
        tunes += 1; (4, 0.76) } == 4)
      // a grown layout (more cells) is a different artifact — the old
      // budget priced a layout that no longer matches
      assert(ProbeBudgets.tuned(spark, corpus, "knn", 32) {
        tunes += 1; (8, 0.64) } == 8)
      assert(tunes == 2)
      // and the families never share a budget (different metrics)
      assert(ProbeBudgets.tuned(spark, corpus, "triplet", 8) {
        tunes += 1; (6, 0.72) } == 6)
      assert(tunes == 3)
    }
  }

  test("a regenerated corpus re-tunes (fingerprint-keyed like the quantizer)") {
    withStore { _ =>
      val corpusDir = mkCorpus()
      val corpus = corpusDir.getAbsolutePath
      var tunes = 0
      def tuned() = ProbeBudgets.tuned(spark, corpus, "knn", 8) {
        tunes += 1; (4 + tunes, 0.7)
      }
      assert(tuned() == 5)
      val f = new File(corpusDir, "data.parquet")
      Files.writeString(f.toPath, "payload-v2-longer")
      f.setLastModified(f.lastModified() + 10000)
      ProbeBudgets.dropMemo(corpus, "knn", 8)
      assert(tuned() == 6,
        "a regenerated corpus must route to a fresh budget, never serve " +
          "one tuned on the old snapshot")
      assert(tunes == 2)
    }
  }
}
