package graft.props

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Invariants of the event-analytics queries on randomized event logs:
  * funnel monotonicity, cohort sanity, and a sequential-model equality
  * for the ordered funnel. */
class EventAnalyticsProperties extends SparkSuite {
  import spark.implicits._

  private def randomEvents(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    val types = Seq("view", "click", "purchase", "signup", "error")
    (1 to n).map { i =>
      (rnd.nextInt(40).toLong, types(rnd.nextInt(types.length)),
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(1 << 28).toLong))
    }
  }

  /** Sequential reference for the strict-order funnel. */
  private def modelFunnel(ev: Seq[(Long, String, java.sql.Timestamp)])
      : (Long, Long, Long) = {
    val byUser = ev.groupBy(_._1)
    def firstAfter(u: Seq[(Long, String, java.sql.Timestamp)], t: String,
                   after: Long): Option[Long] =
      u.filter(e => e._2 == t && e._3.getTime > after)
        .map(_._3.getTime).minOption
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.values.foreach { u =>
      val t1 = u.filter(_._2 == "view").map(_._3.getTime).minOption
      t1.foreach { v =>
        nv += 1
        firstAfter(u, "click", v).foreach { c =>
          nc += 1
          if (firstAfter(u, "purchase", c).isDefined) np += 1
        }
      }
    }
    (nv, nc, np)
  }

  private def runFunnel(df: org.apache.spark.sql.DataFrame)
      : (Long, Long, Long) = {
    val v = df.where($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val c = df.where($"event_type" === "click").join(v, "user_id")
      .where($"ts" > $"t1").groupBy($"user_id").agg(min($"ts").as("t2"))
    val p = df.where($"event_type" === "purchase").join(c, "user_id")
      .where($"ts" > $"t2").groupBy($"user_id").agg(min($"ts").as("t3"))
    (v.count(), c.count(), p.count())
  }

  test("funnel equals the sequential model and is monotone") {
    for (seed <- Seq(2L, 19L, 77L)) {
      val ev = randomEvents(seed, 400)
      val got = runFunnel(ev.toDF("user_id", "event_type", "ts"))
      assert(got == modelFunnel(ev), s"seed=$seed")
      assert(got._1 >= got._2 && got._2 >= got._3, s"monotonicity seed=$seed")
    }
  }

  test("cohort retention: offsets non-negative, cells bounded by cohort size") {
    val ev = randomEvents(31L, 600).toDF("user_id", "event_type", "ts")
    val wk = (unix_millis($"ts") / lit(86400000L) / lit(7L)).cast("long")
    val signup = ev.where($"event_type" === "signup")
      .groupBy($"user_id").agg(min(wk).as("cohort_wk"))
    val cohortSizes = signup.groupBy($"cohort_wk")
      .agg(countDistinct($"user_id").as("sz"))
      .as[(Long, Long)].collect().toMap
    val cells = ev.where($"event_type" =!= "signup")
      .select($"user_id", wk.as("act_wk"))
      .join(signup, "user_id")
      .where($"act_wk" >= $"cohort_wk")
      .groupBy($"cohort_wk", ($"act_wk" - $"cohort_wk").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_active"))
      .as[(Long, Long, Long)].collect()
    assert(cells.nonEmpty)
    cells.foreach { case (cw, off, n) =>
      assert(off >= 0, s"negative offset $off")
      assert(n <= cohortSizes(cw), s"cell ($cw,$off) exceeds cohort")
    }
  }
}
