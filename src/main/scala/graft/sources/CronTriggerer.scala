package graft.sources

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

/** Cron-triggered batch discovery — the BatchSource triggerer pair
  * (reference: pulsar-io/core/.../BatchSource.java discover/read lifecycle;
  * pulsar-io/batch-discovery-triggerers/.../CronTriggerer.java fires
  * discover() on a cron schedule, ImmediateTriggerer.java once at start).
  *
  * Spark mapping: each fire runs a `Trigger.AvailableNow` pass of the batch
  * pipeline. The schedule itself is pure computation (classic 5-field cron:
  * minute hour day-of-month month day-of-week, with lists, ranges, steps and
  * the standard dom/dow OR rule), so it is deterministic and unit-testable;
  * the driver loop is `nextAfter` + sleep + run.
  */
object CronTriggerer {

  /** One parsed cron field as the set of matching values. */
  private def parseField(s: String, min: Int, max: Int): Set[Int] = {
    def rangeOf(part: String): Seq[Int] = {
      val (body, step) = part.split("/") match {
        case Array(b) => (b, 1)
        case Array(b, st) => (b, st.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron part $part")
      }
      val (lo, hi) = body match {
        case "*" => (min, max)
        case r if r.contains("-") =>
          val Array(a, b) = r.split("-"); (a.toInt, b.toInt)
        case v => val x = v.toInt; (x, if (step == 1) x else max)
      }
      require(lo >= min && hi <= max && lo <= hi, s"cron range $part out of [$min,$max]")
      (lo to hi by step)
    }
    s.split(",").toIndexedSeq.flatMap(rangeOf).toSet
  }

  case class Schedule(minutes: Set[Int], hours: Set[Int], dom: Set[Int],
                      months: Set[Int], dow: Set[Int],
                      domRestricted: Boolean, dowRestricted: Boolean) {

    private def dayMatches(t: LocalDateTime): Boolean = {
      val domOk = dom.contains(t.getDayOfMonth)
      val dowOk = dow.contains(t.getDayOfWeek.getValue % 7) // cron: 0=Sunday
      (domRestricted, dowRestricted) match {
        case (true, true) => domOk || dowOk // standard cron OR rule
        case (true, false) => domOk
        case (false, true) => dowOk
        case (false, false) => true
      }
    }

    def matches(t: LocalDateTime): Boolean =
      minutes.contains(t.getMinute) && hours.contains(t.getHour) &&
        months.contains(t.getMonthValue) && dayMatches(t)

    /** First fire time strictly after `t` (minute granularity). */
    def nextAfter(t: LocalDateTime): LocalDateTime = {
      var c = t.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
      val limit = c.plusYears(4) // leap-day worst case bound
      while (!matches(c)) {
        c =
          if (!months.contains(c.getMonthValue))
            c.plusMonths(1).withDayOfMonth(1).truncatedTo(ChronoUnit.DAYS)
          else if (!dayMatches(c))
            c.plusDays(1).truncatedTo(ChronoUnit.DAYS)
          else if (!hours.contains(c.getHour))
            c.plusHours(1).truncatedTo(ChronoUnit.HOURS)
          else c.plusMinutes(1)
        if (c.isAfter(limit))
          throw new IllegalStateException("cron schedule never fires")
      }
      c
    }

    /** All fire times in (from, to] — the triggerer's discover() instants. */
    def fireTimes(from: LocalDateTime, to: LocalDateTime): Seq[LocalDateTime] = {
      val out = Seq.newBuilder[LocalDateTime]
      var c = nextAfter(from)
      while (!c.isAfter(to)) { out += c; c = nextAfter(c) }
      out.result()
    }
  }

  /** The driver loop the Schedule exists for: at each cron fire, run ONE
    * bounded pass — in Spark terms a `Trigger.AvailableNow` streaming query
    * that drains whatever input accumulated since the previous fire and
    * stops (the discover()-then-read() lifecycle of the reference's
    * BatchSource under its CronTriggerer). Clock and sleep are injected so
    * the loop is unit-testable with virtual time and so a driver can hook
    * its own wait primitive; the loop never drifts — the cursor advances
    * fire-to-fire from the SCHEDULE, not from how long a pass took, and a
    * pass overrunning the next fire time causes an immediate (not skipped)
    * next pass.
    *
    * @param runPass   executes one bounded pass; receives the fire instant
    * @param now       clock used once, to anchor the first fire
    * @param sleepUntil blocks until the given instant; the instant may
    *                  already be PAST after an overrunning pass, so a real
    *                  driver sleeps max(0, delta) (virtual time in tests)
    * @param maxFires  stop after this many passes (Int.MaxValue = forever)
    * @param shouldStop polled before each sleep and pass for clean shutdown
    * @return the number of passes run */
  def runLoop(schedule: Schedule, runPass: LocalDateTime => Unit,
              now: () => LocalDateTime,
              sleepUntil: LocalDateTime => Unit,
              maxFires: Int = Int.MaxValue,
              shouldStop: () => Boolean = () => false): Int = {
    var fires = 0
    var cursor = now()
    while (fires < maxFires && !shouldStop()) {
      val at = schedule.nextAfter(cursor)
      sleepUntil(at)
      if (shouldStop()) return fires
      runPass(at)
      fires += 1
      cursor = at
    }
    fires
  }

  /** Parse "m h dom mon dow". */
  def parse(expr: String): Schedule = {
    val f = expr.trim.split("\\s+")
    require(f.length == 5, s"cron needs 5 fields, got ${f.length} in '$expr'")
    Schedule(
      parseField(f(0), 0, 59), parseField(f(1), 0, 23),
      parseField(f(2), 1, 31), parseField(f(3), 1, 12),
      parseField(f(4), 0, 7).map(_ % 7), // 7 ≡ 0 ≡ Sunday
      domRestricted = f(2) != "*", dowRestricted = f(4) != "*")
  }
}
