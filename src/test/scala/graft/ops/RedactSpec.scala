package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSuite {
  import spark.implicits._

  private def scrub(text: String): (String, Long, Long, Long) = {
    val c = Redact.counts(col("text"))
    Seq(text).toDF("text")
      .select(Redact.redact(col("text")),
        c(0).cast("long"), c(1).cast("long"), c(2).cast("long"))
      .as[(String, Long, Long, Long)].head()
  }

  test("each category redacts to its placeholder with counts") {
    assert(scrub("mail a.b+c@test.org now") ==
      (("mail <EMAIL> now", 1L, 0L, 0L)))
    assert(scrub("call 555-867-5309 twice 555-867-5309") ==
      (("call <PHONE> twice <PHONE>", 0L, 2L, 0L)))
    assert(scrub("host 192.168.0.1 and 10.0.0.7") ==
      (("host <IP> and <IP>", 0L, 0L, 2L)))
  }

  test("an email's digit runs never leak into the numeric rules") {
    // the local part embeds both a phone-shaped and an IP-shaped run;
    // email applies first so they vanish with the address
    assert(scrub("x 555-123-4567.10.0.0.1@ex.com y") ==
      (("x <EMAIL> y", 1L, 0L, 0L)))
  }

  test("word boundaries keep longer digit runs intact") {
    // 5 dotted groups: the first four match, the fifth survives
    assert(scrub("v 1.2.3.4.5 w")._1 == "v <IP>.5 w")
    // digits glued to letters are not a phone
    assert(scrub("id555-123-4567x") == (("id555-123-4567x", 0L, 0L, 0L)))
  }

  test("clean text passes through untouched") {
    assert(scrub("no pii here at all") == (("no pii here at all", 0L, 0L, 0L)))
  }
}
