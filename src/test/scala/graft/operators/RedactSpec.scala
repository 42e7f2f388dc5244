package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hand-written PII cases for the redaction cascade: real emails /
  * IPv4s / long digit runs are replaced, lookalikes survive, and the
  * per-stage counts report what each stage actually redacted. */
class RedactSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def run(text: String): (Int, Int, Int, String) = {
    import s.implicits._
    val r = Redact.redactPii(Seq(text).toDF("text"))
      .select("n_email", "n_ip", "n_num", "text_redacted")
      .collect().head
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("email, IP, and long digit run are each replaced") {
    assert(run("mail john.doe+x@sub.example.org now") ===
      ((1, 0, 0, "mail <EMAIL> now")))
    assert(run("server 192.168.0.1 up") === ((0, 1, 0, "server <IP> up")))
    assert(run("card 4111222233334444 leaked") ===
      ((0, 0, 1, "card <NUM> leaked")))
  }

  test("lookalikes survive: short versions, no-TLD at-sign, 8 digits") {
    val t = "v 1.2.3 ping no@tld or 12345678 stay"
    assert(run(t) === ((0, 0, 0, t)))
  }

  test("per-stage counts never double-count: digits inside an email " +
      "are redacted as the email, not again as a number") {
    assert(run("a@123456789012.com") === ((1, 0, 0, "<EMAIL>")))
  }

  test("multiple matches all fall in one pass") {
    assert(run("x@a.de y@b.fr 10.0.0.1 10.0.0.2 123456789 987654321123") ===
      ((2, 2, 2, "<EMAIL> <EMAIL> <IP> <IP> <NUM> <NUM>")))
  }
}
