package graft

import graft.functions.PiiScrub
import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel spec for the PII scrubber (no Spark session needed). */
class PiiScrubSpec extends AnyFunSuite {

  test("masks each type with typed placeholders and exact counts") {
    val s = PiiScrub.scrub(
      "reach me at jane.doe+spam@mail.example.org or call 415-555-0199 from 192.168.1.254 thanks")
    assert(s.clean == "reach me at <EMAIL> or call <PHONE> from <IP> thanks")
    assert((s.n_email, s.n_phone, s.n_ip) == ((1, 1, 1)))
  }

  test("counts multiple hits of the same type") {
    val s = PiiScrub.scrub("a@b.co c@d.io and 10.0.0.1 10.0.0.2 10.0.0.3")
    assert(s.n_email == 2 && s.n_ip == 3 && s.n_phone == 0)
    assert(s.clean == "<EMAIL> <EMAIL> and <IP> <IP> <IP>")
  }

  test("plain prose passes through untouched") {
    val t = "the quick brown fox jumps over the lazy dog"
    val s = PiiScrub.scrub(t)
    assert(s.clean eq t) // zero-hit path returns the SAME instance (no copy)
    assert((s.n_email, s.n_phone, s.n_ip) == ((0, 0, 0)))
  }

  test("idempotent: a second pass is a no-op") {
    val once = PiiScrub.scrub("mail x@y.de call 212-555-0100 ip 8.8.8.8")
    val twice = PiiScrub.scrub(once.clean)
    assert(twice.clean == once.clean)
    assert((twice.n_email, twice.n_phone, twice.n_ip) == ((0, 0, 0)))
  }

  test("sequential masking: digits inside an email are not re-matched") {
    // the local part looks phone-ish; email masking must consume it first
    val s = PiiScrub.scrub("buy from 415-555-0123@example.com now")
    assert(s.clean == "buy from <EMAIL> now")
    assert((s.n_email, s.n_phone, s.n_ip) == ((1, 0, 0)))
  }

  test("word boundaries: longer digit runs do not match the phone pattern") {
    val s = PiiScrub.scrub("order 1234-567-89012 end")
    // \b[0-9]{3}- cannot start mid-digit-run, so no partial phone match
    assert((s.n_email, s.n_phone, s.n_ip) == ((0, 0, 0)))
    assert(s.clean == "order 1234-567-89012 end")
  }

  test("documented tradeoff: a dotted version string matches the IPv4 prefix") {
    // \b holds between digit and '.', so the portable (no-lookaround) regex
    // takes the first four octets of 1.2.3.4.5 — same in Java and RE2,
    // which is the property the oracle parity depends on
    val s = PiiScrub.scrub("v 1.2.3.4.5 end")
    assert(s.n_ip == 1 && s.clean == "v <IP>.5 end")
  }

  test("null text is PII-free, not an NPE") {
    val s = PiiScrub.scrub(null)
    assert(s.clean == null && s.n_email == 0 && s.n_phone == 0 && s.n_ip == 0)
  }
}
