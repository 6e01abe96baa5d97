package graft.text

import org.scalatest.funsuite.AnyFunSuite

class PiiScrubSpec extends AnyFunSuite {
  import PiiScrub.scrubString

  test("emails, IPs and phone numbers redact; order prevents partial eats") {
    assert(scrubString("mail me at jane.doe+x@corp.co.uk today")
      == "mail me at <EMAIL> today")
    assert(scrubString("host 192.168.0.1 responded")
      == "host <IP> responded")
    assert(scrubString("call +44 (0)20 7946-0958 now")
      == "call <PHONE> now")
    assert(scrubString("a@b.com 1.2.3.4 +1 555 0100 99")
      == "<EMAIL> <IP> <PHONE>")
  }

  test("clean text passes through untouched") {
    val s = "salary 32000 per annum, 3 days remote, team of 12"
    assert(scrubString(s) == s)
  }
}
