package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analyze.TokenFunctions._

class TokenFunctionsSpec extends AnyFunSuite {

  test("url variants: host, host:port, path combos") {
    val v = urlVariants("http://Example.com:8080/a/b/c?q=1")
    assert(v.contains("http://example.com:8080/a/b/c?q=1"))
    assert(v.contains("example.com"))
    assert(v.contains("example.com:8080"))
    // the port rides on every downstream combo (reference Util.java:248-305)
    assert(v.contains("example.com:8080/a"))
    assert(v.contains("a/b"))
    assert(v.contains("example.com:8080/a/b/c"))
    assert(urlVariants("example.com/x").contains("example.com"))
    assert(urlVariants(null).isEmpty)
  }

  test("path variants: components and adjacent pairs") {
    val v = pathVariants("C:\\Users\\Bob\\file.txt")
    assert(v.contains("c:\\users\\bob\\file.txt"))
    assert(v.contains("c:") && v.contains("users") && v.contains("bob") && v.contains("file.txt"))
    assert(v.contains("users\\bob") && v.contains("bob\\file.txt"))
  }

  test("ip variants: full + /24 prefix; rejects non-ips") {
    assert(ipVariants("10.1.2.3") == Seq("10.1.2.3", "10.1.2"))
    assert(ipVariants("999.1.2.3").isEmpty)
    assert(ipVariants("not an ip").isEmpty)
  }

  test("urldecode/urlencode round trip; base64decode") {
    assert(urldecode("a%20b%2Fc") == Seq("a b/c"))
    assert(urlencode("a b/c") == Seq("a+b%2Fc"))
    assert(urldecode(urlencode("héllo wörld").head) == Seq("héllo wörld"))
    assert(base64decode(java.util.Base64.getEncoder.encodeToString("hi there".getBytes("UTF-8"))) == Seq("hi there"))
    assert(base64decode("!!!notbase64!!!").isEmpty)
  }

  test("pathWithUrlencode decodes %5c separators") {
    val v = pathUrlencodedVariants("c%3A%5Cusers%5Cbob")
    assert(v.contains("c:") && v.contains("users") && v.contains("bob"))
  }

  test("blacklist filter: exact 1-in-N sampling counts (FilterFunctionTest style)") {
    // precision=0: drop all blacklisted
    val f0 = new BlacklistFilter(Set("the"), 0)
    assert((1 to 100).count(_ => f0("the")) == 0)
    assert((1 to 100).count(_ => f0("ok")) == 100)
    // precision=10: exactly 1 in 10 occurrences passes, deterministically
    val f10 = new BlacklistFilter(Set("the"), 10)
    val passed = (1 to 10000).count(_ => f10("the"))
    assert(passed == 1000, s"got $passed")
    // the 5th, 15th, 25th... occurrence is the one that passes
    val f2 = new BlacklistFilter(Set("x"), 10)
    val pattern = (1 to 20).map(_ => f2("x"))
    assert(pattern.zipWithIndex.filter(_._1).map(_._2 + 1) == Seq(5, 15))
  }

  test("regex check") {
    val hex = regexCheck("[0-9a-f]+")
    assert(hex("deadbeef") && !hex("xyz") && !hex(null))
  }

  test("split") {
    assert(split("\\|\\|")("a||b||c") == Seq("a", "b", "c"))
    assert(split(",")(null).isEmpty)
  }
}
