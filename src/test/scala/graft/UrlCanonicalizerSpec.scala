package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.UrlCanonicalizer._

class UrlCanonicalizerSpec extends AnyFunSuite {

  /** scalatestplus isn't in the offline cache — drive ScalaCheck Gens
    * directly with fixed seeds (deterministic, no wall clock).
    */
  private def forAll[A](gen: Gen[A], n: Int = 300)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  test("north-rule semantics: lowercase host, strip fragment/utm, sort query") {
    assert(canonicalize("HTTPS://WWW.Example.COM/a/b?z=1&a=2#frag") ===
      "https://www.example.com/a/b?a=2&z=1")
    assert(canonicalize("http://Host.com/p?utm_source=x&utm_medium=y&id=3") ===
      "http://host.com/p?id=3")
    assert(canonicalize("https://h.com/p?fbclid=abc&gclid=q&b=1") ===
      "https://h.com/p?b=1")
    assert(canonicalize("https://h.com#only-frag") === "https://h.com/")
    assert(canonicalize("https://h.com:443/x") === "https://h.com/x")
    assert(canonicalize("http://h.com:80/x") === "http://h.com/x")
    assert(canonicalize("https://h.com:8443/x") === "https://h.com:8443/x")
    // path case is preserved; only scheme+host fold
    assert(canonicalize("https://H.com/CaseSensitive/Path") ===
      "https://h.com/CaseSensitive/Path")
    // non-absolute inputs pass through trimmed (total function, never throws)
    assert(canonicalize("  not a url  ") === "not a url")
    assert(canonicalize("") === "")
    assert(canonicalize(null) === null)
    // query with only tracking params drops the '?' entirely
    assert(canonicalize("https://h.com/p?utm_source=x") === "https://h.com/p")
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HtTpS")
    host <- Gen.oneOf("Example.com", "WWW.NEWS.example.ORG", "a.b.c.example")
    path <- Gen.listOfN(2, Gen.alphaNumStr.map(_.take(6))).map(_.mkString("/", "/", ""))
    params <- Gen.listOf(Gen.zip(
      Gen.oneOf("id", "lang", "q", "utm_source", "utm_campaign", "page"),
      Gen.alphaNumStr.map(_.take(4))))
    frag <- Gen.oneOf("", "#x", "#frag-2")
  } yield {
    val q = if (params.isEmpty) "" else
      "?" + params.map { case (k, v) => s"$k=$v" }.mkString("&")
    s"$scheme://$host$path$q$frag"
  }

  test("idempotence: canonicalize(canonicalize(u)) == canonicalize(u)") {
    forAll(urlGen) { u =>
      val once = canonicalize(u)
      assert(canonicalize(once) === once)
    }
  }

  test("canonical form never contains fragments, utm params, or upper-case host") {
    forAll(urlGen) { u =>
      val c = canonicalize(u)
      assert(!c.contains("#"))
      assert(!c.toLowerCase.contains("utm_"))
      assert(hostOf(c) === hostOf(c).toLowerCase)
    }
  }

  test("query-order invariance: permuted params canonicalize identically") {
    val a = canonicalize("https://h.com/p?b=2&a=1&c=3")
    val b = canonicalize("https://h.com/p?c=3&b=2&a=1")
    val c = canonicalize("https://h.com/p?a=1&c=3&b=2")
    assert(a === b)
    assert(b === c)
  }

  test("fixture occurrence-invariance: same article, any dirtiness, one canonical") {
    // FIXTURES.md §2: dirtyUrl varies case/param-order/tracking per
    // OCCURRENCE but canonical identity is ARTICLE-keyed
    for (src <- 0 until 5; g <- 0L until 20L) {
      val canon = (0L until 6L)
        .map(k => canonicalize(graft.model.Fixtures.dirtyUrl(src, g, k)))
        .distinct
      assert(canon.size === 1, s"src=$src g=$g: $canon")
    }
  }

  test("hostOf / pathOf decompose canonical urls") {
    assert(hostOf("https://news.example.com/a/b?x=1") === "news.example.com")
    assert(pathOf("https://news.example.com/a/b?x=1") === "/a/b")
    assert(pathOf("https://news.example.com") === "/")
    assert(hostOf("https://h.com:8443/x") === "h.com")
  }
}
