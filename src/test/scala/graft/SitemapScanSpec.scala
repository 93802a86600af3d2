package graft

import graft.operators.ScanOps

/** Laws for the sitemap source scan (ScanOps.sitemapScan): entry
  * cardinality per host, host re-derivation from the parsed loc, lastmod
  * parse/typing consistency, and the per-host recency rank contract.
  */
class SitemapScanSpec extends SparkTestBase {

  private lazy val out = ScanOps.sitemapScan(spark, sf("sf0.001")).collect()

  test("every <url> entry of every host's sitemap becomes one row") {
    // fixture: hosts hnum = 0..6, hnum+3 entries each = 42 rows
    assert(out.length == (0 to 6).map(_ + 3).sum)
    val perHost = out.groupBy(_.getString(0)).map { case (h, rs) =>
      h -> rs.length
    }
    (0 to 6).foreach { hn =>
      assert(perHost(s"h$hn.example.com") == hn + 3)
    }
  }

  test("host is earned from the parsed loc, not the fixture parameter") {
    out.foreach { r =>
      assert(r.getString(1).startsWith(s"https://${r.getString(0)}/"))
    }
  }

  test("lastmod parses to the matching epoch day") {
    out.foreach { r =>
      val expected = java.time.LocalDate.parse(r.getString(2)).toEpochDay
      assert(r.getLong(3) == expected, s"row $r")
    }
  }

  test("recency rank is a dense 1..n per host ordered by lastmod desc") {
    out.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getLong(4))
      assert(ranked.map(_.getLong(4)).toSeq == (1L to rs.length).toSeq)
      // adjacent pairs in rank order: lastmod strictly descending, or
      // equal lastmod with loc ascending
      ranked.sliding(2).foreach {
        case Array(a, b) =>
          val (ma, mb) = (a.getString(2), b.getString(2))
          assert(ma > mb || (ma == mb && a.getString(1) < b.getString(1)),
            s"rank order violated between $a and $b")
        case _ => ()
      }
    }
  }
}
