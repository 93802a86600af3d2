package graft

import graft.operators.CrawlOps

/** Laws of crawl-trap / URL-alias detection (CrawlOps.trapTemplates):
  * digit-run templating, the two-sided trap predicate (volume floor AND
  * content-ratio ceiling), and the fixture's clean/trap/guard template
  * triad.
  */
class TrapSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: (String, String, Long)*)
      : Map[(String, String), (Long, Long, Long, Boolean)] = {
    CrawlOps.trapTemplates(rows.toDF("host", "path", "content_key"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
  }

  test("digit runs collapse into one template; counts are distinct-exact") {
    val m = run(
      ("a.com", "/post/12/view/3", 12L),
      ("a.com", "/post/99/view/41", 99L),
      ("a.com", "/post/12/view/3", 12L), // duplicate URL: counted once
      ("a.com", "/about", 7L))
    assert(m(("a.com", "/post/N/view/N")) == ((2L, 2L, 1000L, false)))
    assert(m(("a.com", "/about")) == ((1L, 1L, 1000L, false)))
  }

  test("trap needs BOTH the volume floor and the aliasing ceiling") {
    // 25 calendar URLs all serving content 0 → trap
    val calendar = (0 until 25).map(i => ("c.com", s"/cal/$i", 0L))
    // 25 article URLs with unique content → high volume but clean
    val articles = (0 until 25).map(i => ("c.com", s"/art/$i", 100L + i))
    // 5 session-id aliases of one page → fully aliased but under volume
    val aliases = (0 until 5).map(i => ("c.com", s"/page?sid=$i", 7L))
    val m = run(calendar ++ articles ++ aliases: _*)
    assert(m(("c.com", "/cal/N")) == ((25L, 1L, 40L, true)))
    assert(m(("c.com", "/art/N")) == ((25L, 25L, 1000L, false)))
    assert(m(("c.com", "/page?sid=N")) == ((5L, 1L, 200L, false)))
  }

  test("boundary: exactly 100 permille at the floor volume flags; 101 does not") {
    // 20 URLs, 2 contents → 100‰ → trap (<= ceiling, >= floor)
    val at = (0 until 20).map(i => ("b.com", s"/x/$i", (i % 2).toLong))
    val m1 = run(at: _*)
    assert(m1(("b.com", "/x/N")) == ((20L, 2L, 100L, true)))
    // 19 URLs, 1 content → under the floor → clean
    val under = (0 until 19).map(i => ("b.com", s"/y/$i", 0L))
    val m2 = run(under: _*)
    assert(m2(("b.com", "/y/N"))._4 == false)
  }

  test("fixture: calendar templates trap on every host, articles and the " +
    "small tag space do not") {
    val out = CrawlOps.urlTrapDetection(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(5))))
      .toMap
    (0 until 5).foreach { h =>
      val host = s"h$h.example.com"
      val (calUrls, calContents, calTrap) = out((host, "/cal/N/N"))
      assert(calTrap && calContents == 1L && calUrls >= CrawlOps.TrapMinUrls,
        s"$host calendar")
      val (artUrls, artContents, artTrap) = out((host, "/article/N"))
      assert(!artTrap && artUrls == artContents, s"$host articles")
      val (tagUrls, _, tagTrap) = out((host, "/tag/N"))
      assert(!tagTrap && tagUrls < CrawlOps.TrapMinUrls, s"$host tags")
    }
  }
}
