package graft

import graft.operators.CrawlOps

/** Laws of redirect-chain resolution by path doubling
  * (CrawlOps.resolveRedirects): terminal detection, hop counting, the
  * 2^K coverage boundary, cycle surfacing, and the composed fixture
  * query's block structure.
  */
class RedirectSpec extends SparkTestBase {
  import spark.implicits._

  private def resolve(links: Seq[String], edges: Seq[(String, String)],
      passes: Int = 3): Map[String, (String, Long, Boolean)] = {
    CrawlOps.resolveRedirects(
      links.toDF("link"), "link", edges.toDF("src", "dst"), passes)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("chain resolves to the terminal with exact hop counts") {
    val m = resolve(Seq("a", "b", "c", "d"),
      Seq("a" -> "b", "b" -> "c")) // c terminal; d never redirected
    assert(m("a") == (("c", 2L, true)))
    assert(m("b") == (("c", 1L, true)))
    assert(m("c") == (("c", 0L, true)))
    assert(m("d") == (("d", 0L, true)))
  }

  test("2^K coverage boundary: 8-hop chain resolves at K=3, 9-hop does not") {
    val chain9 = (0 until 9).map(i => s"n${i + 1}" -> s"n$i") // n9→…→n0
    val m = resolve(Seq("n8", "n9"), chain9)
    assert(m("n8") == (("n0", 8L, true)))
    val (f9, h9, ok9) = m("n9")
    assert(!ok9 && f9 != "n0" && h9 <= 8L,
      s"9-hop chain must stay unresolved at K=3, got ($f9, $h9, $ok9)")
    // one more pass covers it
    val m4 = resolve(Seq("n9"), chain9, passes = 4)
    assert(m4("n9") == (("n0", 9L, true)))
  }

  test("cycles surface as resolved=false, never loop") {
    val m = resolve(Seq("x", "y", "z"),
      Seq("x" -> "y", "y" -> "x", "z" -> "x"))
    assert(!m("x")._3 && !m("y")._3 && !m("z")._3)
  }

  test("fixture query: block chains resolve with hops == position; " +
    "every 50th block is an 8-cycle and fully unresolved") {
    val out = CrawlOps.redirectResolution(spark, sf("sf0.001"))
      .collect()
      .map { r =>
        val e = r.getString(0).stripPrefix("https://r.example.com/u").toLong
        e -> ((r.getString(1), r.getLong(2), r.getBoolean(3)))
      }.toMap
    out.foreach { case (e, (fin, hops, ok)) =>
      val block = e / 8
      val pos = e % 8
      if (block % 50 == 0) {
        // 8-cycle: doubling lands exactly 8 ahead = itself, never terminal
        assert(!ok && hops == 8L && fin == s"https://r.example.com/u$e",
          s"cycle member $e")
      } else {
        assert(ok && hops == pos &&
          fin == s"https://r.example.com/u${block * 8}",
          s"chain member $e → ($fin, $hops, $ok)")
      }
    }
  }
}
