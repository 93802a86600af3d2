package graft

import org.apache.spark.sql.functions._

import graft.operators.CrawlOps
import graft.politeness.Scheduler

/** Laws of Hamilton largest-remainder apportionment
  * (Scheduler.hostBudgets): exact budget conservation, the
  * floor-or-ceil quota bound, remainder-ranked tie-breaks, and the
  * composed opic→budget query on the fixture.
  */
class HostBudgetSpec extends SparkTestBase {
  import spark.implicits._

  private def run(budget: Long, rows: (String, Long)*): Map[String, (Long, Long, Long)] = {
    Scheduler.hostBudgets(rows.toDF("host", "mass"), "host", "mass", budget)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("hand case: 3-way split of 10 by masses 5/3/1") {
    // exact shares: 50/9, 30/9, 10/9 → floors 5,3,1 (sum 9), one leftover
    // unit → largest remainder wins: a (5/9) > b (3/9) > c (1/9)
    val m = run(10L, ("a", 5L), ("b", 3L), ("c", 1L))
    assert(m("a") == ((5L, 1L, 6L)))
    assert(m("b") == ((3L, 0L, 3L)))
    assert(m("c") == ((1L, 0L, 1L)))
  }

  test("equal masses: lexicographically smaller hosts win the leftovers") {
    val m = run(10L, ("h1", 1L), ("h2", 1L), ("h3", 1L))
    // each share 10/3 → base 3, sum 9, one leftover; remainders all equal
    // → host asc tie-break gives it to h1
    assert(m("h1") == ((3L, 1L, 4L)))
    assert(m("h2") == ((3L, 0L, 3L)))
    assert(m("h3") == ((3L, 0L, 3L)))
  }

  test("conservation and floor-or-ceil bound on a skewed random mass table") {
    val masses = (0 until 200)
      .map(i => (f"host$i%03d", ((i * 2654435761L) % 9973L) + 1L))
    val budget = 100000L
    val got = run(budget, masses: _*)
    val total = masses.map(_._2).sum
    assert(got.values.map(_._3).sum == budget, "Σquota must equal budget")
    masses.foreach { case (h, mass) =>
      val exactFloor = budget * mass / total
      val (base, extra, quota) = got(h)
      assert(base == exactFloor)
      assert(extra == 0L || extra == 1L)
      assert(quota == exactFloor || quota == exactFloor + 1,
        s"$h quota $quota out of [floor, floor+1]")
    }
    // leftover accounting: number of +1 winners == budget - Σfloor
    assert(got.values.count(_._2 == 1L) ==
      (budget - masses.map { case (_, m) => budget * m / total }.sum))
  }

  test("composed fixture query: budgets conserve and follow host mass order") {
    val out = CrawlOps.hostBudgetAllocation(spark, sf("sf0.001")).collect()
    assert(out.map(_.getLong(4)).sum == CrawlOps.TickFetchBudget)
    // monotone: more mass never gets a smaller quota than less mass,
    // beyond the single leftover unit
    val byMass = out.sortBy(_.getLong(1))
    byMass.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi.getLong(4) >= lo.getLong(4) - 1,
          s"${hi.getString(0)} vs ${lo.getString(0)}")
      case _ =>
    }
  }
}
