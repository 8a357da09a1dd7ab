package graft

/** Structural cap on bench creep: every inventory query must finish
  * within a per-query budget at sf0.01 on the 4-core test session, and
  * the whole inventory within a total budget. Round 2's regression
  * (single queries drifting 6-17x between rounds) would have been caught
  * here before a driver run ever saw it. Budgets are deliberately loose —
  * ~5x the observed values — so machine noise cannot flake the suite
  * while an accidental quadratic (or a lost broadcast, or a cache leak
  * compounding across the loop) still fails it.
  */
class BenchBudgetSpec extends SparkTestBase {

  private val perQueryBudgetSec = 12.0
  private val totalBudgetSec = 180.0

  test(s"every query stays under ${perQueryBudgetSec}s at sf0.01 " +
    s"(total under ${totalBudgetSec}s)") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(dir).isDirectory, "sf0.01 testdata not present")
    val times = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = times.map(_._2).sum
    val worst = times.sortBy(-_._2).take(5)
      .map { case (n, s) => f"$n=$s%.2fs" }.mkString(", ")
    info(f"total ${total}%.1fs over ${times.size} queries; slowest: $worst")
    val over = times.filter(_._2 > perQueryBudgetSec)
    assert(over.isEmpty,
      s"per-query budget exceeded: ${over.map { case (n, s) =>
        f"$n=$s%.2fs" }.mkString(", ")}")
    assert(total <= totalBudgetSec,
      f"inventory total $total%.1fs exceeds ${totalBudgetSec}s budget")
  }
}
