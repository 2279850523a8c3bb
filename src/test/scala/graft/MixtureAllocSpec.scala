package graft

import org.apache.spark.sql.functions._
import graft.operators.MixtureAlloc

/** Closed-form waterfill (q191) vs an independent iterative fixed-point
  * reference: the operator decides caps with a one-pass prefix-sum rule;
  * the reference iterates T = (B − Σ_C cap)/Σ_~C p in exact integer
  * arithmetic until the capped set stabilizes. Agreement across seeded
  * random instances certifies the prefix rule's exchange argument. */
class MixtureAllocSpec extends SparkSpec {
  import spark.implicits._

  private case class Dom(name: String, p: Long, cap: Long)

  /** Iterative exact waterfill: returns (cappedSet, allocByName). */
  private def refWaterfill(doms: Seq[Dom], budget: Long): (Set[String], Map[String, Long]) = {
    var capped = Set.empty[String]
    var stable = false
    while (!stable) {
      val c = doms.filter(d => capped(d.name)).map(_.cap).sum
      val prem = doms.filterNot(d => capped(d.name)).map(_.p).sum
      // capped ⇔ cap < p·T, T = (B − c)/prem, cross-multiplied exactly
      val next = doms.filter(d => prem > 0 && d.cap * prem < d.p * (budget - c))
        .map(_.name).toSet ++ capped
      stable = next == capped
      capped = next
    }
    val c = doms.filter(d => capped(d.name)).map(_.cap).sum
    val prem = doms.filterNot(d => capped(d.name)).map(_.p).sum
    val alloc = doms.map { d =>
      d.name -> (if (capped(d.name)) d.cap
                 else d.p * (budget - c) / prem)
    }.toMap
    (capped, alloc)
  }

  private def run(doms: Seq[Dom], budget: Long): Map[String, (Boolean, Long)] =
    MixtureAlloc.waterfill(
        doms.map(d => (d.name, d.p, d.cap)).toDF("domain", "p", "cap"),
        budget)
      .collect()
      .map(r => r.getString(0) -> (r.getBoolean(3), r.getLong(4))).toMap

  test("no cap binds: pure proportional floor allocation") {
    val doms = Seq(Dom("a", 1, 1000000), Dom("b", 2, 1000000), Dom("c", 3, 1000000))
    val got = run(doms, 601)
    assert(got === Map("a" -> (false, 100L), "b" -> (false, 200L), "c" -> (false, 300L)))
  }

  test("everything caps when the budget exceeds total availability") {
    val doms = Seq(Dom("a", 1, 10), Dom("b", 5, 20))
    val got = run(doms, 1000)
    assert(got === Map("a" -> (true, 10L), "b" -> (true, 20L)))
  }

  test("hand-computed mixed case: surplus redistributes to the uncapped") {
    val doms = Seq(Dom("a", 1, 10), Dom("b", 1, 1000))
    val got = run(doms, 100)
    // a caps at 10; b absorbs the rest of the budget
    assert(got === Map("a" -> (true, 10L), "b" -> (false, 90L)))
  }

  test("closed form agrees with the iterative fixed point on seeded random instances") {
    val rnd = new scala.util.Random(191)
    (1 to 40).foreach { trial =>
      val n = 2 + rnd.nextInt(7)
      val doms = (0 until n).map(i =>
        Dom(s"d$i", 1L + rnd.nextInt(5), 1L + rnd.nextInt(5000)))
      val totalCap = doms.map(_.cap).sum
      val budget = math.max(1L, (totalCap * (0.2 + 0.7 * rnd.nextDouble())).toLong)
      val got = run(doms, budget)
      val (refCapped, refAlloc) = refWaterfill(doms, budget)
      doms.foreach { d =>
        assert(got(d.name)._1 === refCapped(d.name),
          s"trial $trial: capped mismatch on $d (budget $budget, doms $doms)")
        assert(got(d.name)._2 === refAlloc(d.name),
          s"trial $trial: alloc mismatch on $d (budget $budget, doms $doms)")
      }
      // global feasibility: never overdraw, never exceed a cap
      assert(got.values.map(_._2).sum <= budget)
      doms.foreach(d => assert(got(d.name)._2 <= d.cap))
    }
  }
}
