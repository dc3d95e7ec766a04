package graft

import org.scalatest.funsuite.AnyFunSuite

/** Format invariants of Bench's machine-parsed output lines — no Spark
  * session needed. */
class BenchFormatSpec extends AnyFunSuite {

  test("families subtotal line stays ≤300 chars at pessimistic values") {
    // every family at 999.999 s (45x the largest subtotal ever observed;
    // a 4-digit family subtotal would mean the bench run itself is
    // broken) — the truncation-insurance guarantee must survive family
    // additions, so this fails the build BEFORE a long line can cost the
    // driver its family forensics again (the BENCH_r08 failure mode)
    val worst = Bench.familiesLine("0.1",
      Queries.families.map { case (f, _) => f -> 999.999 }.toMap)
    assert(worst.length <= 300, s"${worst.length} chars: $worst")
    // and it parses as one JSON object with every family present
    assert(worst.startsWith("""{"metric":"families","sf":0.1,"t":{"""))
    Queries.families.foreach { case (f, _) =>
      assert(worst.contains("\"" + f + "\":999.999"), f)
    }
  }

  test("slowest-queries line stays ≤300 chars at pessimistic values") {
    // the longest query names in the registry at 999.999 s each — the
    // worst input the real suite could ever produce (longer names would
    // grow it, so the bound re-checks itself as queries are added). The
    // insurance fold may shed a couple of tail entries at THESE values;
    // it must keep most of the K and never break the bound.
    val longest = Queries.all.map(_.name).sortBy(n => (-n.length, n))
      .take(Bench.SlowestK).map(_ -> 999.999)
    val worst = Bench.slowestLine("0.1", longest)
    assert(worst.length <= 300, s"${worst.length} chars: $worst")
    assert(worst.startsWith("""{"metric":"slowest","sf":0.1,"t":{"""))
    assert(longest.count { case (n, _) =>
      worst.contains("\"" + n + "\":999.999") } >= Bench.SlowestK - 2)
    // realistic-name shape keeps all K
    val typical = (1 to Bench.SlowestK)
      .map(i => f"q_typical_query_name_$i%02d" -> 99.999)
    val full = Bench.slowestLine("0.1", typical)
    assert(full.length <= 300)
    assert(typical.forall { case (n, _) => full.contains("\"" + n + "\"") })
    // ordering + failure handling: sorts by seconds desc, drops -1s
    val line = Bench.slowestLine("0.1",
      Seq("a" -> 1.0, "b" -> 3.0, "c" -> -1.0, "d" -> 2.0))
    assert(line ===
      """{"metric":"slowest","sf":0.1,"t":{"b":3.000,"d":2.000,"a":1.000}}""")
  }
}
