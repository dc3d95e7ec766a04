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
}
