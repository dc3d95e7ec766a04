package graft

import graft.functions.Vader
import graft.operators.TextAnalytics

/** Hand-computed fixtures for the VADER-faithful compound scorer over the
  * embedded lexicon (fast=0.75, slow=-0.75, big=0.25, …). Every expected
  * value below is computed by hand from the published constants:
  * compound = round₄(s / √(s² + 15)) — 4 dp, exactly vaderSentiment's
  * `round(compound, 4)` — with s assembled per the rules in
  * graft.functions.Vader's scaladoc (B=0.293, C=0.733, N=-0.74).
  */
class VaderSpec extends SparkSpec {
  import spark.implicits._

  private def check(text: String, expected: Double): Unit =
    assert(Vader.compound(text) === expected, s"for '$text'")

  test("plain lexicon hit normalizes with s/sqrt(s^2+15)") {
    check("fast", 0.1901)             // s = 0.75
    check("slow", -0.1901)            // s = -0.75
    check("fast fast", 0.3612)        // s = 1.5
    check("", 0.0)
    check("unknown words only", 0.0)
  }

  test("negation window flips with N_SCALAR = -0.74") {
    check("not fast", -0.1419)        // s = 0.75 * -0.74
    check("not slow", 0.1419)
    check("never was fast", -0.1419)  // negator 2 tokens back
    check("least fast", -0.1419)      // the "least" rule
    check("at least fast", 0.1901)    // "at least" exempt
    // _least_check runs AFTER the booster loop: s = (0.75 + 0.293·0.95)
    // then ×-0.74 (flipping first would sign-match the booster wrongly)
    check("extremely least fast", -0.1928)
  }

  test("never so/this amplifies x1.25 instead of negating") {
    // s = (0.75 + 0.293 booster for "so") * 1.25 = 1.30375
    check("never so fast", 0.3190)
    // s = -0.75 * 1.25 = -0.9375 ("this" is no booster)
    check("never this slow", -0.2353)
  }

  test("without doubt is neutral (negation carve-out)") {
    // "fast" keeps +0.75 (the carve-out suppresses the distance-2 negation);
    // "doubt" itself scores −0.125 (round-8 lexicon) and IS negated by the
    // adjacent "without" (the carve-out only guards the word after "doubt"):
    // s = 0.75 + (−0.125 · −0.74) = 0.8425
    check("without doubt fast", 0.2126)
    check("without pause fast", -0.1419)  // control: "without" still negates
  }

  test("booster dictionary with distance damping") {
    check("very fast", 0.2600)        // s = 0.75 + 0.293
    check("very very fast", 0.3229)   // s = 0.75 + 0.293 + 0.293*0.95
    check("slightly fast", 0.1172)    // s = 0.75 - 0.293 = 0.457
  }

  test("ALL-CAPS emphasis only under mixed case") {
    check("FAST code", 0.3576)        // s = 0.75 + 0.733 (cap differential)
    check("FAST FAST", 0.3612)        // all-caps text: no boost, s = 1.5
  }

  test("punctuation emphasis and but-clause") {
    check("fast!!", 0.3257)           // s = 0.75 + 2*0.292
    check("fast??", 0.2755)           // s = 0.75 + 2*0.18
    check("slow but fast", 0.1901)    // s = -0.75*0.5 + 0.75*1.5 = 0.75
  }

  test("widened lexicon terms score through every rule") {
    check("good", 0.0964)              // s = 0.375 (3/8 tier)
    check("amazing", 0.128)            // s = 0.5
    check("outstanding", 0.1593)       // s = 0.625 (strongest tier)
    check("terrible", -0.0964)         // s = -0.375
    check("very good", 0.17)           // s = 0.375 + 0.293 booster
    check("not good", -0.0715)         // s = 0.375 * -0.74
    // but-clause over widened terms: s = 0.375*0.5 - 0.375*1.5 = -0.375
    check("good but terrible", -0.0964)
  }

  test("round-9 widened terms score through the standard rules") {
    check("priceless", 0.128)          // s = 0.5
    check("stupendous", 0.1593)        // s = 0.625 (strongest tier)
    check("dire", -0.128)              // s = -0.5
    check("bottleneck", -0.0323)       // s = -0.125; sqrt(15.015625) = 3.875
    check("very sturdy", 0.17)         // s = 0.375 + 0.293 booster
    check("not priceless", -0.0951)    // s = 0.5 * -0.74
    // round-9b derived forms and interjections
    check("happiness", 0.0964)         // s = 0.375 (noun of happy's family)
    check("yay", 0.0964)               // s = 0.375 interjection
    check("sucks", -0.0964)            // s = -0.375
    check("not happiness", -0.0715)    // s = 0.375 * -0.74
  }

  test("q_sentiment_vader emits its in-range contract for every document") {
    // the query output is the bounded check (doc_id, vader_in_range) since
    // round 9 — all flags 1 on the fixture, one row per document
    val out = TextAnalytics.qSentimentVader.run(spark, fixtureDir)
      .as[(Long, Long)].collect().toMap
    assert(out.size === SparkSpec.fixtureDocs.size)
    assert(out.values.forall(_ == 1L))
    // the raw compounds stay pinned through the function itself:
    // doc 0 "fast fast slow": s = 0.75 + 0.75 - 0.75 = 0.75
    assert(Vader.compound("fast fast slow") === 0.1901)
    // doc 2 "slow slow slow big": s = -0.75*3 + 0.25 = -2.0
    assert(Vader.compound("slow slow slow big") === -0.4588)
  }
}
