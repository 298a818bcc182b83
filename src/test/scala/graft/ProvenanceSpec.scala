package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The dirtiness classifier behind artifact commit stamps: regenerable
  * artifacts rewriting themselves must not flag the tree, source must. */
class ProvenanceSpec extends AnyFunSuite with Matchers {

  test("regenerable artifact modifications are not source dirt") {
    // NOTE the missing leading space on the first line: Provenance.git
    // trims the captured output, so the first porcelain line arrives
    // without its leading status-column padding
    Provenance.isSourceDirt("M scale_r10_10x.json") shouldBe false
    Provenance.isSourceDirt(
      """M scale_r10_10x.json
        | M scale_r10_tail100x.json
        |?? BENCH_r10.json
        | M EXPLAIN.md""".stripMargin) shouldBe false
  }

  test("driver-owned round artifacts are not source dirt (VERDICT r10 #1)") {
    Provenance.isSourceDirt(
      """M LEAKCHECK.json
        |?? CORRECTNESS_r11.json
        |?? BENCH_r11.json
        | M bench_local_full.json
        | M PROGRESS.jsonl
        | M COPYCHECK.json""".stripMargin) shouldBe false
  }

  test("artifact-named files in subdirectories ARE source dirt (ADVICE r10)") {
    Provenance.isSourceDirt("?? docs/EXPLAIN.md") shouldBe true
    Provenance.isSourceDirt(" M tools/scale_probe.json") shouldBe true
    Provenance.isSourceDirt("?? sub/LEAKCHECK.json") shouldBe true
  }

  test("source modifications are dirt, alone or mixed with artifacts") {
    Provenance.isSourceDirt("M src/main/scala/graft/Bench.scala") shouldBe true
    Provenance.isSourceDirt(
      """M scale_r10_10x.json
        | M src/main/scala/graft/operators/Dedup.scala""".stripMargin) shouldBe true
    Provenance.isSourceDirt(" M SCALE.md") shouldBe true
    // a source file merely NAMED like an artifact elsewhere in the tree
    // still counts (the pattern is a path suffix, never a substring)
    Provenance.isSourceDirt("?? src/scale_notes.md") shouldBe true
  }

  test("empty status is clean") {
    Provenance.isSourceDirt("") shouldBe false
    Provenance.isSourceDirt("\n") shouldBe false
  }
}
