package graft

/** Run provenance stamped into every generated artifact (VERDICT r8 #4,
  * driver ADVICE r7): a committed-but-stale artifact copy and a fresh
  * re-run are otherwise indistinguishable. Never fails a run — git being
  * unavailable degrades to "unknown". */
object Provenance {

  private def git(args: String*): Option[String] =
    try {
      val p = new ProcessBuilder(("git" +: args): _*)
        .directory(new java.io.File(sys.props.getOrElse("user.dir", ".")))
        .redirectErrorStream(true)
        .start()
      val out = new String(p.getInputStream.readAllBytes()).trim
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: Exception => None }

  /** Short commit of the tree that produced the run, "-dirty" suffixed
    * when uncommitted changes were present (an artifact generated from a
    * dirty tree is NOT reproducible from its commit alone).
    *
    * Regenerable artifacts (`scale_*.json`, `BENCH*.json`, `EXPLAIN.md`,
    * `bench_local_full.json`) are excluded from the dirtiness check:
    * re-running a generator rewrites its own tracked output, so counting
    * those modifications made every in-tree regeneration permanently
    * "-dirty" (VERDICT r9 What's-wrong #3). Driver-owned per-round
    * artifacts (`CORRECTNESS_r*.json`, `LEAKCHECK.json`, `COPYCHECK.json`,
    * `PROGRESS.jsonl`) are excluded for the same reason — the driver
    * rewrites them around our runs (VERDICT r10 missing #1). The stamp
    * exists to flag unreproducible SOURCE, not an artifact being
    * refreshed. */
  // Anchored to the whole porcelain line: status columns (1–2 chars after
  // git()'s trim strips the first line's leading space), whitespace, then a
  // ROOT-LEVEL path — no '/' allowed, so `docs/EXPLAIN.md` or any nested
  // file with an artifact-like name still counts as source dirt
  // (ADVICE r10 #3).
  private val regenerable =
    ("^[ MTADRCU?!]{1,2} +\"?(scale_[^/\" ]*[.]json|BENCH[^/\" ]*[.]json" +
      "|bench_local_full[.]json|EXPLAIN[.]md|CORRECTNESS_r[^/\" ]*[.]json" +
      "|LEAKCHECK[.]json|COPYCHECK[.]json|PROGRESS[.]jsonl)\"?$").r

  /** True when `git status --porcelain` output contains anything BEYOND
    * regenerable artifacts (spec-tested: ProvenanceSpec). */
  private[graft] def isSourceDirt(porcelain: String): Boolean =
    porcelain.linesIterator.map(_.stripTrailing).filter(_.nonEmpty)
      .exists(l => regenerable.findFirstIn(l).isEmpty)

  lazy val commit: String = {
    val sha = git("rev-parse", "--short", "HEAD").getOrElse("unknown")
    val dirty = git("status", "--porcelain").exists(isSourceDirt)
    if (sha != "unknown" && dirty) s"$sha-dirty" else sha
  }

  def ts: String = java.time.Instant.now().toString

  /** `"commit": "...", "ts": "..."` fragment for the hand-rolled JSON
    * writers (Bench / ScaleBench / Verify). */
  def jsonFields: String = s""""commit":"$commit","ts":"$ts""""
}
