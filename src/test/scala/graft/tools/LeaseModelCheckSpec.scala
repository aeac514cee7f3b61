package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The lease/publish protocol model-checked: exhaustive interleaving
  * exploration (every schedule of abstract writers over an abstract
  * conditional-create store, every zombie stall length, every
  * deadline boundary, and — `faults=N` — transient store faults on
  * litter deletes) asserting the safety invariants I1–I5 at every
  * reachable state — plus NEGATIVE CONTROLS that switch individual
  * protocol fixes off and require the explorer to FIND the race each
  * fix closes, proving the checker sees the bug class it guards.
  * Storms ([[graft.llm.HadoopManifestSpec]], `tools/hostile_loop.py`)
  * sample this space probabilistically under load; the explorer
  * enumerates it.
  */
class LeaseModelCheckSpec extends AnyFunSuite {
  import LeaseModelCheck._

  test("FULL protocol, 2 writers x 1 round: every reachable state " +
      "satisfies single-holder and durable-lineage (exhaustive, " +
      "symmetry-reduced)") {
    val r = explore(Config(writers = 2, rounds = 1))
    assert(r.violation.isEmpty, s"violation: ${r.violation}")
    assert(r.states > 80000, s"suspiciously small space: ${r.states}")
  }

  test("FULL protocol, 2 writers x 2 rounds (rebases, pruning, gc " +
      "across rounds): exhaustively safe") {
    val r = explore(Config(writers = 2, rounds = 2))
    assert(r.violation.isEmpty, s"violation: ${r.violation}")
    assert(r.states > 800000, s"suspiciously small space: ${r.states}")
  }

  test("SYMMETRY reduction is sound on a config the unreduced " +
      "explorer also finishes: same verdict, strictly fewer states") {
    val reduced = explore(Config(writers = 2, rounds = 1))
    val full = explore(Config(writers = 2, rounds = 1,
      symmetry = false))
    assert(reduced.violation.isEmpty && full.violation.isEmpty)
    assert(reduced.states < full.states,
      s"reduction did not shrink the space: ${reduced.states} vs " +
        s"${full.states}")
  }

  test("NEGATIVE control — claim verification off re-admits the r17 " +
      "recycled-generation double-holder: the explorer must find a " +
      "single-holder (or gc-reap) violation") {
    val r = explore(Config(writers = 2, rounds = 2,
      knobs = Knobs(claimVerify = false)))
    assert(r.violation.nonEmpty,
      s"explorer missed the recycled-generation race " +
        s"(${r.states} states) — it cannot see the bug class it guards")
  }

  test("NEGATIVE control — release-by-DELETE re-admits the ABA: with " +
      "the RELEASED-stub overwrite off, a release empties the listing " +
      "and generation numbers restart, so a stale claim's verify " +
      "listing can be headless and it stands as a second fence-true " +
      "holder — the explorer must find it") {
    val r = explore(Config(writers = 2, rounds = 2,
      knobs = Knobs(releaseOverwrite = false)))
    assert(r.violation.nonEmpty &&
      r.violation.get._1.contains("single-holder"),
      s"explorer missed the delete-release ABA " +
        s"(${r.states} states): ${r.violation}")
  }

  test("NEGATIVE control — publish fence AND readback-disown off " +
      "re-admit the pruned-name lost update: a zombie's recreate of " +
      "a pruned commit file acks a lineage no reader resolves") {
    val r = explore(Config(writers = 2, rounds = 2, keep = 1,
      knobs = Knobs(fencePublish = false, readbackDisown = false)))
    assert(r.violation.nonEmpty &&
      r.violation.get._1.contains("durable-lineage"),
      s"explorer missed the pruned-name lost update " +
        s"(${r.states} states): ${r.violation}")
  }

  test("NEGATIVE control — the publish fence is LOAD-BEARING, not " +
      "redundant with the readback disown: fence off (disown still " +
      "on) lets a zombie publish a genuinely-newest commit (gap 0, " +
      "so the readback cannot object) while the live holder's " +
      "in-flight GC, keep-set snapped before that publish, reaps the " +
      "acked version — the explorer must find it") {
    // the checker REFUTED the first draft of this spec, which claimed
    // the readback subsumed the fence: its 55-step counterexample is
    // why publishPointer fences BEFORE the create instead of relying
    // on the re-list alone
    val r = explore(Config(writers = 2, rounds = 2, keep = 1,
      knobs = Knobs(fencePublish = false)))
    assert(r.violation.nonEmpty &&
      r.violation.get._1.contains("durable-lineage"),
      s"explorer missed the zombie-publish-vs-live-holder-gc race " +
        s"(${r.states} states): ${r.violation}")
  }

  // trim config small enough for the suite: one committer (3 rounds,
  // keep=1 so prune-recreates are reachable) + a pure trimmer. The
  // deeper 2w(4r)+trimmer config is part of the main's standard runs.
  private val trimCfg = Config(writers = 2, rounds = 3,
    trimmerRounds = 1, trim = true, keep = 1, maxGens = 8)

  test("TRIM verb (expireVersions), full protocol: trims interleaved " +
      "with commits, zombie trims, prune-recreates — exhaustively " +
      "safe, including trim-soundness (an acked trim is applied) and " +
      "durable-lineage with trim-dropped versions exempted") {
    val r = explore(trimCfg)
    assert(r.violation.isEmpty, s"violation: ${r.violation}")
    assert(r.states > 100000, s"suspiciously small space: ${r.states}")
  }

  test("NEGATIVE control — trims taking the carried-success shortcut " +
      "(headIsNewClaim=true for trims) re-admit the r18 zombie-trim " +
      "false success: a stalled trim's recreate-of-a-pruned-name acks " +
      "'applied' while the resolved lineage still carries every " +
      "version it claimed to drop — the explorer must find it") {
    // the 4-round committer depth is what makes the schedule
    // reachable: the trim's computed name must be published AND
    // pruned by successors before the zombie's create lands
    val r = explore(Config(writers = 2, rounds = 4, trimmerRounds = 1,
      trim = true, keep = 1, maxGens = 8,
      knobs = Knobs(trimNotCarried = false)))
    assert(r.violation.nonEmpty &&
      r.violation.get._1.contains("trim-soundness"),
      s"explorer missed the zombie-trim false success " +
        s"(${r.states} states): ${r.violation}")
  }

  // reader config: commits + a trim (so versions actually leave the
  // lineage and GC has something to reap) + one pinning reader
  private val readerCfg = Config(writers = 1, rounds = 3, trim = true,
    readers = 1, maxGens = 7)

  test("READER-PIN protocol, full: pinCurrent (lease + pin write + " +
      "pin fence) vs commits, trims, GC reaps and pin-TTL expiry — " +
      "exhaustively safe: a version resolvable at pin time stays " +
      "materialized from pinCurrent's return until release or lapse; " +
      "AND the bounded-retry EXHAUSTION path is reachable (a reader " +
      "that parks without acking never claims I3 protection — the " +
      "loud ConcurrentCommitException side, spec-pinned in " +
      "HadoopManifestSpec's PIN-RETRY EXHAUSTION test)") {
    val r = explore(readerCfg)
    assert(r.violation.isEmpty, s"violation: ${r.violation}")
    assert(r.states > 1000000, s"suspiciously small space: ${r.states}")
    assert(r.readerExhausted,
      "pin-retry exhaustion unreachable in the reader config — the " +
        "clean I3 verdict no longer covers the give-up path")
  }

  test("TRANSIENT FAULTS on litter deletes (the r19 nemesis shape, " +
      "S3-throttling IOException before the op applies), best-effort " +
      "fix ON: exhaustively safe including I5 holder-accountability, " +
      "with the fault budget actually consumed (non-vacuous)") {
    val r = explore(Config(writers = 2, rounds = 1, faults = 1))
    assert(r.violation.isEmpty, s"violation: ${r.violation}")
    assert(r.faultsFired > 0,
      s"the fault budget never fired (${r.states} states) — the " +
        "clean verdict is vacuous")
  }

  test("NEGATIVE control — best-effort litter deletes OFF re-admits " +
      "the nemesis-found orphaned-lease shape: a throttled " +
      "lease-generation prune throws out of a WON acquisition, " +
      "leaving the actor's own live holder lease orphaned (each " +
      "recovery retry then burns a generation against its own " +
      "orphan — the livelock). The explorer must find the " +
      "holder-accountability violation") {
    val r = explore(Config(writers = 2, rounds = 1, faults = 1,
      knobs = Knobs(bestEffortLitter = false)))
    assert(r.violation.nonEmpty &&
      r.violation.get._1.contains("holder-accountability"),
      s"explorer missed the orphaned-lease shape " +
        s"(${r.states} states): ${r.violation}")
  }

  test("NEGATIVE control — pin fence off re-admits the zombie " +
      "pinner: a reader stalled past its lease TTL between resolving " +
      "current and the pin write pins a version a takeover's trim+GC " +
      "already reaped, then hands out a dead pin — the explorer must " +
      "find the pin-readability violation") {
    val r = explore(readerCfg.copy(knobs = Knobs(pinFence = false)))
    assert(r.violation.nonEmpty &&
      r.violation.get._1.contains("pin-readability"),
      s"explorer missed the zombie-pinner race " +
        s"(${r.states} states): ${r.violation}")
  }
}
