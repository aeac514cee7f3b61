package graft.tools

/** Exhaustive interleaving explorer for the object-store commit
  * protocol's lease + publish machinery (`graft.llm.HadoopManifestIo`
  * `withLock` / `publishPointer`, ManifestIo.scala) — the
  * deterministic complement to the probabilistic `CommitStorm`
  * hunts. Storms find schedules by luck under load; this enumerates
  * EVERY schedule of abstract actors over an abstract store (within
  * bounds) and asserts the protocol's safety invariants at every
  * reachable state:
  *
  *   - I1 `single-holder`: never two simultaneously FENCE-TRUE
  *     holders (`deadline - margin > clock` both) — the invariant
  *     whose violation let round 17's recycled-generation
  *     double-holder reap a live holder's fresh commit through GC.
  *   - I2 `durable-lineage`: once a publish is acknowledged, its
  *     version key exists AND the resolved lineage (highest present
  *     commit file) contains it, forever — no committed version is
  *     ever silently dropped, by a zombie publish, a prune, or a
  *     stale-keep-set GC reap. Versions dropped by an ACKED retention
  *     trim are exempt (that drop is the trim's contract).
  *   - I3 `pin-readability`: a version resolvable at pin time stays
  *     materialized from the moment `pinCurrent` RETURNS until the
  *     reader releases the pin or lets it lapse past the pin TTL —
  *     the reader-pin contract (`IndexManifest.pinCurrent` /
  *     `ReaderPin.refresh` / `release` vs GC reaps and pin expiry).
  *   - I4 `trim-soundness`: a version dropped by an ACKED
  *     `expireVersions` trim never resolves again — an acked trim is
  *     APPLIED, never the r18 zombie-trim false success (reported
  *     applied while its commit file is unresolvable junk below the
  *     head).
  *   - I5 `holder-accountability`: a LIVE holder-stamped lease always
  *     belongs to an actor that is holding or mid-acquisition on that
  *     generation — an acquisition that claimed either records its
  *     holder or releases, never walks away orphaning its own live
  *     claim (the r19 nemesis catch: a transient fault on a throttled
  *     litter delete failing the acquisition AFTER the claim landed;
  *     each recovery retry then burns a generation against its own
  *     orphan — the livelock the best-effort-delete fix closes).
  *     Lapsed leases are exempt: crash recovery is the TTL's job.
  *
  * TRANSIENT FAULTS (`faults=N`): up to N litter deletes
  * (lease-generation prunes, commit-tail prunes, GC reaps) may throw
  * before applying — the S3-throttling shape the `nemesis` storm mode
  * injects. With the `bestEffortLitter` fix ON the delete is skipped
  * and the verb continues; OFF re-opens the pre-fix failure routing
  * (an acquisition-time fault abandons WITHOUT releasing — I5's
  * negative control). Creates and publishes are excluded by design:
  * their documented recovery (idempotent re-drive / landed-check)
  * replays the same step, which adds no distinguishable interleaving
  * to an exhaustive explorer; the storms certify that recovery at the
  * real-code level.
  *
  * THE MODEL. The store is an immutable map with exactly the
  * primitives the real backend reduces to, each a single atomic
  * scheduler step: conditional create (`graft.llm.ManifestIo`'s
  * `writeExclusive`), overwrite, delete, and an atomic
  * list+read snapshot (the real list-then-read races resolve through
  * FNF-skip semantics and are the storms' territory; the checker
  * covers op-level interleavings). WRITERS run the REAL algorithm
  * step-for-step — acquire (list → conditional-create next
  * generation → claim-verify against a fresh listing → prune
  * superseded generations), publish (deadline fence as its OWN step,
  * so the scheduler can interleave a TTL-scale stall between fence
  * and create — the documented ambiguity window — then the
  * conditional create of `MANIFEST-(token+1)`, the re-list with the
  * gap + lineage-carry disown check, tail pruning), a stale-keep-set
  * GC sweep with the per-reap fence re-check, and release by
  * overwrite. A TRIMMER's last round runs `expireVersions` instead of
  * a commit: same lock/fence/publish machinery, but the published
  * head is a PRE-EXISTING version, so the carried-success shortcut is
  * off (`headIsNewClaim=false` — knob `trimNotCarried`). READERS run
  * `pinCurrent`: the same lease acquisition, resolve the lineage
  * head, write the pin file, the post-write PIN FENCE (knob
  * `pinFence`), then lock release; afterwards they nondeterministically
  * refresh the pin (resetting its TTL) or release it, while GC sweeps
  * stale pins and keeps live-pinned versions. A writer that throws
  * `ConcurrentCommitException` rebases with a fresh version id,
  * exactly like `IndexManifest.mutate`. Time is a logical clock
  * advanced by a TICK action that jumps to the next deadline boundary
  * (`d - margin`, `d + 1`, pin lapse) — an unboundedly-stalled actor
  * is any schedule that stops stepping it, so zombie stalls of EVERY
  * length at EVERY point come free with exhaustiveness.
  *
  * SYMMETRY REDUCTION. Identically-programmed actors (committing
  * writers among themselves, readers among themselves; a trimmer is
  * its own class) are interchangeable up to id: every reachable state
  * is memoized under its CANONICAL key — the lexicographic minimum
  * over all within-class id permutations (ids rewritten in version
  * names, lease holder fields, pin files and actor order). Safety
  * invariants are permutation-invariant, so pruning a state whose
  * canonical twin was visited is sound; the reduction divides the
  * space by up to |class|! and is what makes 3-writer configs WITH
  * rebases converge.
  *
  * KNOBS ([[LeaseModelCheck.Knobs]]) re-open each closed race so the
  * spec can prove the explorer actually SEES the bug class it guards
  * (negative controls): `claimVerify=false` re-admits the
  * recycled-generation double-holder, `releaseOverwrite=false`
  * re-admits the delete-release ABA, `fencePublish=false +
  * readbackDisown=false` re-admits the pruned-name lost update,
  * `trimNotCarried=false` re-admits the r18 zombie-trim false
  * success, `pinFence=false` re-admits the zombie-pinner
  * pin-of-a-reaped-version.
  *
  * Run as a main: `runMain graft.tools.LeaseModelCheck` explores the
  * standard configurations and prints one JSON line per config.
  */
object LeaseModelCheck {

  /** Protocol fixes that can be switched OFF to prove the checker
    * detects the race each one closes.
    */
  final case class Knobs(
      claimVerify: Boolean = true,
      releaseOverwrite: Boolean = true,
      fencePublish: Boolean = true,
      readbackDisown: Boolean = true,
      trimNotCarried: Boolean = true,
      pinFence: Boolean = true,
      // litter deletes (lease-generation prunes, commit-tail prunes,
      // GC reaps) are BEST-EFFORT: a transient store fault skips the
      // delete and the verb continues (IndexManifest's catch + inline
      // retry). Off = the pre-fix shape the r19 nemesis caught: a
      // throttled cosmetic delete throws OUT of the acquisition,
      // orphaning the actor's own freshly-claimed holder lease
      // (invariant I5 fires)
      bestEffortLitter: Boolean = true)

  final case class Config(
      writers: Int = 2,
      rounds: Int = 1,
      keep: Int = 2, // KeepCommitFiles, shrunk so prunes are reachable
      ttl: Int = 4,
      margin: Int = 1, // fenceMarginMs analogue
      maxAttempts: Int = 2, // rebase bound per logical delta
      // lease generations grow forever in the real protocol (that IS
      // the monotonicity invariant); the model explores every
      // schedule whose generations stay within this bound and
      // truncates the rest (the writer parks as Failed — sound for
      // safety: all states within the bound are still visited)
      maxGens: Int = 6,
      maxStates: Int = 60_000_000,
      // the LAST writer's LAST round is a retention trim
      // (expireVersions keep=1) instead of a commit
      trim: Boolean = false,
      // rounds for the trimmer actor (-1 = same as `rounds`): a pure
      // trimmer (trimmerRounds=1) trims without seeding commits
      trimmerRounds: Int = -1,
      // reader actors appended after the writers, each performing one
      // pinCurrent → {refresh | release} lifecycle
      readers: Int = 0,
      pinTtl: Int = 4, // ReaderPinTtlMs analogue
      // transient-fault budget: up to this many store LITTER DELETES
      // (the ops whose recovery is non-trivial — see
      // Knobs.bestEffortLitter) may fault across a schedule, the
      // nemesis's once-per-(op,key) IOException shape. Creates and
      // publishes are excluded by design: their documented recovery
      // (idempotent re-drive / landed-check) replays the SAME step,
      // which adds no distinguishable interleaving to an exhaustive
      // explorer — the storms' retryTransient recipe certifies that
      // path at the real-code level.
      faults: Int = 0,
      symmetry: Boolean = true,
      knobs: Knobs = Knobs()) {
    def actors: Int = writers + readers
    def isReader(id: Int): Boolean = id >= writers
    def roundsOf(id: Int): Int =
      if (isReader(id)) 1
      else if (trim && id == writers - 1 && trimmerRounds > 0)
        trimmerRounds
      else rounds
    /** Is actor `id`'s round `round` a trim? */
    def isTrimRound(id: Int, round: Int): Boolean =
      trim && !isReader(id) && id == writers - 1 &&
        round == roundsOf(id) - 1
  }

  /** Store keys: `L<gen>` lease files, `M<seq>` commit files,
    * `V<vid>` version dirs, `P<readerId>` reader pin files. Lease
    * content: `H:<writer>:<deadline>` (holder) or `R` (released
    * stub). Commit content: comma-joined lineage, newest first. Pin
    * content: `<vid>:<deadline>`.
    */
  type Store = Map[String, String]

  private def leaseGens(s: Store): Seq[(Int, String)] =
    s.keysIterator.collect {
      case k if k.startsWith("L") => (k.drop(1).toInt, k)
    }.toSeq.sortBy(-_._1)

  private def commitSeqs(s: Store): Seq[Int] =
    s.keysIterator.collect {
      case k if k.startsWith("M") => k.drop(1).toInt
    }.toSeq.sortBy(x => -x)

  private def resolveLineage(s: Store): List[String] =
    commitSeqs(s).headOption
      .map(m => s(s"M$m").split(",").filter(_.nonEmpty).toList)
      .getOrElse(Nil)

  /** Live (unlapsed) pin files: reader id → pinned vid. */
  private def livePins(s: Store): Map[String, String] =
    s.collect {
      case (k, v) if k.startsWith("P") =>
        val i = v.lastIndexOf(':')
        (k, v.substring(0, i), v.substring(i + 1).toInt)
    }.collect { case (k, ver, dl) if dl >= 0 => (k, ver) }.toMap

  /** Actor program counters, in protocol order. */
  private val AcqList = 0; private val AcqCreate = 1
  private val AcqVerify = 2; private val AcqPrune = 3
  private val Scan = 4; private val Fence = 5
  private val PubCreate = 6; private val PubVerify = 7
  private val Disown = 8; private val PubPrune = 9
  private val GcSnap = 10; private val GcReap = 11
  private val Release = 12
  private val Done = 13; private val Failed = 14
  // reader program (pinCurrent body runs between AcqPrune and Release)
  private val PinRead = 15; private val PinWrite = 16
  private val PinFence = 17; private val RdHold = 18

  final case class W(
      pc: Int,
      round: Int,
      attempt: Int,
      next: Int, // chosen lease generation
      deadline: Int, // recorded at claim
      holding: Boolean,
      rebasing: Boolean, // ConcurrentCommitException pending: release
      // then retry with a fresh attempt (IndexManifest.mutate's loop)
      token: Int,
      lineage: List[String],
      pruneQ: List[String], // pending single-op deletes
      keepSet: Set[String], // gc's snapshot keep-set
      acked: List[String],
      // trim bookkeeping: versions the in-flight trim would drop;
      // versions whose truncation ever LANDED as a resolvable commit
      // file (I2 exemption — a successor may carry the truncation
      // even if the trim itself later disowns: the trim then reports
      // failure-but-applied, the loud side of the ambiguity); and
      // versions ACKED trims dropped (I4 subject)
      trimDropped: List[String] = Nil,
      landedDrop: List[String] = Nil,
      ackedDrop: List[String] = Nil,
      // reader bookkeeping
      pinVer: String = "",
      pinDl: Int = -1,
      pinAcked: Boolean = false, // pinCurrent RETURNED this pin
      everLapsed: Boolean = false, // pin TTL lapsed while held
      released: Boolean = false) { // reader released (or learned of
      // the lapse from a loud refresh) — protection over by contract
    def vid(id: Int): String = s"w$id-r$round-a$attempt"
  }

  /** TIME is relative (timed-automata region style): every deadline —
    * in lease/pin contents and actor records — is stored as an offset
    * from "now", a TICK jumps to the next boundary (fence give-up at
    * `d - margin`, lapse at `d + 1`, pin lapse) and decrements every
    * deadline, clamped at -1 (all offsets below 0 are semantically
    * identical: not live, not fence-true). Dropping the absolute
    * clock merges every time-shifted copy of a state, which is what
    * makes the space finite and exhaustively explorable.
    */
  final case class State(store: Store, ws: Vector[W],
      faults: Int = 0) {
    def key: String = {
      val sb = new StringBuilder
      sb.append(faults).append('!')
      store.toSeq.sorted.foreach { case (k, v) =>
        sb.append(k).append('=').append(v).append(';') }
      ws.foreach { w =>
        sb.append(w.pc).append(',').append(w.round).append(',')
          .append(w.attempt).append(',').append(w.next).append(',')
          .append(w.deadline).append(',').append(w.holding).append(',')
          .append(w.rebasing).append(',')
          .append(w.token).append(',')
          .append(w.lineage.mkString("+")).append(',')
          .append(w.pruneQ.mkString("+")).append(',')
          .append(w.keepSet.toSeq.sorted.mkString("+")).append(',')
          .append(w.acked.mkString("+")).append(',')
          .append(w.trimDropped.mkString("+")).append(',')
          .append(w.landedDrop.mkString("+")).append(',')
          .append(w.ackedDrop.mkString("+")).append(',')
          .append(w.pinVer).append(',').append(w.pinDl).append(',')
          .append(w.pinAcked).append(',').append(w.everLapsed)
          .append(',').append(w.released).append('|')
      }
      sb.toString
    }
  }

  final case class Result(
      states: Long,
      violation: Option[(String, List[String])], // (invariant, trace)
      // coverage, so specs can assert a config actually EXERCISED the
      // machinery it claims to verify (a fault budget that never
      // fires, or an exhaustion path that is unreachable, would
      // otherwise report a vacuous clean)
      faultsFired: Long = 0, // max faults consumed on any one schedule
      readerExhausted: Boolean = false) // some reader parked Failed
      // without acking a pin — pinCurrent's bounded-retry exhaustion
      // (the loud ConcurrentCommitException path) was reached

  /** Atomic successor states of actor `id` (usually one; a reader
    * holding its pin branches between refresh and release). Mirrors
    * ManifestIo.scala's withLock / publishPointer and
    * IndexManifest.pinCurrent / expireVersions / gc; the comment on
    * each case names the real statement it models.
    */
  private def steps(cfg: Config, st: State, id: Int): Seq[State] = {
    val w = st.ws(id)
    val s = st.store
    def upd(w2: W, s2: Store = s): State =
      st.copy(store = s2, ws = st.ws.updated(id, w2))
    // a successor where a transient store fault consumed one unit of
    // the fault budget before the op applied (the nemesis's
    // IOException-before-apply shape)
    def updFault(w2: W, s2: Store = s): State =
      st.copy(store = s2, ws = st.ws.updated(id, w2),
        faults = st.faults - 1)
    // ConcurrentCommitException: head for Release with the rebasing
    // flag set — the release itself is its own atomic step, exactly
    // like the real withLock finally block
    def lose(): State = upd(w.copy(pc = Release, rebasing = true))
    val isTrim = cfg.isTrimRound(id, w.round)
    w.pc match {
      case AcqList =>
        // leaseGens + head liveness read (one snapshot): live head →
        // poll (self-loop; TICK provides progress), lapsed/absent →
        // choose next = head+1
        val gens = leaseGens(s)
        val live = gens.headOption.exists { case (_, k) =>
          s(k).split(":") match {
            case Array("H", _, d) => d.toInt >= 0 // deadline >= now
            case _ => false // RELEASED stub parses as no deadline
          }
        }
        if (live) Seq(upd(w)) // busy-poll; unchanged → memo-pruned
        else Seq(upd(w.copy(pc = AcqCreate,
          next = gens.headOption.map(_._1).getOrElse(0) + 1)))
      case AcqCreate =>
        // deadline stamp + conditional create of L<next>. The gap
        // between the LISTING that chose `next` (AcqList, arbitrarily
        // many scheduler steps ago) and this create landing is the
        // unbounded cold-JVM window of the r17 double-holder.
        val k = s"L${w.next}"
        if (w.next > cfg.maxGens) // generation bound: park, truncating
          Seq(upd(w.copy(pc = Failed, holding = false, deadline = -1)))
        else if (s.contains(k)) // racer took it
          Seq(upd(w.copy(pc = AcqList)))
        else {
          val dl = cfg.ttl // now + TTL, relative
          // pre-fix protocols (claimVerify off) became holder right
          // here and pruned from the STALE listing; the fixed one
          // verifies against a fresh listing first
          val stalePrunes = leaseGens(s).collect {
            case (g, kk) if g < w.next => kk }.toList
          Seq(upd(w.copy(pc = if (cfg.knobs.claimVerify) AcqVerify
              else AcqPrune,
            deadline = dl,
            holding = !cfg.knobs.claimVerify,
            pruneQ = if (cfg.knobs.claimVerify) Nil else stalePrunes),
            s.updated(k, s"H:$id:$dl")))
        }
      case AcqVerify =>
        // CLAIM VERIFY (the r17 recycled-generation fix): fresh
        // listing; stand only as head with a fence-clearing deadline
        val fresh = leaseGens(s)
        val headGen = fresh.headOption.map(_._1).getOrElse(0)
        if (headGen > w.next || w.deadline <= cfg.margin) {
          // disown own claim as RELEASED, re-evaluate
          Seq(upd(w.copy(pc = AcqList, holding = false, deadline = -1),
            s.updated(s"L${w.next}", "R")))
        } else
          Seq(upd(w.copy(pc = AcqPrune, holding = true,
            pruneQ = fresh.collect {
              case (g, k) if g < w.next => k }.toList)))
      case AcqPrune =>
        // prune superseded generations, one delete per step; then the
        // lock body begins — commit/trim scan for writers, pinCurrent
        // for readers
        w.pruneQ match {
          case k :: rest =>
            val ok = upd(w.copy(pruneQ = rest), s - k)
            if (st.faults <= 0) Seq(ok)
            else if (cfg.knobs.bestEffortLitter)
              // transient fault on the litter delete (and on its one
              // inline retry): the delete is SKIPPED and the verb
              // continues — litter costs storage until a later prune
              Seq(ok, updFault(w.copy(pruneQ = rest)))
            else
              // PRE-FIX shape (the r19 nemesis catch): the throttled
              // cosmetic delete throws OUT of the acquisition — the
              // actor retries per the recovery recipe, leaving its
              // own freshly-claimed lease a live orphaned holder
              // until TTL; each retry burns a generation (I5 fires)
              Seq(ok, updFault(w.copy(pc = AcqList, holding = false,
                deadline = -1, pruneQ = Nil)))
          case Nil => Seq(upd(w.copy(
            pc = if (cfg.isReader(id)) PinRead else Scan)))
        }
      case Scan =>
        // readPointerForCommit: ONE listing feeds token (max seq) and
        // lineage. For a COMMIT, the staged version dir (STAGE +
        // COMMITTED markers, data) also materializes here — finalize
        // happens inside the lock, before publish, in the real
        // commitImpl. For a TRIM (expireVersions) nothing is staged:
        // the publish head is a PRE-EXISTING version, and the trim's
        // would-be drops are recorded for the I4 check.
        val token = commitSeqs(s).headOption.getOrElse(0)
        val lin = resolveLineage(s)
        if (isTrim) {
          if (lin.isEmpty)
            // real expireVersions require()s a committed root —
            // vacuous here, release and move on
            Seq(upd(w.copy(pc = Release)))
          else
            Seq(upd(w.copy(pc = Fence, token = token, lineage = lin,
              trimDropped = lin.drop(1))))
        } else
          Seq(upd(w.copy(pc = Fence, token = token, lineage = lin),
            s.updated(s"V${w.vid(id)}", "x")))
      case Fence =>
        // publishPointer's lockStillHeld fence — its OWN step, so the
        // scheduler can stall arbitrarily long between the fence
        // passing and the create landing (the ambiguity window)
        if (cfg.knobs.fencePublish && !(w.deadline > cfg.margin))
          Seq(lose())
        else Seq(upd(w.copy(pc = PubCreate)))
      case PubCreate =>
        // conditional create of MANIFEST-(token+1) — the CAS. A trim
        // publishes the TRUNCATED pre-existing lineage (keep=1); a
        // commit prepends its fresh vid.
        val k = s"M${w.token + 1}"
        val content =
          if (isTrim) w.lineage.take(1)
          else w.vid(id) :: w.lineage
        if (s.contains(k)) Seq(lose())
        else Seq(upd(w.copy(pc = PubVerify,
          // a trim's truncation is RESOLVABLE from this instant: a
          // successor may scan and carry it even if we later disown —
          // record the drops as legitimately-intentional forever
          landedDrop = if (isTrim) (w.trimDropped ::: w.landedDrop)
            else w.landedDrop),
          s.updated(k, content.mkString(","))))
      case PubVerify =>
        // re-list: gap >= keep AND NOT (head-is-new-claim AND the
        // current lineage carries it) → recreate-of-a-pruned-name →
        // disown. A COMMIT's head is its freshly-claimed vid, so
        // containment is exact proof the publish landed first; a
        // TRIM's head is a pre-existing version every successor
        // carries regardless, so the shortcut is off
        // (headIsNewClaim=false — ManifestIo.publishPointer) and a
        // zombie trim must lose loudly. Knob trimNotCarried=false
        // re-opens the r18 bug (trims taking the shortcut).
        val seqs = commitSeqs(s)
        val gap = seqs.headOption.exists(_ - (w.token + 1) >= cfg.keep)
        val headVid = if (isTrim) w.lineage.head else w.vid(id)
        val carried = resolveLineage(s).contains(headVid)
        val headIsNewClaim = if (isTrim) !cfg.knobs.trimNotCarried
          else true
        if (cfg.knobs.readbackDisown && gap &&
            !(headIsNewClaim && carried))
          Seq(upd(w.copy(pc = Disown)))
        else
          Seq(upd(w.copy(pc = PubPrune,
            acked = if (isTrim) w.acked else w.vid(id) :: w.acked,
            ackedDrop = if (isTrim) w.trimDropped ::: w.ackedDrop
              else w.ackedDrop,
            pruneQ = seqs.drop(cfg.keep).map(x => s"M$x").toList)))
      case Disown =>
        // deleteIfExists of the never-resolvable commit file, then
        // head for Release with the rebasing flag. The store delete
        // and the pc advance are ONE step here although the real code
        // has an interleavable gap between deleteIfExists and the
        // withLock-finally release: the advance alone has no
        // observable store effect (the release overwrite is still its
        // own step below), so merging them loses no distinguishable
        // interleaving.
        Seq(lose().copy(store = s - s"M${w.token + 1}"))
      case PubPrune =>
        w.pruneQ match {
          case k :: rest =>
            val ok = upd(w.copy(pruneQ = rest), s - k)
            if (st.faults <= 0) Seq(ok)
            else if (cfg.knobs.bestEffortLitter)
              // best-effort commit-tail prune: fault skips the delete
              Seq(ok, updFault(w.copy(pruneQ = rest)))
            else
              // pre-fix: the throw propagates out of the withLock
              // BODY, so the finally still releases — the verb fails
              // AFTER its publish acked (failure-but-applied, loud
              // but safe; no orphaned lease here)
              Seq(ok, updFault(w.copy(pc = Release, pruneQ = Nil)))
          case Nil => Seq(upd(w.copy(pc = GcSnap)))
        }
      case GcSnap =>
        // gc's snapshot (IndexManifest.gc): ONE scan feeds the
        // keep-set and the reap candidates; a zombie's snapshot can
        // be stale by the time its reaps run — the per-reap fence is
        // what makes that safe. The scan also performs
        // pinnedVersions's sweep: stale pin files (TTL lapsed) are
        // reaped, LIVE pins' versions join the keep-set — the same
        // single pass as the real code, under the same lock.
        val stalePinKeys = s.keysIterator.filter { k =>
          k.startsWith("P") && {
            val v = s(k)
            v.substring(v.lastIndexOf(':') + 1).toInt < 0
          }
        }.toList
        val s2 = stalePinKeys.foldLeft(s)(_ - _)
        val keep = resolveLineage(s2).toSet ++ livePins(s2).values
        Seq(upd(w.copy(pc = GcReap,
          keepSet = keep,
          pruneQ = s2.keysIterator.collect {
            case k if k.startsWith("V") && !keep.contains(k.drop(1)) =>
              k
          }.toList.sorted), s2))
      case GcReap =>
        w.pruneQ match {
          case k :: rest =>
            // FENCED reap: every delete re-checks the lease
            // (lockStillHeld) — a lapsed holder skips
            val fenceOk = w.deadline > cfg.margin
            val ok = upd(w.copy(pruneQ = rest),
              if (fenceOk) s - k else s)
            if (st.faults <= 0 || !fenceOk) Seq(ok)
            else if (cfg.knobs.bestEffortLitter)
              // best-effort reap: a store-throttled rmTree skips —
              // garbage until the next gc pass re-collects it
              Seq(ok, updFault(w.copy(pruneQ = rest)))
            else
              // pre-fix: gc throws out of the commit's withLock body
              // (post-publish — the acked commit is durable); the
              // finally releases the lease
              Seq(ok, updFault(w.copy(pc = Release, pruneQ = Nil)))
          case Nil => Seq(upd(w.copy(pc = Release)))
        }
      case PinRead =>
        // pinCurrent's current(root) under the lock: the lineage head
        // is the version to pin; an empty root cannot be pinned
        // (real code throws) — release and finish
        resolveLineage(s).headOption match {
          case None => Seq(upd(w.copy(pc = Release)))
          case Some(v) =>
            Seq(upd(w.copy(pc = PinWrite, pinVer = v)))
        }
      case PinWrite =>
        // the pin file lands (writeString — unconditional, uuid name
        // so never contended). With the PIN FENCE off, pinCurrent
        // returns right here — the pre-fix shape
        val s2 = s.updated(s"P$id", s"${w.pinVer}:${cfg.pinTtl}")
        if (cfg.knobs.pinFence)
          Seq(upd(w.copy(pc = PinFence, pinDl = cfg.pinTtl), s2))
        else
          Seq(upd(w.copy(pc = Release, pinDl = cfg.pinTtl,
            pinAcked = true), s2))
      case PinFence =>
        // the post-write lease fence (IndexManifest.pinCurrent): still
        // held ⇒ no takeover existed since the read — the pin stands
        // and pinCurrent returns it; lapsed ⇒ delete the pin and
        // rebase the whole acquisition
        if (w.deadline > cfg.margin)
          Seq(upd(w.copy(pc = Release, pinAcked = true)))
        else
          Seq(upd(w.copy(pc = Release, rebasing = true, pinVer = "",
            pinDl = -1), s - s"P$id"))
      case RdHold =>
        // the reader holds its returned pin: it may REFRESH (reset the
        // pin TTL — contract-valid only before a lapse; a refresh that
        // finds the pin file reaped fails loudly in the real code, so
        // the reader LEARNS protection is over) or RELEASE. Both
        // interleave freely with writers' GC sweeps.
        val refresh =
          if (s.contains(s"P$id"))
            upd(w.copy(pinDl = cfg.pinTtl),
              s.updated(s"P$id", s"${w.pinVer}:${cfg.pinTtl}"))
          else // reaped: loud IllegalStateException → reader stops
            upd(w.copy(pc = Done, released = true))
        val release =
          upd(w.copy(pc = Done, released = true), s - s"P$id")
        Seq(refresh, release)
      case Release =>
        val s2 = release(cfg, s, w)
        val base = w.copy(holding = false, rebasing = false,
          deadline = -1, next = 0, token = 0, lineage = Nil,
          keepSet = Set.empty, trimDropped = Nil)
        val w2 =
          if (w.rebasing) {
            if (w.attempt + 1 >= cfg.maxAttempts)
              base.copy(pc = Failed)
            else base.copy(pc = AcqList, attempt = w.attempt + 1)
          } else if (cfg.isReader(id))
            base.copy(pc = if (w.pinAcked) RdHold else Done)
          else if (w.round + 1 >= cfg.roundsOf(id)) base.copy(pc = Done)
          else base.copy(pc = AcqList, round = w.round + 1, attempt = 0)
        Seq(upd(w2, s2))
      case _ => Seq(st)
    }
  }

  private def release(cfg: Config, s: Store, w: W): Store = {
    val k = s"L${w.next}"
    if (cfg.knobs.releaseOverwrite)
      // overwrite with a RELEASED stub — the monotonic high-water
      // mark (never delete: the delete-cycle ABA)
      if (s.contains(k)) s.updated(k, "R") else s
    else s - k // the PRE-FIX delete-release
  }

  /** The next time boundary as a DELTA from now: a holder's fence
    * give-up (`d - margin`), a lease lapse (`d + 1`), or a pin lapse
    * (`d + 1`). Ticking jumps straight to the nearest one —
    * intermediate instants change no comparison, so they would only
    * multiply states.
    */
  private def nextTick(cfg: Config, st: State): Option[Int] = {
    val leaseDls =
      st.store.valuesIterator.collect {
        case v if v.startsWith("H:") => v.split(":")(2).toInt
      }.toSeq ++
        st.ws.collect { case w if w.holding => w.deadline }
    val pinDls =
      st.store.collect { case (k, v) if k.startsWith("P") =>
        v.substring(v.lastIndexOf(':') + 1).toInt }.toSeq ++
        st.ws.collect { case w if w.pinDl >= 0 => w.pinDl }
    val deltas = leaseDls.flatMap(d =>
      Seq(d - cfg.margin, d + 1)).filter(_ > 0) ++
      pinDls.map(_ + 1).filter(_ > 0)
    if (deltas.isEmpty) None else Some(deltas.min)
  }

  /** Advance time by `delta`: every relative deadline decrements,
    * clamped at -1 (all sub-zero offsets are semantically identical —
    * not live, not fence-true — so clamping merges them). A reader
    * whose HELD pin crosses below 0 here records the lapse
    * (`everLapsed`): its I3 protection contractually ends at this
    * boundary, whether or not GC ever sweeps the stale file.
    */
  private def applyTick(st: State, delta: Int): State = {
    def adj(d: Int): Int = math.max(-1, d - delta)
    val s2: Store = st.store.map {
      case (k, v) if v.startsWith("H:") =>
        val p = v.split(":")
        (k, s"H:${p(1)}:${adj(p(2).toInt)}")
      case (k, v) if k.startsWith("P") =>
        val i = v.lastIndexOf(':')
        (k, s"${v.substring(0, i)}:${adj(v.substring(i + 1).toInt)}")
      case kv => kv
    }
    State(s2, st.ws.map { w =>
      val lapsedNow = w.pinAcked && !w.released &&
        w.pinDl >= 0 && adj(w.pinDl) < 0
      w.copy(deadline = adj(w.deadline),
        pinDl = if (w.pinDl >= 0) adj(w.pinDl) else w.pinDl,
        everLapsed = w.everLapsed || lapsedNow)
    }, st.faults)
  }

  private def checkInvariants(cfg: Config, st: State)
      : Option[String] = {
    // I1: never two fence-true holders
    val fenceTrue = st.ws.count(w =>
      w.holding && w.deadline > cfg.margin)
    if (fenceTrue > 1)
      return Some(s"single-holder violated: $fenceTrue fence-true " +
        "holders")
    // I5 holder-accountability: a LIVE holder-stamped lease always
    // belongs to an actor that is either standing as the holder or
    // still mid-acquisition on that very generation — an acquisition
    // that claimed either records its holder or releases; it never
    // walks away leaving its own live claim orphaned. (The shape the
    // r19 nemesis caught: a faulted litter delete failing the
    // acquisition AFTER the claim landed. A lapsed lease — dl < 0 —
    // is exempt: crash/stall recovery is the TTL's job, not this
    // invariant's.)
    for ((k, v) <- st.store
         if k.startsWith("L") && v.startsWith("H:")) {
      val p = v.split(":")
      val aid = p(1).toInt
      if (p(2).toInt >= 0) {
        val a = st.ws(aid)
        val gen = k.drop(1).toInt
        val midAcq =
          (a.pc == AcqVerify || a.pc == AcqPrune) && a.next == gen
        if (!a.holding && !midAcq)
          return Some("holder-accountability violated: live lease " +
            s"L$gen names actor $aid which is neither holding nor " +
            "mid-acquisition (orphaned holder lease)")
      }
    }
    val lineage = resolveLineage(st.store).toSet
    // versions an ACKED trim dropped — the I4 subject
    val trimmedAway = st.ws.iterator.flatMap(_.ackedDrop).toSet
    // I2 exemption: every version whose truncation ever LANDED as a
    // resolvable commit file. Wider than the acked set on purpose: a
    // zombie trim's landed truncation can be scanned and carried by a
    // successor's commit BEFORE the trim disowns — the trim then
    // reports failure while its effect stands (failure-but-applied,
    // the loud side of the ambiguity headIsNewClaim=false chooses;
    // the reverse — applied-report-while-unresolvable — is the r18
    // bug I4 guards). Either way the drop was the expireVersions
    // caller's stated intent, so it is never a durable-lineage loss.
    val exemptI2 = st.ws.iterator.flatMap(_.landedDrop).toSet
    // I2: every acknowledged version stays materialized AND in the
    // resolved lineage (model retains everything), unless a trim
    // dropped it
    for (w <- st.ws; v <- w.acked if !exemptI2.contains(v)) {
      if (!st.store.contains(s"V$v"))
        return Some(s"durable-lineage violated: acked $v's version " +
          "dir was reaped")
      if (!lineage.contains(v))
        return Some(s"durable-lineage violated: acked $v left the " +
          "resolved lineage")
    }
    // I4: an acked trim is APPLIED — its dropped versions never
    // resolve again (commits only prepend onto what they resolve, so
    // a dropped version re-resolving means the trim's ack was false:
    // the r18 zombie-trim bug)
    val resurrected = trimmedAway.intersect(lineage)
    if (resurrected.nonEmpty)
      return Some("trim-soundness violated: acked trim's dropped " +
        s"versions resolve again: ${resurrected.toSeq.sorted.mkString(",")}")
    // I3: from the moment pinCurrent RETURNS until release or pin-TTL
    // lapse, the pinned version stays materialized
    for (w <- st.ws
         if w.pinAcked && !w.released && !w.everLapsed) {
      if (!st.store.contains(s"V${w.pinVer}"))
        return Some("pin-readability violated: pinned version " +
          s"${w.pinVer} was reaped while the pin was live")
    }
    None
  }

  // ---------- symmetry reduction ----------

  /** Within-class id permutations: committing writers are mutually
    * interchangeable (the trimmer, whose program differs, is its own
    * class), readers likewise. Identity excluded.
    */
  private def permutations(cfg: Config): Seq[Array[Int]] = {
    val committers =
      (0 until (if (cfg.trim) cfg.writers - 1 else cfg.writers)).toList
    val readers = (cfg.writers until cfg.actors).toList
    def perms(xs: List[Int]): Seq[Map[Int, Int]] =
      xs.permutations.map(p => xs.zip(p).toMap).toSeq
    val all = for {
      pw <- perms(committers)
      pr <- perms(readers)
    } yield {
      val m = pw ++ pr
      Array.tabulate(cfg.actors)(i => m.getOrElse(i, i))
    }
    all.filterNot(_.zipWithIndex.forall { case (v, i) => v == i })
  }

  private def renameVid(v: String, perm: Array[Int]): String =
    if (v.nonEmpty && v.charAt(0) == 'w') {
      val dash = v.indexOf('-')
      if (dash > 1) {
        val id = v.substring(1, dash)
        if (id.forall(_.isDigit)) {
          val i = id.toInt
          if (i < perm.length) s"w${perm(i)}${v.substring(dash)}" else v
        } else v
      } else v
    } else v

  private def renameState(st: State, perm: Array[Int]): State = {
    def rv(v: String): String = renameVid(v, perm)
    val s2: Store = st.store.map {
      case (k, v) if k.startsWith("V") =>
        ("V" + rv(k.drop(1)), v)
      case (k, v) if k.startsWith("P") =>
        val id = k.drop(1).toInt
        val i = v.lastIndexOf(':')
        (s"P${perm(id)}", s"${rv(v.substring(0, i))}${v.substring(i)}")
      case (k, v) if k.startsWith("M") =>
        (k, v.split(",").filter(_.nonEmpty).map(rv).mkString(","))
      case (k, v) if v.startsWith("H:") =>
        val p = v.split(":")
        (k, s"H:${perm(p(1).toInt)}:${p(2)}")
      case kv => kv
    }
    val ws2 = Vector.tabulate(st.ws.length) { newId =>
      val oldId = perm.indexOf(newId)
      val w = st.ws(oldId)
      w.copy(
        lineage = w.lineage.map(rv),
        pruneQ = w.pruneQ.map(k =>
          if (k.startsWith("V")) "V" + rv(k.drop(1)) else k),
        keepSet = w.keepSet.map(rv),
        acked = w.acked.map(rv),
        trimDropped = w.trimDropped.map(rv),
        landedDrop = w.landedDrop.map(rv),
        ackedDrop = w.ackedDrop.map(rv),
        pinVer = rv(w.pinVer))
    }
    State(s2, ws2, st.faults)
  }

  /** The memoization key: lexicographic minimum over all within-class
    * id permutations. Safety invariants are permutation-invariant, so
    * pruning a state whose canonical twin was visited is sound.
    */
  private def canonicalKey(perms: Seq[Array[Int]], st: State): String =
    if (perms.isEmpty) st.key
    else perms.foldLeft(st.key) { (best, p) =>
      val k = renameState(st, p).key
      if (k < best) k else best
    }

  /** Exhaustive DFS with canonical-state memoization. Invariants are
    * checked at EVERY reachable state; the first violation returns
    * its schedule (step labels, oldest first).
    */
  def explore(cfg: Config): Result = {
    val init = State(Map.empty,
      Vector.tabulate(cfg.actors)(_ => W(AcqList, 0, 0, 0, -1,
        holding = false, rebasing = false, 0, Nil, Nil, Set.empty,
        Nil)), cfg.faults)
    val perms = if (cfg.symmetry) permutations(cfg) else Seq.empty
    val visited = new java.util.HashSet[String]()
    var states = 0L
    var minFaultsLeft = cfg.faults
    var readerExhausted = false
    // explicit stack of (state, trace)
    val stack = new java.util.ArrayDeque[(State, List[String])]()
    stack.push((init, Nil))
    visited.add(canonicalKey(perms, init)): Unit
    while (!stack.isEmpty) {
      val (st, trace) = stack.pop()
      states += 1
      if (st.faults < minFaultsLeft) minFaultsLeft = st.faults
      if (!readerExhausted)
        readerExhausted = (cfg.writers until cfg.actors).exists { i =>
          val r = st.ws(i); r.pc == Failed && !r.pinAcked
        }
      if (states > cfg.maxStates)
        throw new IllegalStateException(
          s"state budget exceeded (${cfg.maxStates}) — shrink the config")
      if (states % 5_000_000 == 0)
        System.err.println(s"[explore] $states states, " +
          s"frontier ${stack.size}")
      checkInvariants(cfg, st) match {
        case Some(v) => return Result(states, Some((v, trace.reverse)),
          cfg.faults - minFaultsLeft, readerExhausted)
        case None =>
      }
      // successor: step each live actor (a step may branch)
      for (id <- 0 until cfg.actors) {
        val pc = st.ws(id).pc
        if (pc != Done && pc != Failed) {
          for (nxt <- steps(cfg, st, id)) {
            if (visited.add(canonicalKey(perms, nxt)))
              stack.push((nxt, s"w$id@pc$pc" :: trace))
          }
        }
      }
      // successor: time jump to the next deadline boundary
      nextTick(cfg, st).foreach { d =>
        val nxt = applyTick(st, d)
        if (visited.add(canonicalKey(perms, nxt)))
          stack.push((nxt, s"tick+$d" :: trace))
      }
    }
    Result(states, None, cfg.faults - minFaultsLeft, readerExhausted)
  }

  def main(args: Array[String]): Unit = {
    val KnownKnobs = Set("claimVerify", "releaseOverwrite",
      "fencePublish", "readbackDisown", "trimNotCarried", "pinFence",
      "bestEffortLitter")
    val KnownFlags = Set("trim", "nosym")
    def usage(): Nothing = {
      System.err.println("usage: LeaseModelCheck [writers rounds " +
        "[keep] [ttl] [attempts] [maxGens]] [off=knob,knob] [trim] " +
        "[trimmerRounds=N] [readers=N] [pinTtl=N] [faults=N] [nosym]" +
        " — knobs: " + KnownKnobs.toSeq.sorted.mkString(" ") +
        "; no args = standard configs")
      sys.exit(2)
    }
    val configs =
      if (args.nonEmpty) {
        val off = args.filter(_.startsWith("off="))
          .flatMap(_.stripPrefix("off=").split(",")).toSet
        val kv = args.collect {
          case a if a.contains('=') && !a.startsWith("off=") =>
            val Array(k, v) = a.split("=", 2); (k, v)
        }.toMap
        val flags = args.filter(a => !a.contains('=')
          && !a.forall(_.isDigit)).toSet
        val pos = args.filter(_.forall(_.isDigit))
        val unknownKnobs = off -- KnownKnobs
        val unknownFlags = flags -- KnownFlags
        val unknownKv = kv.keySet --
          Set("trimmerRounds", "readers", "pinTtl", "faults")
        // a typo'd knob must not silently explore the fully-fixed
        // model and report a clean "negative control"
        if (unknownKnobs.nonEmpty || unknownFlags.nonEmpty ||
            unknownKv.nonEmpty || pos.length < 2) {
          if (unknownKnobs.nonEmpty)
            System.err.println(
              s"unknown knob(s): ${unknownKnobs.mkString(",")}")
          if (unknownFlags.nonEmpty)
            System.err.println(
              s"unknown flag(s): ${unknownFlags.mkString(",")}")
          if (unknownKv.nonEmpty)
            System.err.println(
              s"unknown option(s): ${unknownKv.mkString(",")}")
          usage()
        }
        Seq((args.mkString("_"), Config(
          writers = pos(0).toInt,
          rounds = pos(1).toInt,
          keep = if (pos.length > 2) pos(2).toInt else 2,
          ttl = if (pos.length > 3) pos(3).toInt else 4,
          maxAttempts = if (pos.length > 4) pos(4).toInt else 2,
          maxGens = if (pos.length > 5) pos(5).toInt else 6,
          trim = flags("trim"),
          trimmerRounds = kv.get("trimmerRounds").map(_.toInt)
            .getOrElse(-1),
          readers = kv.get("readers").map(_.toInt).getOrElse(0),
          pinTtl = kv.get("pinTtl").map(_.toInt).getOrElse(4),
          faults = kv.get("faults").map(_.toInt).getOrElse(0),
          symmetry = !flags("nosym"),
          knobs = Knobs(
            claimVerify = !off("claimVerify"),
            releaseOverwrite = !off("releaseOverwrite"),
            fencePublish = !off("fencePublish"),
            readbackDisown = !off("readbackDisown"),
            trimNotCarried = !off("trimNotCarried"),
            pinFence = !off("pinFence"),
            bestEffortLitter = !off("bestEffortLitter")))))
      }
      else Seq(
        ("2w1r", Config(writers = 2, rounds = 1)),
        ("2w2r", Config(writers = 2, rounds = 2)),
        // three-way contention WITH rebases — converges under the
        // writer-symmetry reduction (pre-reduction this blew the
        // budget and ran with maxAttempts=1)
        ("3w1r_rebase", Config(writers = 3, rounds = 1,
          maxAttempts = 2, maxGens = 6)),
        // the retention-trim verb: one committer (4 rounds, keep=1 so
        // prune-recreates are reachable) + a pure trimmer
        ("trim", Config(writers = 2, rounds = 4, trimmerRounds = 1,
          trim = true, keep = 1, maxGens = 8)),
        // the reader-pin protocol: commits + a trim (so versions
        // actually leave the lineage and GC has something to reap)
        // + one pinning reader
        ("1w3r_trim_1reader", Config(writers = 1, rounds = 3,
          trim = true, readers = 1, maxGens = 7)),
        // transient faults on litter deletes (the nemesis shape),
        // best-effort fix ON: exhaustively safe incl. I5
        ("2w2r_faults2", Config(writers = 2, rounds = 2, faults = 2)))
    configs.foreach { case (name, cfg) =>
      val t0 = System.nanoTime()
      val r = explore(cfg)
      val ms = (System.nanoTime() - t0) / 1000000
      println(s"""{"config":"$name","states":${r.states},""" +
        s""""violation":${r.violation.map(v =>
          "\"" + v._1 + "\"").getOrElse("null")},""" +
        s""""faultsFired":${r.faultsFired},""" +
        s""""readerExhausted":${r.readerExhausted},"ms":$ms}""")
      r.violation.foreach { case (inv, trace) =>
        System.err.println(s"$name VIOLATION: $inv")
        trace.foreach(t => System.err.println(s"  $t"))
        sys.exit(1)
      }
    }
  }
}
