package graft.tools

/** Exhaustive interleaving explorer for the object-store commit
  * protocol's lease + publish machinery (`graft.llm.HadoopManifestIo`
  * `withLock` / `publishPointer`, ManifestIo.scala) — the
  * deterministic complement to the probabilistic `CommitStorm`
  * hunts. Storms find schedules by luck under load; this enumerates
  * EVERY schedule of abstract writers over an abstract store (within
  * bounds) and asserts the protocol's two safety invariants at every
  * reachable state:
  *
  *   - I1 `single-holder`: never two simultaneously FENCE-TRUE
  *     holders (`deadline - margin > clock` both) — the invariant
  *     whose violation let round 17's recycled-generation
  *     double-holder reap a live holder's fresh commit through GC.
  *   - I2 `durable-lineage`: once a publish is acknowledged, its
  *     version key exists AND the resolved lineage (highest present
  *     commit file) contains it, forever (retain = everything in the
  *     model) — no committed version is ever silently dropped, by a
  *     zombie publish, a prune, or a stale-keep-set GC reap.
  *
  * THE MODEL. The store is an immutable map with exactly the
  * primitives the real backend reduces to, each a single atomic
  * scheduler step: conditional create (`graft.llm.ManifestIo`'s
  * `writeExclusive`), overwrite, delete, and an atomic
  * list+read snapshot (the real list-then-read races resolve through
  * FNF-skip semantics and are the storms' territory; the checker
  * covers op-level interleavings). Writers run the REAL algorithm
  * step-for-step — acquire (list → conditional-create next
  * generation → claim-verify against a fresh listing → prune
  * superseded generations), publish (deadline fence as its OWN step,
  * so the scheduler can interleave a TTL-scale stall between fence
  * and create — the documented ambiguity window — then the
  * conditional create of `MANIFEST-(token+1)`, the re-list with the
  * gap + lineage-carry disown check, tail pruning), a stale-keep-set
  * GC sweep with the per-reap fence re-check, and release by
  * overwrite. A writer that throws `ConcurrentCommitException`
  * rebases with a fresh version id, exactly like
  * `IndexManifest.mutate`. Time is a logical clock advanced by a
  * TICK action that jumps to the next deadline boundary
  * (`d - margin`, `d + 1`) — an unboundedly-stalled writer is any
  * schedule that stops stepping it, so zombie stalls of EVERY length
  * at EVERY point come free with exhaustiveness.
  *
  * KNOBS ([[LeaseModelCheck.Knobs]]) re-open each closed race so the
  * spec can prove the explorer actually SEES the bug class it guards
  * (negative controls): `claimVerify=false` re-admits the
  * recycled-generation double-holder, `releaseOverwrite=false`
  * re-admits the delete-release ABA, `fencePublish=false +
  * readbackDisown=false` re-admits the pruned-name lost update.
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
      readbackDisown: Boolean = true)

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
      knobs: Knobs = Knobs())

  /** Store keys: `L<gen>` lease files, `M<seq>` commit files,
    * `V<vid>` version dirs. Lease content: `H:<writer>:<deadline>`
    * (holder) or `R` (released stub). Commit content: comma-joined
    * lineage, newest first.
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

  /** Writer program counters, in protocol order. */
  private val AcqList = 0; private val AcqCreate = 1
  private val AcqVerify = 2; private val AcqPrune = 3
  private val Scan = 4; private val Fence = 5
  private val PubCreate = 6; private val PubVerify = 7
  private val Disown = 8; private val PubPrune = 9
  private val GcSnap = 10; private val GcReap = 11
  private val Release = 12
  private val Done = 13; private val Failed = 14

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
      acked: List[String]) {
    def vid(id: Int): String = s"w$id-r$round-a$attempt"
  }

  /** TIME is relative (timed-automata region style): every deadline —
    * in lease contents and writer records — is stored as an offset
    * from "now", a TICK jumps to the next boundary (fence give-up at
    * `d - margin`, lapse at `d + 1`) and decrements every deadline,
    * clamped at -1 (all offsets below 0 are semantically identical:
    * not live, not fence-true). Dropping the absolute clock merges
    * every time-shifted copy of a state, which is what makes the
    * space finite and exhaustively explorable.
    */
  final case class State(store: Store, ws: Vector[W]) {
    def key: String = {
      val sb = new StringBuilder
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
          .append(w.acked.mkString("+")).append('|')
      }
      sb.toString
    }
  }

  final case class Result(
      states: Long,
      violation: Option[(String, List[String])]) // (invariant, trace)

  /** One atomic step of writer `id`. Mirrors ManifestIo.scala's
    * withLock (lines ~770-900) and publishPointer (~945-1010); the
    * comment on each case names the real statement it models.
    */
  private def step(cfg: Config, st: State, id: Int): State = {
    val w = st.ws(id)
    val s = st.store
    def upd(w2: W, s2: Store = s): State =
      st.copy(store = s2, ws = st.ws.updated(id, w2))
    // ConcurrentCommitException: head for Release with the rebasing
    // flag set — the release itself is its own atomic step, exactly
    // like the real withLock finally block
    def lose(): State = upd(w.copy(pc = Release, rebasing = true))
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
        if (live) upd(w) // busy-poll; state unchanged → memo-pruned
        else upd(w.copy(pc = AcqCreate,
          next = gens.headOption.map(_._1).getOrElse(0) + 1))
      case AcqCreate =>
        // deadline stamp + conditional create of L<next>. The gap
        // between the LISTING that chose `next` (AcqList, arbitrarily
        // many scheduler steps ago) and this create landing is the
        // unbounded cold-JVM window of the r17 double-holder.
        val k = s"L${w.next}"
        if (w.next > cfg.maxGens) // generation bound: park, truncating
          upd(w.copy(pc = Failed, holding = false, deadline = -1))
        else if (s.contains(k)) upd(w.copy(pc = AcqList)) // racer took it
        else {
          val dl = cfg.ttl // now + TTL, relative
          // pre-fix protocols (claimVerify off) became holder right
          // here and pruned from the STALE listing; the fixed one
          // verifies against a fresh listing first
          val stalePrunes = leaseGens(s).collect {
            case (g, kk) if g < w.next => kk }.toList
          upd(w.copy(pc = if (cfg.knobs.claimVerify) AcqVerify
              else AcqPrune,
            deadline = dl,
            holding = !cfg.knobs.claimVerify,
            pruneQ = if (cfg.knobs.claimVerify) Nil else stalePrunes),
            s.updated(k, s"H:$id:$dl"))
        }
      case AcqVerify =>
        // CLAIM VERIFY (the r17 recycled-generation fix): fresh
        // listing; stand only as head with a fence-clearing deadline
        val fresh = leaseGens(s)
        val headGen = fresh.headOption.map(_._1).getOrElse(0)
        if (headGen > w.next || w.deadline <= cfg.margin) {
          // disown own claim as RELEASED, re-evaluate
          upd(w.copy(pc = AcqList, holding = false, deadline = -1),
            s.updated(s"L${w.next}", "R"))
        } else
          upd(w.copy(pc = AcqPrune, holding = true,
            pruneQ = fresh.collect {
              case (g, k) if g < w.next => k }.toList))
      case AcqPrune =>
        // prune superseded generations, one delete per step
        w.pruneQ match {
          case k :: rest => upd(w.copy(pruneQ = rest), s - k)
          case Nil => upd(w.copy(pc = Scan))
        }
      case Scan =>
        // readPointerForCommit: ONE listing feeds token (max seq) and
        // lineage. The staged version dir (STAGE + COMMITTED markers,
        // data) also materializes here — finalize happens inside the
        // lock, before publish, in the real commitImpl.
        val token = commitSeqs(s).headOption.getOrElse(0)
        upd(w.copy(pc = Fence, token = token,
          lineage = resolveLineage(s)),
          s.updated(s"V${w.vid(id)}", "x"))
      case Fence =>
        // publishPointer's lockStillHeld fence — its OWN step, so the
        // scheduler can stall arbitrarily long between the fence
        // passing and the create landing (the ambiguity window)
        if (cfg.knobs.fencePublish && !(w.deadline > cfg.margin))
          lose()
        else upd(w.copy(pc = PubCreate))
      case PubCreate =>
        // conditional create of MANIFEST-(token+1) — the CAS
        val k = s"M${w.token + 1}"
        if (s.contains(k)) lose()
        else upd(w.copy(pc = PubVerify),
          s.updated(k, (w.vid(id) :: w.lineage).mkString(",")))
      case PubVerify =>
        // re-list: gap >= keep AND the current lineage does NOT carry
        // us → recreate-of-a-pruned-name → disown; carried (or no
        // gap) → success (ACK) and queue tail prunes
        val seqs = commitSeqs(s)
        val gap = seqs.headOption.exists(_ - (w.token + 1) >= cfg.keep)
        val carried = resolveLineage(s).contains(w.vid(id))
        if (cfg.knobs.readbackDisown && gap && !carried)
          upd(w.copy(pc = Disown))
        else
          upd(w.copy(pc = PubPrune,
            acked = w.vid(id) :: w.acked,
            pruneQ = seqs.drop(cfg.keep).map(x => s"M$x").toList))
      case Disown =>
        // deleteIfExists of the never-resolvable commit file, then
        // lose loudly (its own step: other writers can interleave
        // between the delete and our release)
        lose().copy(store = s - s"M${w.token + 1}")
      case PubPrune =>
        w.pruneQ match {
          case k :: rest => upd(w.copy(pruneQ = rest), s - k)
          case Nil => upd(w.copy(pc = GcSnap))
        }
      case GcSnap =>
        // gc's snapshot (IndexManifest.gc): ONE scan feeds the
        // keep-set and the reap candidates; a zombie's snapshot can
        // be stale by the time its reaps run — the per-reap fence is
        // what makes that safe
        val keep = resolveLineage(s).toSet
        upd(w.copy(pc = GcReap,
          keepSet = keep,
          pruneQ = s.keysIterator.collect {
            case k if k.startsWith("V") && !keep.contains(k.drop(1)) =>
              k
          }.toList.sorted))
      case GcReap =>
        w.pruneQ match {
          case k :: rest =>
            // FENCED reap: every delete re-checks the lease
            // (lockStillHeld) — a lapsed holder skips
            val fenceOk = w.deadline > cfg.margin
            upd(w.copy(pruneQ = rest),
              if (fenceOk) s - k else s)
          case Nil => upd(w.copy(pc = Release))
        }
      case Release =>
        val s2 = release(cfg, s, w)
        val base = w.copy(holding = false, rebasing = false,
          deadline = -1, next = 0, token = 0, lineage = Nil,
          keepSet = Set.empty)
        val w2 =
          if (w.rebasing) {
            if (w.attempt + 1 >= cfg.maxAttempts)
              base.copy(pc = Failed)
            else base.copy(pc = AcqList, attempt = w.attempt + 1)
          } else if (w.round + 1 >= cfg.rounds) base.copy(pc = Done)
          else base.copy(pc = AcqList, round = w.round + 1, attempt = 0)
        upd(w2, s2)
      case _ => st
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
    * give-up (`d - margin`) or a lease lapse (`d + 1`). Ticking jumps
    * straight to the nearest one — intermediate instants change no
    * comparison, so they would only multiply states.
    */
  private def nextTick(cfg: Config, st: State): Option[Int] = {
    val deadlines =
      st.store.valuesIterator.collect {
        case v if v.startsWith("H:") => v.split(":")(2).toInt
      }.toSeq ++
        st.ws.collect { case w if w.holding => w.deadline }
    val deltas = deadlines.flatMap(d =>
      Seq(d - cfg.margin, d + 1)).filter(_ > 0)
    if (deltas.isEmpty) None else Some(deltas.min)
  }

  /** Advance time by `delta`: every relative deadline decrements,
    * clamped at -1 (all sub-zero offsets are semantically identical —
    * not live, not fence-true — so clamping merges them).
    */
  private def applyTick(st: State, delta: Int): State = {
    def adj(d: Int): Int = math.max(-1, d - delta)
    val s2: Store = st.store.map {
      case (k, v) if v.startsWith("H:") =>
        val p = v.split(":")
        (k, s"H:${p(1)}:${adj(p(2).toInt)}")
      case kv => kv
    }
    State(s2, st.ws.map(w => w.copy(deadline = adj(w.deadline))))
  }

  private def checkInvariants(cfg: Config, st: State)
      : Option[String] = {
    // I1: never two fence-true holders
    val fenceTrue = st.ws.count(w =>
      w.holding && w.deadline > cfg.margin)
    if (fenceTrue > 1)
      return Some(s"single-holder violated: $fenceTrue fence-true " +
        "holders")
    // I2: every acknowledged version stays materialized AND in the
    // resolved lineage (model retains everything)
    val lineage = resolveLineage(st.store).toSet
    for (w <- st.ws; v <- w.acked) {
      if (!st.store.contains(s"V$v"))
        return Some(s"durable-lineage violated: acked $v's version " +
          "dir was reaped")
      if (!lineage.contains(v))
        return Some(s"durable-lineage violated: acked $v left the " +
          "resolved lineage")
    }
    None
  }

  /** Exhaustive DFS with state memoization. Invariants are checked
    * at EVERY reachable state; the first violation returns its
    * schedule (step labels, oldest first).
    */
  def explore(cfg: Config): Result = {
    val init = State(Map.empty,
      Vector.tabulate(cfg.writers)(_ => W(AcqList, 0, 0, 0, -1,
        holding = false, rebasing = false, 0, Nil, Nil, Set.empty,
        Nil)))
    val visited = new java.util.HashSet[String]()
    var states = 0L
    // explicit stack of (state, trace)
    val stack = new java.util.ArrayDeque[(State, List[String])]()
    stack.push((init, Nil))
    visited.add(init.key): Unit
    while (!stack.isEmpty) {
      val (st, trace) = stack.pop()
      states += 1
      if (states > cfg.maxStates)
        throw new IllegalStateException(
          s"state budget exceeded (${cfg.maxStates}) — shrink the config")
      if (states % 5_000_000 == 0)
        System.err.println(s"[explore] $states states, " +
          s"frontier ${stack.size}")
      checkInvariants(cfg, st) match {
        case Some(v) => return Result(states, Some((v, trace.reverse)))
        case None =>
      }
      // successor: step each live writer
      for (id <- 0 until cfg.writers) {
        val pc = st.ws(id).pc
        if (pc != Done && pc != Failed) {
          val nxt = step(cfg, st, id)
          if (visited.add(nxt.key))
            stack.push((nxt, s"w$id@pc$pc" :: trace))
        }
      }
      // successor: time jump to the next deadline boundary
      nextTick(cfg, st).foreach { d =>
        val nxt = applyTick(st, d)
        if (visited.add(nxt.key))
          stack.push((nxt, s"tick+$d" :: trace))
      }
    }
    Result(states, None)
  }

  def main(args: Array[String]): Unit = {
    if (args.length == 1 && !args(0).startsWith("off=")) {
      System.err.println("usage: LeaseModelCheck [writers rounds " +
        "[keep] [ttl] [attempts] [maxGens] [off=knob,knob]] — knobs: " +
        "claimVerify releaseOverwrite fencePublish readbackDisown; " +
        "no args = standard configs")
      sys.exit(2)
    }
    val configs =
      if (args.nonEmpty) {
        val KnownKnobs = Set("claimVerify", "releaseOverwrite",
          "fencePublish", "readbackDisown")
        val off = args.filter(_.startsWith("off="))
          .flatMap(_.stripPrefix("off=").split(",")).toSet
        val unknown = off -- KnownKnobs
        val pos = args.filterNot(_.startsWith("off="))
        // a typo'd knob must not silently explore the fully-fixed
        // model and report a clean "negative control"
        if (unknown.nonEmpty || pos.length < 2) {
          System.err.println(
            if (unknown.nonEmpty)
              s"unknown knob(s): ${unknown.mkString(",")} — known: " +
                KnownKnobs.toSeq.sorted.mkString(",")
            else "need at least <writers> <rounds>")
          sys.exit(2)
        }
        Seq((args.mkString("_"), Config(
          writers = pos(0).toInt,
          rounds = pos(1).toInt,
          keep = if (pos.length > 2) pos(2).toInt else 2,
          ttl = if (pos.length > 3) pos(3).toInt else 4,
          maxAttempts = if (pos.length > 4) pos(4).toInt else 2,
          maxGens = if (pos.length > 5) pos(5).toInt else 6,
          knobs = Knobs(
            claimVerify = !off("claimVerify"),
            releaseOverwrite = !off("releaseOverwrite"),
            fencePublish = !off("fencePublish"),
            readbackDisown = !off("readbackDisown")))))
      }
      else Seq(
        ("2w1r", Config(writers = 2, rounds = 1)),
        ("2w2r", Config(writers = 2, rounds = 2)),
        // three-way contention: rebases off and a tighter generation
        // bound keep the space tractable; acquisition/lease races
        // need no rebase to manifest
        ("3w1r", Config(writers = 3, rounds = 1, maxAttempts = 1,
          maxGens = 5)))
    configs.foreach { case (name, cfg) =>
      val t0 = System.nanoTime()
      val r = explore(cfg)
      val ms = (System.nanoTime() - t0) / 1000000
      println(s"""{"config":"$name","states":${r.states},""" +
        s""""violation":${r.violation.map(v =>
          "\"" + v._1 + "\"").getOrElse("null")},"ms":$ms}""")
      r.violation.foreach { case (inv, trace) =>
        System.err.println(s"$name VIOLATION: $inv")
        trace.foreach(t => System.err.println(s"  $t"))
        sys.exit(1)
      }
    }
  }
}
