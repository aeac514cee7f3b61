#!/usr/bin/env python3
"""Hostile CommitStorm loop under CPU load — the interleaving hunter.

Loops the cross-process hostile storm (3 JVMs, shrunken lease TTL,
injected zombie publish-stalls) against a fresh root per iteration,
under a configurable spinner load, and verifies after each iteration:

  - lineage completeness: every (writer, round) marker present exactly
    once in the resolved lineage (zero lost updates, zero duplicates)
  - commit tail bounded (<= 8 MANIFEST-<seq> files)
  - every surviving COMMIT_LOCK* file is a RELEASED stub
  - all storm JVMs exited 0

Modes:
  file    — file:// roots (kernel link(2) conditional-create bridge)
  mocks3  — mocks3:// roots (MockS3FileSystem: conditional PUT
            arbitrated at close(), no rename; requires test-classes on
            the classpath and the trustConditionalCreate opt-in, both
            wired here)
  nemesis — mocks3 plus TRANSIENT-FAULT injection: every distinct
            (op, key) throws one plain IOException before the op
            applies (-Dmocks3.transientFaults). Storm JVMs run the
            documented recovery recipe (-Dgraft.storm.retryTransient:
            on a loud commit fault, check whether the version landed —
            post-publish faults leave it durable — else re-drive), so
            the FULL completeness verification still applies: under
            throttling, every mutate either succeeds or fails loudly
            and converges on retry, lineage never corrupts, no silent
            lost update, no double-apply. The iteration additionally
            asserts faults actually fired.

Usage:
  python3 tools/hostile_loop.py <file|mocks3|nemesis> <iterations>
      [rounds=8] [ttl_ms=700] [stall_every=5] [spinners=24]

This is how round 17 caught the recycled-generation double-holder and
the reservation-window misclassification: races needing a ~700 ms
listing-to-create gap only fire on a loaded machine (cold-JVM
classloading under CPU contention). A clean 60-iteration loop under
load is the bar for lease/GC protocol changes.
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAIN_CP = os.path.join(REPO, "target/scala-2.13/classes")
TEST_CP = os.path.join(REPO, "target/scala-2.13/test-classes")
SPARK_JARS = "/opt/spark/jars/*"
WRITERS = 3


def spawn_spinners(n):
    return [subprocess.Popen(["sh", "-c", "while :; do :; done"],
                             stdout=subprocess.DEVNULL)
            for _ in range(n)]


def storm_procs(mode, root, backing_base, rounds, ttl, stall_every):
    cp = f"{MAIN_CP}:{TEST_CP}:{SPARK_JARS}"
    procs = []
    for w in range(WRITERS):
        log = tempfile.NamedTemporaryFile(
            prefix=f"hl{w}_", suffix=".log", delete=False)
        cmd = [os.path.join(os.environ.get("JAVA_HOME", "/usr"),
                            "bin", "java"),
               "-cp", cp]
        if mode in ("mocks3", "nemesis"):
            cmd += ["-Dspark.graft.manifest.trustConditionalCreate=true",
                    f"-Dmocks3.backing={backing_base}"]
        if mode == "nemesis":
            cmd += ["-Dmocks3.transientFaults=true",
                    "-Dgraft.storm.retryTransient=true"]
        cmd += ["graft.tools.CommitStorm", root, f"p{w}",
                str(rounds), str(ttl), str(stall_every)]
        procs.append((subprocess.Popen(cmd, stdout=log, stderr=log),
                      log.name))
    return procs


def verify(local, rounds, logs):
    """Verify one iteration through the backing/local dir."""
    names = os.listdir(local)
    manifests = sorted(n for n in names if n.startswith("MANIFEST-"))
    assert manifests, f"no commit files in {local}: {names}"
    assert len(manifests) <= 8, f"commit tail unbounded: {manifests}"
    head = os.path.join(local, manifests[-1])
    lineage = [ln.strip() for ln in open(head) if ln.strip()]
    want = WRITERS * rounds
    assert len(lineage) == want, \
        f"lineage {len(lineage)}/{want} — LOST UPDATE\n" + "\n".join(logs)
    markers = []
    for v in lineage:
        data = os.path.join(local, v, "data")
        assert os.path.isfile(data), f"committed {v} lost its content"
        markers.append(open(data).read())
    assert len(set(markers)) == len(markers), f"duplicate markers: {markers}"
    expect = {f"p{w}-round-{j}" for w in range(WRITERS)
              for j in range(rounds)}
    assert set(markers) == expect, \
        f"marker set mismatch: missing {expect - set(markers)}"
    for n in names:
        if n.startswith("COMMIT_LOCK"):
            content = open(os.path.join(local, n)).read()
            assert content.startswith("RELEASED"), \
                f"lease {n} leaked holder content: {content}"


def main():
    mode = sys.argv[1]
    iterations = int(sys.argv[2])
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ttl = int(sys.argv[4]) if len(sys.argv) > 4 else 700
    stall_every = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    n_spin = int(sys.argv[6]) if len(sys.argv) > 6 else 24
    assert mode in ("file", "mocks3", "nemesis")
    base = tempfile.mkdtemp(prefix=f"hostile_{mode}_")
    spinners = spawn_spinners(n_spin)
    stalls = 0
    rebases = 0
    faults = 0
    procs = []
    try:
        for it in range(iterations):
            tag = f"it{it}-{uuid.uuid4().hex[:6]}"
            if mode == "file":
                local = os.path.join(base, tag, "idx")
                root = f"file://{local}"
                backing_base = None
            else:
                backing_base = base
                root = f"mocks3://{tag}/idx"
                local = os.path.join(base, tag, "objects", "idx")
            t0 = time.time()
            procs = storm_procs(mode, root, backing_base, rounds,
                                ttl, stall_every)
            logs = []
            for p, logname in procs:
                rc = p.wait(timeout=420)
                logs.append(open(logname).read())
                assert rc == 0, f"storm JVM exited {rc}\n{logs[-1]}"
            verify(local, rounds, logs)
            all_logs = "".join(logs)
            stalls += all_logs.count("stalling past the lease TTL")
            rebases += all_logs.count("rebasing")
            it_faults = all_logs.count("injected transient fault")
            faults += it_faults
            if mode == "nemesis":
                assert it_faults > 0, \
                    "nemesis iteration injected no faults — the " \
                    "nemesis is not armed"
            for _, logname in procs:
                os.unlink(logname)
            procs = []
            print(json.dumps({
                "iter": it, "ok": True, "wall_s": round(time.time() - t0, 1),
                "stalls": stalls, "rebases": rebases, "faults": faults}),
                flush=True)
            shutil.rmtree(os.path.join(base, tag), ignore_errors=True)
        print(json.dumps({
            "mode": mode, "iterations": iterations, "rounds": rounds,
            "ttl_ms": ttl, "stall_every": stall_every,
            "spinners": n_spin, "total_stalls": stalls,
            "total_rebases": rebases, "total_faults": faults,
            "result": "CLEAN"}), flush=True)
    finally:
        # a failed assertion must not leave storm JVMs mutating the
        # shared backing dir behind the report, nor leak their logs
        for p, logname in procs:
            try:
                p.kill()
                p.wait(timeout=30)
            except Exception:
                pass
            try:
                os.unlink(logname)
            except OSError:
                pass
        for s in spinners:
            s.kill()
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
