"""Grouped-process pytest runner — full-suite process isolation.

Why this exists (VERDICT r3 #7): a full-suite run in ONE process
accumulates hundreds of XLA:CPU executables and reproducibly segfaults
near ~84% (accumulated jaxlib/XLA:CPU process state — the same test
passes in a fresh process; diagnosis in RESULTS.md round-3). Round 3
bounded it with two crutches: an autouse per-module ``jax.clear_caches``
fixture (+20% suite wall in cross-module recompiles) and a 1 GB
pre-reserved worker-thread stack (tests/_stack_main.py). This runner
replaces both for the standard full-suite invocation:

* test modules are chunked into groups of ``RSPC_TEST_GROUP`` (default
  8) and each group runs in a FRESH ``python -m pytest`` process — the
  executable population per process stays far below the crash
  threshold, no cache clearing needed, and modules within a group share
  jit caches (recovering the fixture's recompile cost);
* the parent raises RLIMIT_STACK to unlimited before spawning, so each
  child's exec reserves an unbounded-growth main stack (XLA:CPU's
  compile passes recurse past the default 8 MB on the fused pipeline
  programs; a growing stack is safe in a SHORT session — the round-2
  failure mode needed ~150 tests of accumulated mappings before a
  collision). If the rlimit cannot be raised, children run via
  tests/_stack_main.py (reserved-stack fallback) instead.

Invocation routing lives in tests/conftest.py: standalone ``pytest``
runs re-exec here; this module decides grouped vs single-process. Runs
that cannot be grouped faithfully — explicit ``-m``/``-k`` filters,
node ids, ``--collect-only``, on-chip lanes, or fewer than
``_MIN_MODULES`` modules — fall through to the single-process
reserved-stack path (tests/_stack_main.py), which keeps the per-module
clear_caches fixture as its bounded-crutch defense (see conftest).
"""

import glob
import os
import re
import subprocess
import sys
import time

_GROUP = int(os.environ.get("RSPC_TEST_GROUP", "8"))
_MIN_MODULES = 10

# flags that consume the NEXT argv element
_VALUE_FLAGS = {"-m", "-k", "-p", "-o", "-W", "--deselect", "--ignore",
                "--rootdir", "--confcutdir", "--basetemp", "--junitxml",
                "--color", "--tb", "--maxfail", "--durations"}
# flags that force single-process mode (grouping would change semantics
# or is pointless)
_SINGLE_FLAGS = {"-m", "-k", "--collect-only", "--co", "--lf",
                 "--last-failed", "--ff", "--failed-first", "--sw",
                 "--stepwise", "--pdb", "-s"}


def _split(argv):
    flags, targets = [], []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in _VALUE_FLAGS and i + 1 < len(argv):
            flags.extend(argv[i:i + 2])
            i += 2
            continue
        if a.startswith("-"):
            flags.append(a)
            i += 1
            continue
        targets.append(a)
        i += 1
    return flags, targets


def _modules(targets):
    """Expand dir/file targets into test module paths, or None when the
    target set cannot be grouped faithfully (node ids, odd files)."""
    mods = []
    for t in targets:
        if "::" in t:
            return None
        if os.path.isdir(t):
            mods.extend(sorted(glob.glob(os.path.join(t, "test_*.py"))))
        elif os.path.isfile(t) and os.path.basename(t).startswith("test_"):
            mods.append(t)
        else:
            return None
    # de-dup, keep order
    seen, out = set(), []
    for m in mods:
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out


_SUMMARY_RE = re.compile(
    r"(\d+) (passed|failed|skipped|errors?|deselected|xfailed|xpassed)"
)

# Compile-affinity grouping (VERDICT r4 #6): modules in one group share a
# process and therefore a jit cache, so modules that compile the SAME
# fused-chain programs (same configs, same shapes — guesses are traced
# inputs) must co-locate or every group re-pays a minutes-long XLA:CPU
# compile. Clusters, from the measured r5 duration profile:
#   * robust-chain family (rescue/refine/gate/posegraph/...) — each
#     compiles robust-config variants at its own shapes;
#   * auto + CLI surface — test_auto and the --preset CLI tests share
#     the 3-frame 80x60 north_star/robust_map programs by construction;
#   * feature/image ops; * kernels/parallel/pipeline.
# Modules not named here are appended to the lightest cluster, then
# oversized clusters split at _GROUP (the per-process executable
# population bound that motivated grouping in the first place).
_AFFINITY = [
    ["test_gate_sensitivity", "test_posegraph", "test_presets",
     "test_refine", "test_rescue", "test_synthetic_robustness",
     "test_native", "test_tpu_lane"],
    ["test_auto", "test_viz_cli", "test_capture_cli",
     "test_trajectory_viz", "test_overlays", "test_cloud",
     "test_estimators", "test_make_replay"],
    ["test_feature_quality", "test_features", "test_colorgrad",
     "test_image_ops", "test_icp", "test_icp_oracle", "test_goldens",
     "test_ndt"],
    ["test_batched_chain", "test_parallel", "test_pipeline",
     "test_ndt_derivatives", "test_nn_onchip", "test_nn_pallas",
     "test_ops", "test_pcd_io"],
]


def _affinity_groups(mods):
    """Order modules into the affinity clusters above (preserving the
    cluster layout), append unknown modules to the last cluster, and
    split anything beyond _GROUP."""
    stem = {os.path.splitext(os.path.basename(m))[0]: m for m in mods}
    used = set()
    clusters = []
    for names in _AFFINITY:
        c = [stem[n] for n in names if n in stem]
        used.update(os.path.splitext(os.path.basename(m))[0] for m in c)
        if c:
            clusters.append(c)
    extra = [m for m in mods
             if os.path.splitext(os.path.basename(m))[0] not in used]
    if extra:
        if clusters:
            clusters[-1].extend(extra)
        else:
            clusters.append(extra)
    groups = []
    for c in clusters:
        groups.extend(c[i:i + _GROUP] for i in range(0, len(c), _GROUP))
    return groups


def main():
    argv = sys.argv[1:]
    flags, targets = _split(argv)

    single = (
        os.environ.get("RSPC_ONCHIP_TESTS") == "1"
        or any(f in _SINGLE_FLAGS for f in flags)
    )
    mods = None if single else _modules(targets or ["tests"])
    stack_main = os.path.join(os.path.dirname(__file__), "_stack_main.py")
    if mods is None or len(mods) < _MIN_MODULES:
        os.execv(sys.executable, [sys.executable, stack_main] + argv)

    # unlimited-growth main stack for the children (see module docstring)
    child_prefix = [sys.executable, "-m", "pytest"]
    try:
        import resource

        resource.setrlimit(
            resource.RLIMIT_STACK,
            (resource.RLIM_INFINITY, resource.RLIM_INFINITY),
        )
    except Exception:
        child_prefix = [sys.executable, stack_main]

    groups = _affinity_groups(mods)
    exit_first = "-x" in flags or "--exitfirst" in flags
    env = dict(os.environ, RSPC_PROC_CHILD="1")
    tallies = {}
    rcs = []
    t0 = time.time()
    # Group overlap (VERDICT r4 #6): on a multi-CPU box the groups run
    # concurrently up to RSPC_TEST_CONCURRENCY (default: CPU count,
    # capped at the group count) — XLA:CPU compiles are single-threaded
    # per process, so overlapping fresh pytest processes scales the
    # suite wall down nearly linearly. A 1-CPU box keeps the serial
    # streaming path (concurrency would only thrash).
    conc = int(os.environ.get("RSPC_TEST_CONCURRENCY", "0")) or max(
        1, min(len(groups), os.cpu_count() or 1)
    )
    print(
        f"[proc-runner] {len(mods)} modules in {len(groups)} "
        f"process groups of <= {_GROUP}"
        + (f", {conc} concurrent" if conc > 1 else ""),
        flush=True,
    )

    def _tally(gi, rc, text, tg):
        rcs.append(rc)
        tail = "".join(text.splitlines(keepends=True)[-50:])
        for n, kind in _SUMMARY_RE.findall(tail):
            k = "error" if kind.startswith("error") else kind
            tallies[k] = tallies.get(k, 0) + int(n)
        print(
            f"[proc-runner] group {gi + 1}/{len(groups)} exit {rc} "
            f"({time.time() - tg:.0f}s)",
            flush=True,
        )

    if conc == 1:
        for gi, group in enumerate(groups):
            tg = time.time()
            p = subprocess.Popen(
                child_prefix + flags + group,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
            text = []
            for line in p.stdout:
                sys.stdout.write(line)
                text.append(line)
            rc = p.wait()
            _tally(gi, rc, "".join(text), tg)
            if rc in (2, 3, 4):  # interrupted / internal / usage error
                break
            if rc not in (0, 5) and exit_first:
                break
    else:
        import threading

        lock = threading.Lock()
        stop = threading.Event()
        next_gi = [0]

        def worker():
            while not stop.is_set():
                with lock:
                    gi = next_gi[0]
                    if gi >= len(groups):
                        return
                    next_gi[0] += 1
                tg = time.time()
                p = subprocess.Popen(
                    child_prefix + flags + groups[gi],
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                    env=env,
                )
                out, _ = p.communicate()
                with lock:
                    sys.stdout.write(out)
                    _tally(gi, p.returncode, out, tg)
                    if p.returncode in (2, 3, 4) or (
                        p.returncode not in (0, 5) and exit_first
                    ):
                        stop.set()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(conc)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()

    summary = ", ".join(f"{v} {k}" for k, v in sorted(tallies.items()))
    print(
        f"[proc-runner] TOTAL: {summary or 'nothing collected'} "
        f"in {time.time() - t0:.0f}s",
        flush=True,
    )
    if any(rc in (2, 3, 4) for rc in rcs):
        sys.exit(next(rc for rc in rcs if rc in (2, 3, 4)))
    if any(rc == 1 for rc in rcs):
        sys.exit(1)
    if rcs and all(rc == 5 for rc in rcs):
        sys.exit(5)
    sys.exit(0)


if __name__ == "__main__":
    main()
