"""bench.py CPU-attribution ledger (r12): the ambient-contention
measure splits total busy jiffies into THIS process tree vs everything
else. These tests pin the ledger's two contracts without needing an
idle box:

1. CPU burned by this process (and by a spawned child, live or
   reaped) lands in the TREE side of the ledger — so a bench sweep's
   own local[32] work can never masquerade as ambient load.
2. The tree side never exceeds the total busy side (ambient =
   busy - tree is non-negative by clamping, but the raw inequality
   should hold up to jiffy-sampling slop).

Ambient itself is NOT asserted ≈0 — other processes on a shared box
are exactly what the metric exists to see.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402

_HZ = os.sysconf("SC_CLK_TCK")


def _burn(seconds: float) -> None:
    t0 = time.process_time()
    x = 0
    while time.process_time() - t0 < seconds:
        x += 1


def test_own_cpu_attributed_to_tree():
    busy0, tree0 = bench._cpu_snapshot()
    _burn(0.5)
    busy1, tree1 = bench._cpu_snapshot()
    tree_s = (tree1 - tree0) / _HZ
    # jiffy granularity: 0.5 s of burn is ≥ ~0.35 s of tree jiffies
    assert tree_s >= 0.35, f"own 0.5s burn only {tree_s:.2f}s in tree"
    assert busy1 - busy0 >= tree1 - tree0 - 2, "tree exceeded total busy"


def test_reaped_child_cpu_attributed_to_tree():
    # a child that burns CPU and EXITS before the end snapshot: its
    # time must reach the tree via the parent's cutime/cstime fold
    busy0, tree0 = bench._cpu_snapshot()
    subprocess.run(
        [
            sys.executable,
            "-c",
            "import time\n"
            "t0 = time.process_time()\n"
            "x = 0\n"
            "while time.process_time() - t0 < 0.5:\n"
            "    x += 1\n",
        ],
        check=True,
    )
    busy1, tree1 = bench._cpu_snapshot()
    tree_s = (tree1 - tree0) / _HZ
    assert tree_s >= 0.35, (
        f"reaped child's 0.5s burn only {tree_s:.2f}s in tree — "
        f"cutime/cstime fold broken"
    )


def test_live_child_cpu_attributed_to_tree():
    # a child still RUNNING at the end snapshot: its time must reach
    # the tree via the /proc descendant walk, not cutime
    busy0, tree0 = bench._cpu_snapshot()
    p = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import time\n"
            "t0 = time.process_time()\n"
            "x = 0\n"
            "while time.process_time() - t0 < 1.0:\n"
            "    x += 1\n"
            "time.sleep(30)\n",
        ],
    )
    try:
        # (r13, r12 ADVICE) poll until the tree delta reaches the
        # threshold instead of a fixed 1.6 s wall sleep: on a contended
        # box the child may be descheduled and a fixed sleep flakes.
        # The child burns 1.0 s of CPU then sleeps 30 s, so it stays
        # alive (testing the /proc descendant walk, not cutime) for
        # any realistic poll duration.
        deadline = time.monotonic() + 20.0
        tree_s = 0.0
        while time.monotonic() < deadline:
            _, tree1 = bench._cpu_snapshot()
            tree_s = (tree1 - tree0) / _HZ
            if tree_s >= 0.7:
                break
            time.sleep(0.2)
        assert tree_s >= 0.7, (
            f"live child's 1.0s burn only {tree_s:.2f}s in tree after "
            f"20s — descendant walk broken"
        )
        assert p.poll() is None, "child exited early — cutime, not walk"
    finally:
        p.kill()
        p.wait()


def test_orphan_cpu_lands_on_ambient_side():
    """End-to-end for the r13 per-query contamination labels: CPU
    burned by a process OUTSIDE this process tree must show up as
    ambient (busy − tree). A double-fork orphans the burner (it is
    reparented to init, so the /proc descendant walk from this pid
    can never reach it) — the in-test stand-in for 'another job on
    the driver box'. The end snapshot is taken only after polling the
    orphan's own /proc stat shows ≥1.0 s of accumulated CPU, so the
    assertion is on absolute jiffies, not on racy wall-clock rates."""
    r_fd, w_fd = os.pipe()
    pid = os.fork()
    if pid == 0:  # child: fork the burner grandchild, then exit
        os.close(r_fd)
        gpid = os.fork()
        if gpid == 0:  # grandchild: report pid, burn 1.5s CPU, exit
            os.write(w_fd, str(os.getpid()).encode())
            os.close(w_fd)
            t0 = time.process_time()
            x = 0
            while time.process_time() - t0 < 1.5:
                x += 1
            os._exit(0)
        os._exit(0)
    os.close(w_fd)
    busy0, tree0 = bench._cpu_snapshot()
    os.waitpid(pid, 0)  # reap the middle child → grandchild is orphaned
    orphan = int(os.read(r_fd, 32) or b"0")
    os.close(r_fd)
    assert orphan > 0, "orphan pid never reported"

    def orphan_cpu() -> float:
        try:
            with open(f"/proc/{orphan}/stat") as fh:
                f = fh.read().rsplit(")", 1)[1].split()
            return (int(f[11]) + int(f[12])) / _HZ
        except OSError:  # orphan exited — it burned the full 1.5s
            return 1.5

    deadline = time.monotonic() + 30.0
    while orphan_cpu() < 1.0 and time.monotonic() < deadline:
        time.sleep(0.1)
    assert orphan_cpu() >= 1.0, "orphan never accumulated 1.0s CPU"
    busy1, tree1 = bench._cpu_snapshot()
    ambient_s = ((busy1 - busy0) - (tree1 - tree0)) / _HZ
    assert ambient_s >= 0.7, (
        f"orphan's 1.0s+ burn shows only {ambient_s:.2f}s ambient — "
        f"outside-tree CPU not attributed to the ambient side"
    )


def test_steal_snapshot_monotonic_nonnegative():
    """(r13) The steal ledger: cumulative jiffies, never negative,
    never decreasing. On bare metal (no steal field activity) both
    snapshots are 0 and the delta contract still holds. Steal is NOT
    part of _cpu_snapshot's busy side (r12 ADVICE) — this separate
    counter is what lets a throttled sweep self-label instead of
    reading as a slow box with ambient=0."""
    s0 = bench._steal_snapshot()
    assert isinstance(s0, int) and s0 >= 0
    _burn(0.2)
    s1 = bench._steal_snapshot()
    assert s1 >= s0
