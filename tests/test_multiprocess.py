"""Multi-process deployment over the native TCP transport: the reference's
"server + N client processes glued by ROS" topology (readme.md:172-177),
here as real OS processes exchanging MapMsg pytrees over NativeChannel.

This is an integration smoke: 2 client processes stream synthetic corridor
maps to a server process, the server must detect the overlap, merge, run the
final GBA, and write one TUM trajectory per agent."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_multiprocess.py")


def test_two_agent_deployment(tmp_path):
    out = str(tmp_path / "mp")
    proc = subprocess.run(
        [sys.executable, SCRIPT, "launch", "--agents", "2", "--out", out,
         "--cpu", "--timeout", "500"],
        capture_output=True, text=True, timeout=540,
        env={**os.environ, "JAX_PLATFORMS": ""},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    events = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    summary = [e for e in events if e.get("event") == "run_summary"]
    assert summary, events
    s = summary[0]
    assert s["merges"] >= 1
    assert s["agents_share_map"] is True
    done = [e for e in events if e.get("event") == "client_done"]
    assert len(done) == 2
    assert all(d["kfs_acked"] == 4 for d in done)
    for a in range(2):
        path = os.path.join(out, f"KF_GBA_{a}.csv")
        assert os.path.exists(path)
        rows = np.loadtxt(path)
        assert rows.shape == (4, 8)  # TUM: ts x y z qx qy qz qw
    # merged gauge consistency across processes: co-located keyframes from
    # the two agents must coincide IN THE SHARED MAP GAUGE (whichever agent's
    # gauge the merge kept).  Agent0's corridor is x=0,1,2,3 in kf order;
    # agent1's runs backwards x=4,3,2,1 — so rows (2,2) and (3,1) co-locate.
    t0 = np.loadtxt(os.path.join(out, "KF_GBA_0.csv"))[:, 1:4]
    t1 = np.loadtxt(os.path.join(out, "KF_GBA_1.csv"))[:, 1:4]
    step = np.linalg.norm(t0[1] - t0[0])  # one corridor unit in map gauge
    assert np.linalg.norm(t0[2] - t1[2]) < 0.2 * step, (t0, t1)
    assert np.linalg.norm(t0[3] - t1[1]) < 0.2 * step, (t0, t1)
