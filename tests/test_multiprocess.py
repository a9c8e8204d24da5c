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


@pytest.mark.rendered
def test_sequence_streaming_client(tmp_path):
    """The sequence-streaming client mode (ROS-node deployment shape): a
    client process runs the FULL tracking front-end over a rendered-pixels
    sequence, interleaving the 5 Hz publish/ack cycle over native TCP; the
    server ingests, acks, and returns vicinity feedback on the same cycle."""
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    out = str(tmp_path / "mp_seq")
    common = ["--cpu", "--profile", "rendered", "--factor", "0.4",
              "--timeout", "900"]
    env = {**os.environ, "JAX_PLATFORMS": ""}
    srv = subprocess.Popen(
        [sys.executable, SCRIPT, "server", "--port", str(port), "--agents",
         "1", "--out", out, "--quiescence", "5", "--vicinity", "6"] + common,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    cli = subprocess.Popen(
        [sys.executable, SCRIPT, "client", "--agent", "0", "--connect",
         f"127.0.0.1:{port}", "--seq", "rendered:corridor:0:60:0-0.07",
         "--kf-budget", "40", "--mp-budget", "2500"] + common,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    try:
        cli_out, _ = cli.communicate(timeout=950)
        srv_out, _ = srv.communicate(timeout=950)
    finally:
        for p in (cli, srv):
            if p.poll() is None:
                p.kill()
    assert cli.returncode == 0, cli_out + srv_out
    assert srv.returncode == 0, srv_out

    def events(text):
        out = []
        for l in text.splitlines():
            try:
                out.append(json.loads(l))
            except (json.JSONDecodeError, ValueError):
                pass
        return out

    ce = events(cli_out)
    done = [e for e in ce if e.get("event") == "client_done"]
    assert done and done[0]["mode"] == "sequence", cli_out
    assert done[0]["frames"] == 60
    assert done[0]["publishes"] >= 3, done[0]
    assert done[0]["kfs"] >= 4, done[0]
    se = events(srv_out)
    summary = [e for e in se if e.get("event") == "run_summary"]
    assert summary, srv_out
    n_kfs = summary[0]["trajectories"]["0"]["n_kfs"]
    assert n_kfs >= 4, summary[0]
