"""Multi-process centralized deployment over the native TCP transport.

The reference deploys as one server process + N<=4 client processes, possibly
on different machines, glued by ROS topics (readme.md:172-177, Server.launch +
Client<i>_euroc.launch).  This runner is that deployment for ccm_slam_tpu:
the framed-TCP ``NativeChannel`` replaces the ROS topic pair, the delta/ack
communicator provides the reliability layer, and the server process owns the
maps, place recognition, merges, and GBA.

Single-host smoke (spawns server + N clients as subprocesses):
  python scripts/run_multiprocess.py launch --agents 2 --out /tmp/mp_out

Multi-host (one command per host, like ROS_MASTER_URI setups):
  host A:  python scripts/run_multiprocess.py server --port 7800 --agents 2 --out out/
  host B:  python scripts/run_multiprocess.py client --agent 0 --connect hostA:7800
  host C:  python scripts/run_multiprocess.py client --agent 1 --connect hostA:7800

Clients stream either a synthetic corridor (default; deterministic world
shared via --world-seed) or an EuRoC sequence (--seq, full tracker).
The server writes KF_GBA_<agent>.csv per agent (the reference's trajectory
product) plus a run summary JSON.
"""

import argparse
import json
import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _common_setup(cpu: bool, args=None):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    if args is not None and getattr(args, "coordinator", None):
        # process-spanning device mesh (the multi-host slice of BASELINE
        # config 4): every participating process calls in with the same
        # coordinator; jax.devices() then covers ALL hosts' chips and the
        # GBA mesh in run_server spans them via ordinary ICI/DCN collectives
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )


def _build_cfg(n_feat):
    from ccm_slam_tpu.config import (
        CameraConfig, CapacityConfig, PlaceRecConfig, SystemConfig,
    )

    return SystemConfig(
        capacity=CapacityConfig(
            max_keypoints=n_feat,
            client_max_kfs=16,
            client_max_mps=1024,
            server_max_kfs=64,
            server_max_mps=4096,
            max_obs_per_mp=8,
        ),
        placerec=PlaceRecConfig(start_map_matching_after_kf=0),
    )


def _camera():
    from ccm_slam_tpu.config import CameraConfig
    from ccm_slam_tpu.utils.camera import Camera

    return Camera.from_config(CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0))


def _vocab(world_seed: int):
    import jax
    import jax.numpy as jnp

    from ccm_slam_tpu.io.synthetic import make_world
    from ccm_slam_tpu.ops import bow

    _, wdesc = make_world(np.random.RandomState(world_seed), n=300)
    return bow.train_vocabulary(
        jax.random.PRNGKey(0), jnp.asarray(wdesc), jnp.ones(len(wdesc), bool),
        n_words=256, iters=6,
    )


# ----------------------------------------------------------------- server ----


def run_server(args):
    _common_setup(args.cpu, args)
    from ccm_slam_tpu.io.trajectory import write_tum
    from ccm_slam_tpu.native import NativeChannel
    from ccm_slam_tpu.runtime.server import Server

    os.makedirs(args.out, exist_ok=True)
    cfg = _build_cfg(args.n_feat)
    server = Server(cfg=cfg, cam=_camera(), vocab=_vocab(args.world_seed),
                    n_agents=args.agents)
    server.quiescence_steps = args.quiescence
    if getattr(args, "dist_gba", False):
        import jax as _jax

        from ccm_slam_tpu.parallel import dist_ba

        server.mesh = dist_ba.make_mesh(_jax.devices())
        print(json.dumps({"event": "gba_mesh",
                          "devices": len(_jax.devices()),
                          "processes": getattr(args, "num_processes", 1)}),
              flush=True)

    listen_fd = NativeChannel.listener(args.port)
    print(json.dumps({"event": "server_listening", "port": args.port}), flush=True)

    inbox: "queue.Queue[tuple[int, dict]]" = queue.Queue()
    channels: dict[int, NativeChannel] = {}
    lock = threading.Lock()

    def rx_thread(ch: NativeChannel):
        agent = None
        try:
            hello = ch.recv()
            agent = int(hello["agent"])
            with lock:
                channels[agent] = ch
            inbox.put((agent, hello))
            while True:
                msg = ch.recv()
                inbox.put((agent, msg))
                if msg.get("type") == "bye":
                    return
        except (ConnectionError, ValueError):
            if agent is not None:
                inbox.put((agent, {"type": "bye"}))

    threads = []
    for _ in range(args.agents):
        ch = NativeChannel.accept(listen_fd)
        th = threading.Thread(target=rx_thread, args=(ch,), daemon=True)
        th.start()
        threads.append(th)

    done = set()
    merges = 0
    t_start = time.time()
    while len(done) < args.agents:
        try:
            agent, msg = inbox.get(timeout=0.05)
        except queue.Empty:
            server.idle_step()
            if time.time() - t_start > args.timeout:
                print(json.dumps({"event": "server_timeout"}), flush=True)
                break
            continue
        kind = msg.get("type")
        if kind == "hello":
            print(json.dumps({"event": "agent_connected", "agent": agent}), flush=True)
        elif kind == "map":
            rx = msg["msg"]
            new_ids = [
                int(i)
                for i, v in zip(np.asarray(rx.kfs.kf_id), np.asarray(rx.kfs.valid))
                if v
            ]
            ack = server.ingest(agent, rx)
            ag = server.agents[agent]
            for kf_id in new_ids:
                if kf_id in ag.kf_table:
                    _, did_merge = server.mapping_step(agent, ag.kf_table[kf_id])
                    if did_merge:
                        merges += 1
                        print(json.dumps({"event": "map_merge", "agent": agent,
                                          "kf": kf_id}), flush=True)
            channels[agent].send({"type": "ack", "msg": ack})
            # vicinity feedback rides the ack cycle when enabled
            vic = server.pack_vicinity(agent)
            if vic.kfs is not None:
                channels[agent].send({"type": "vicinity", "msg": vic})
        elif kind == "bye":
            done.add(agent)
            print(json.dumps({"event": "agent_finished", "agent": agent}), flush=True)

    # quiescence -> final GBA (FINALBA), then write trajectories
    for _ in range(server.quiescence_steps + 2):
        server.idle_step()

    summary = {"event": "run_summary", "merges": merges,
               "map_slots": sorted(server.maps.keys()),
               "agents_share_map": len({a.map_slot for a in server.agents.values()}) == 1,
               "trajectories": {}}
    for a in range(args.agents):
        ts, R, t = server.trajectory(a)
        path = os.path.join(args.out, f"KF_GBA_{a}.csv")
        write_tum(path, ts, R, t)
        summary["trajectories"][a] = {"path": path, "n_kfs": len(ts)}
    if args.save_map:
        for slot in server.maps:
            server.save_map(slot, os.path.join(args.out, f"map_slot{slot}.npz"))
    print(json.dumps(summary), flush=True)


# ----------------------------------------------------------------- client ----


def run_client(args):
    _common_setup(args.cpu)
    from ccm_slam_tpu.io.synthetic import agent_corridor, agent_gauge, build_agent_map, make_world
    from ccm_slam_tpu.native import NativeChannel
    from ccm_slam_tpu.runtime import communicator as comm

    host, port = args.connect.rsplit(":", 1)
    deadline = time.time() + args.timeout
    ch = None
    while ch is None:
        try:
            ch = NativeChannel.connect(host, int(port))
        except ConnectionError:
            if time.time() > deadline:
                raise
            time.sleep(0.2)
    ch.send({"type": "hello", "agent": args.agent})

    if args.seq:
        m_cl = _track_euroc(args)
    else:
        world, wdesc = make_world(np.random.RandomState(args.world_seed), n=300)
        m_cl = build_agent_map(
            world, wdesc, agent_corridor(args.agent, n_kfs=args.kfs),
            agent_gauge(args.agent), kf_id_base=0, client_id=args.agent,
        )

    st = comm.ClientCommState.create(m_cl.kfs.capacity, m_cl.mps.capacity)
    foreign_kf, foreign_mp = {}, {}
    cycles = 0
    while cycles < args.max_cycles:
        msg, st = comm.publish_client(m_cl, st, args.agent,
                                      max_kfs=args.kf_budget, max_mps=args.mp_budget)
        if msg.empty:
            alive = np.asarray(m_cl.kfs.valid & ~m_cl.kfs.bad) & (
                np.asarray(m_cl.kfs.client_id) == args.agent
            )
            if st.kf_acked[np.where(alive)[0]].all():
                break
            cycles += 1
            continue
        ch.send({"type": "map", "msg": msg})
        reply = ch.recv()
        assert reply["type"] == "ack", reply
        st = comm.apply_server_acks(st, m_cl, reply["msg"])
        cycles += 1
    ch.send({"type": "bye"})
    alive = np.asarray(m_cl.kfs.valid & ~m_cl.kfs.bad) & (
        np.asarray(m_cl.kfs.client_id) == args.agent
    )
    n_acked = int(st.kf_acked[np.where(alive)[0]].sum())
    print(json.dumps({"event": "client_done", "agent": args.agent,
                      "kfs_acked": n_acked, "cycles": cycles}), flush=True)
    ch.close()


def _track_euroc(args):
    """Full tracking front-end over an EuRoC sequence; returns the client map."""
    from ccm_slam_tpu.config import DEFAULT_CONFIG
    from ccm_slam_tpu.io import euroc
    from ccm_slam_tpu.runtime.tracker import Tracker
    from ccm_slam_tpu.utils.camera import Camera

    cfg = DEFAULT_CONFIG
    cam = Camera.from_config(cfg.camera)
    tracker = Tracker(cfg=cfg, cam=cam, client_id=args.agent)
    seq = euroc.EurocSequence(root=args.seq)
    for i, (ts, img) in enumerate(seq):
        if args.limit and i >= args.limit:
            break
        tracker.process_frame(img, ts)
    return tracker.map


# ----------------------------------------------------------------- launch ----


def run_launch(args):
    """Single-host smoke deployment: spawn server + N client subprocesses."""
    import socket
    import subprocess

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    me = os.path.abspath(__file__)
    base = [sys.executable, me]
    flags = ["--world-seed", str(args.world_seed), "--n-feat", str(args.n_feat)]
    if args.cpu:
        flags.append("--cpu")
    srv = subprocess.Popen(
        base + ["server", "--port", str(port), "--agents", str(args.agents),
                "--out", args.out, "--quiescence", str(args.quiescence),
                "--timeout", str(args.timeout)] + flags,
        stdout=subprocess.PIPE, text=True,
    )
    clients = [
        subprocess.Popen(
            base + ["client", "--agent", str(a), "--connect", f"127.0.0.1:{port}",
                    "--kfs", str(args.kfs), "--timeout", str(args.timeout)] + flags,
            stdout=subprocess.PIPE, text=True,
        )
        for a in range(args.agents)
    ]
    rc = [c.wait(timeout=args.timeout) for c in clients]
    out, _ = srv.communicate(timeout=args.timeout)
    print(out, flush=True)
    for c in clients:
        print(c.stdout.read(), end="", flush=True)
    if any(rc) or srv.returncode:
        raise SystemExit(f"deployment failed: clients={rc} server={srv.returncode}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="role", required=True)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--cpu", action="store_true", help="force CPU backend")
    common.add_argument("--world-seed", type=int, default=2)
    common.add_argument("--n-feat", type=int, default=96)
    common.add_argument("--timeout", type=float, default=600.0)

    ps = sub.add_parser("server", parents=[common])
    ps.add_argument("--port", type=int, required=True)
    ps.add_argument("--agents", type=int, default=2)
    ps.add_argument("--out", default="out_mp")
    ps.add_argument("--quiescence", type=int, default=10)
    ps.add_argument("--save-map", action="store_true")
    # process-spanning GBA mesh (jax.distributed): run one of these per host
    # alongside the server/worker processes; the GBA solve then shards its
    # landmarks over every chip of every process (parallel/dist_ba)
    ps.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (enables jax.distributed)")
    ps.add_argument("--num-processes", type=int, default=1)
    ps.add_argument("--process-id", type=int, default=0)
    ps.add_argument("--dist-gba", action="store_true",
                    help="run server GBA landmark-sharded over ALL visible "
                         "devices (local chips, or every host's chips when "
                         "--coordinator is set)")
    ps.set_defaults(fn=run_server)

    pc = sub.add_parser("client", parents=[common])
    pc.add_argument("--agent", type=int, required=True)
    pc.add_argument("--connect", required=True, help="host:port")
    pc.add_argument("--seq", default=None, help="EuRoC root (synthetic if unset)")
    pc.add_argument("--limit", type=int, default=None)
    pc.add_argument("--kfs", type=int, default=4)
    pc.add_argument("--kf-budget", type=int, default=2)
    pc.add_argument("--mp-budget", type=int, default=400)
    pc.add_argument("--max-cycles", type=int, default=40)
    pc.set_defaults(fn=run_client)

    pl = sub.add_parser("launch", parents=[common])
    pl.add_argument("--agents", type=int, default=2)
    pl.add_argument("--out", default="out_mp")
    pl.add_argument("--kfs", type=int, default=4)
    pl.add_argument("--quiescence", type=int, default=10)
    pl.set_defaults(fn=run_launch)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
