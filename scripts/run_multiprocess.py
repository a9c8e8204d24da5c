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
    # share the persistent compile cache across deployment processes (the
    # rendered-profile tracking programs are expensive to re-trace per client)
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/ccm_slam_tpu_jaxcache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
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


def _wire_pack(msg):
    """MapMsg -> quantized wire bytes (runtime/wire.py codec: ~0.9x the
    reference ccmslam_msgs envelope, ~2x smaller than pickled pytrees)."""
    from ccm_slam_tpu.runtime import wire

    return None if msg is None else wire.pack_map_msg(msg)


def _wire_unpack(b):
    from ccm_slam_tpu.runtime import wire

    return wire.unpack_map_msg(b) if isinstance(b, bytes) else b


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
    if args.profile == "rendered":
        from ccm_slam_tpu.config import rendered_ci_config
        from ccm_slam_tpu.utils.camera import Camera

        cfg = rendered_ci_config(factor=args.factor)
        if args.vicinity:
            import dataclasses as _dc

            cfg = cfg.replace(
                comm=_dc.replace(cfg.comm, server_kfs_to_client=args.vicinity)
            )
        cam = Camera.from_config(cfg.camera)
    else:
        cfg = _build_cfg(args.n_feat)
        cam = _camera()
    server = Server(cfg=cfg, cam=cam, vocab=_vocab(args.world_seed),
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
            rx = _wire_unpack(msg["msg"])
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
            # vicinity feedback rides the ack reply when enabled
            vic = server.pack_vicinity(agent)
            channels[agent].send({
                "type": "ack", "msg": _wire_pack(ack),
                "vicinity": _wire_pack(vic) if vic.kfs is not None else None,
            })
        elif kind == "reset":
            server.reset_agent(agent)
            print(json.dumps({"event": "agent_reset", "agent": agent}),
                  flush=True)
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
        return _run_client_sequence(args, ch)
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
        ch.send({"type": "map", "msg": _wire_pack(msg)})
        reply = ch.recv()
        assert reply["type"] == "ack", reply
        st = comm.apply_server_acks(st, m_cl, _wire_unpack(reply["msg"]))
        cycles += 1
    ch.send({"type": "bye"})
    alive = np.asarray(m_cl.kfs.valid & ~m_cl.kfs.bad) & (
        np.asarray(m_cl.kfs.client_id) == args.agent
    )
    n_acked = int(st.kf_acked[np.where(alive)[0]].sum())
    print(json.dumps({"event": "client_done", "agent": args.agent,
                      "kfs_acked": n_acked, "cycles": cycles}), flush=True)
    ch.close()


def _seq_cfg(args):
    """Config for a sequence-streaming client.  The server must be launched
    with the same profile (``--profile rendered --factor F``) so arena
    feature shapes match across the wire."""
    if args.seq.startswith("rendered:"):
        from ccm_slam_tpu.config import rendered_ci_config

        return rendered_ci_config(factor=args.factor)
    from ccm_slam_tpu.config import DEFAULT_CONFIG

    return DEFAULT_CONFIG


def _seq_frames(args, cfg):
    if args.seq.startswith("rendered:"):
        # rendered:<world>:<seed>:<n_frames>[:<span_lo>-<span_hi>]
        from ccm_slam_tpu.io.rendered import RenderedSequence

        parts = args.seq.split(":")
        world = parts[1] or "corridor"
        seed = int(parts[2]) if len(parts) > 2 else 0
        n_frames = int(parts[3]) if len(parts) > 3 else (args.limit or 120)
        span = (0.0, 1.0)
        if len(parts) > 4:
            lo, _, hi = parts[4].partition("-")
            span = (float(lo), float(hi or 1.0))
        seq = RenderedSequence(
            world=world, seed=seed, n_frames=n_frames, span=span,
            cam=cfg.camera,
            cache_dir=os.environ.get("CCM_RENDER_CACHE", "/tmp/ccm_render_cache"),
        )
    else:
        from ccm_slam_tpu.io import euroc

        seq = euroc.EurocSequence(root=args.seq)
    return seq.frames(limit=args.limit)


def _run_client_sequence(args, ch):
    """Sequence-streaming client: the full tracking front-end interleaved
    with the 5 Hz publish/ack cycle (the ROS-node deployment shape —
    Tracking + Communicator on one agent process).  Handles mid-run resets
    (resync both ends) and client arena compaction (remap comm state)."""
    import jax.numpy as jnp

    from ccm_slam_tpu.runtime import communicator as comm
    from ccm_slam_tpu.runtime.tracker import Tracker
    from ccm_slam_tpu.utils.camera import Camera

    cfg = _seq_cfg(args)
    cam = Camera.from_config(cfg.camera)
    tracker = Tracker(cfg=cfg, cam=cam, client_id=args.agent)
    st = comm.ClientCommState.create(
        cfg.capacity.client_max_kfs, cfg.capacity.client_max_mps
    )
    foreign_kf, foreign_mp = {}, {}
    epoch = tracker.reset_epoch
    pub_every = max(1, int(cfg.camera.fps / cfg.comm.client_pub_freq))
    n_frames = n_pub = n_resets = 0

    def _sync_cycle():
        nonlocal st
        closest = int(np.asarray(tracker.map.kfs.kf_id)[tracker.ref_kf])
        msg, st = comm.publish_client(
            tracker.map, st, args.agent,
            max_kfs=args.kf_budget, max_mps=args.mp_budget,
            current_kf_id=closest,
        )
        if msg.empty:
            return False
        ch.send({"type": "map", "msg": _wire_pack(msg)})
        reply = ch.recv()
        assert reply["type"] == "ack", reply
        st = comm.apply_server_acks(st, tracker.map, _wire_unpack(reply["msg"]))
        vic = _wire_unpack(reply.get("vicinity"))
        if vic is not None and vic.kfs is not None and tracker.map is not None:
            tracker.map = comm.ingest_server_map(
                tracker.map, vic, args.agent, foreign_kf, foreign_mp,
                comm_state=st,
            )
        return True

    for fr in _seq_frames(args, cfg):
        tracker.process_image(jnp.asarray(fr.image), fr.timestamp)
        n_frames += 1
        if tracker.reset_epoch != epoch:
            epoch = tracker.reset_epoch
            n_resets += 1
            st = comm.ClientCommState.create(
                cfg.capacity.client_max_kfs, cfg.capacity.client_max_mps
            )
            foreign_kf.clear()
            foreign_mp.clear()
            ch.send({"type": "reset"})
        if tracker.last_compaction is not None:
            kf_r, mp_r = (np.asarray(r) for r in tracker.last_compaction)
            tracker.last_compaction = None
            st = comm.remap_client_state(st, kf_r, mp_r)
            foreign_kf = {k: int(kf_r[v]) for k, v in foreign_kf.items()
                          if kf_r[v] >= 0}
            foreign_mp = {k: int(mp_r[v]) for k, v in foreign_mp.items()
                          if mp_r[v] >= 0}
        if tracker.map is not None and n_frames % pub_every == 0:
            if _sync_cycle():
                n_pub += 1

    # drain: keep publishing until everything alive is acked
    cycles = 0
    while tracker.map is not None and cycles < args.max_cycles:
        if not _sync_cycle():
            alive = np.asarray(
                tracker.map.kfs.valid & ~tracker.map.kfs.bad
            ) & (np.asarray(tracker.map.kfs.client_id) == args.agent)
            if st.kf_acked[np.where(alive)[0]].all():
                break
        cycles += 1
    ch.send({"type": "bye"})
    n_kfs = (0 if tracker.map is None
             else int(jnp.sum(tracker.map.kfs.valid & ~tracker.map.kfs.bad)))
    print(json.dumps({"event": "client_done", "agent": args.agent,
                      "mode": "sequence", "frames": n_frames,
                      "kfs": n_kfs, "publishes": n_pub,
                      "resets": n_resets}), flush=True)
    ch.close()


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
    common.add_argument("--profile", default="synthetic",
                        choices=["synthetic", "rendered"],
                        help="config profile; both ends of a deployment must "
                             "match (message array shapes follow the config)")
    common.add_argument("--factor", type=float, default=0.4,
                        help="rendered profile resolution factor")
    common.add_argument("--vicinity", type=int, default=0,
                        help="server->client vicinity budget (server role)")

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
