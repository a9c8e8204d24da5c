"""Run ccm_slam_tpu on EuRoC sequences — the replacement for the reference's
ROS launch files (Server.launch + Client<i>_euroc.launch + rosbag play).

Single agent (BASELINE config 1/2):
  python scripts/run_euroc.py --seq /data/MH_01_easy --out out/

KITTI odometry (reference conf/kitti_mono.yaml + launch/KITTI):
  python scripts/run_euroc.py --dataset kitti --seq /data/kitti:07 --out out/

Multi-agent centralized (config 3/4), staggered starts like readme.md:152:
  python scripts/run_euroc.py --seq /data/MH_01_easy /data/MH_02_easy \
      --starts 45 35 --out out/

Outputs per agent: KF_GBA_<agent>.csv (TUM format, the reference's
trajectory product), plus map checkpoint, PLY cloud and scene JSON.
If ground truth is present, prints ATE RMSE (evo_ape protocol: Sim3
alignment).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", nargs="+", required=True,
                    help="EuRoC roots (mav0/ inside); for --dataset kitti use <root>:<seq>")
    ap.add_argument("--dataset", default="euroc",
                    choices=["euroc", "kitti", "rendered"])
    ap.add_argument("--factor", type=float, default=1.0,
                    help="rendered dataset resolution factor (1.0 = 752x480)")
    ap.add_argument("--starts", nargs="*", type=float, default=None)
    ap.add_argument("--out", default="out")
    ap.add_argument("--limit", type=int, default=None, help="max frames per agent")
    ap.add_argument("--vocab", default=None, help="pretrained vocabulary npz")
    ap.add_argument("--native-loader", action="store_true")
    ap.add_argument("--batch-frontend", action="store_true",
                    help="extract all live agents' frames in ONE vmapped "
                         "dispatch (per-chip multi-agent scaling; "
                         "benchmarks/client_throughput.py)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--server", action="store_true",
                    help="run the central server even for a single agent "
                         "(loop closing + GBA, BASELINE config 2)")
    ap.add_argument("--vicinity", type=int, default=None, metavar="N",
                    help="server->client feedback budget: up to N vicinity "
                         "keyframes per server publish cycle (reference "
                         "Comm.Server.KfsToClient; default from config, 0=off)")
    ap.add_argument("--trim", action="store_true",
                    help="bound the client map at Mapping.LocalMapSize "
                         "keyframes, trimming only sent+acked entities "
                         "(Map::MapTrimming; requires --server)")
    ap.add_argument("--reloc", action="store_true",
                    help="arm PnP relocalization after tracking loss "
                         "(the reference ships this as dead code)")
    ap.add_argument("--mm-window", type=float, default=None,
                    help="widened motion-model retry factor "
                         "(Tracking.mm_retry_window; raise for fast turns)")
    ap.add_argument("--traj-format", default="tum", choices=["tum", "euroc"],
                    help="trajectory output format (reference Stats.trajectory_format)")
    ap.add_argument("--show-params", action="store_true",
                    help="dump the parameter tree at startup (params::ShowParams)")
    ap.add_argument("--progress", type=int, default=50, metavar="N",
                    help="print a tracking status line every N frames (0=off)")
    ap.add_argument("--live-viewer", type=int, default=None, metavar="PORT",
                    help="stream the live scene + annotated camera frame at "
                         "http://127.0.0.1:PORT/ (the reference Viewer's RViz "
                         "surface; 0 picks a free port)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ccm_slam_tpu.config import DEFAULT_CONFIG
    from ccm_slam_tpu.io import checkpoint as ckpt
    from ccm_slam_tpu.io import euroc, export
    from ccm_slam_tpu.io.trajectory import ate_rmse, camera_centers, write_euroc, write_tum
    from ccm_slam_tpu.ops import bow, orb
    from ccm_slam_tpu.runtime import communicator as comm
    from ccm_slam_tpu.runtime.server import Server
    from ccm_slam_tpu.runtime.tracker import Tracker
    from ccm_slam_tpu.utils.camera import Camera

    os.makedirs(args.out, exist_ok=True)
    cfg = DEFAULT_CONFIG
    n_agents = len(args.seq)
    starts = args.starts or [0.0] * n_agents

    if args.dataset == "kitti":
        from ccm_slam_tpu.config import KITTI_CAMERA
        from ccm_slam_tpu.io.kitti import KittiSequence

        seqs = []
        for spec in args.seq:
            root, _, nn = spec.rpartition(":")
            seqs.append(KittiSequence(root=root or spec, seq=nn or "00"))
        cfg = cfg.replace(camera=KITTI_CAMERA)
    elif args.dataset == "rendered":
        # synthetic-pixel stand-in for EuRoC (zero-egress environments):
        # spec = <world>:<seed>[:n_frames[:span_lo-span_hi]], e.g. corridor:0
        # or loop:0:400:0-1
        from ccm_slam_tpu.config import rendered_ci_config
        from ccm_slam_tpu.io.rendered import RenderedSequence

        cfg = rendered_ci_config(factor=args.factor)
        seqs = []
        for spec in args.seq:
            parts = spec.split(":")
            world = parts[0] or "corridor"
            seed = int(parts[1]) if len(parts) > 1 else 0
            n_frames = int(parts[2]) if len(parts) > 2 else (args.limit or 300)
            span = (0.0, 1.0)
            if len(parts) > 3:
                lo, _, hi = parts[3].partition("-")
                span = (float(lo), float(hi or 1.0))
            seqs.append(RenderedSequence(
                world=world, seed=seed, n_frames=n_frames, span=span,
                cam=cfg.camera,
                cache_dir=os.environ.get("CCM_RENDER_CACHE", "/tmp/ccm_render_cache"),
            ))
    else:
        seqs = [euroc.EurocSequence(root=r) for r in args.seq]
    if args.vicinity is not None:
        import dataclasses as _dc

        cfg = cfg.replace(
            comm=_dc.replace(cfg.comm, server_kfs_to_client=args.vicinity)
        )
    if args.mm_window is not None:
        import dataclasses as _dc

        cfg = cfg.replace(
            tracking=_dc.replace(cfg.tracking, mm_retry_window=args.mm_window)
        )
    cam = Camera.from_config(cfg.camera)
    trackers = [Tracker(cfg=cfg, cam=cam, client_id=i) for i in range(n_agents)]
    if args.reloc:
        for tr in trackers:
            tr.enable_relocalization = True

    server = None
    comm_states = None
    if n_agents > 1 or args.server:
        # vocabulary: pretrained, or trained on the first frames' descriptors
        if args.vocab:
            vocab = ckpt.load_vocabulary(args.vocab)
        else:
            f0 = next(seqs[0].frames(start=starts[0], limit=1))
            feats = orb.extract(jnp.asarray(f0.image))
            vocab = bow.train_vocabulary(
                jax.random.PRNGKey(0), feats.desc, feats.valid, n_words=1024, iters=6
            )
        server = Server(cfg=cfg, cam=cam, vocab=vocab, n_agents=n_agents)
        comm_states = [
            comm.ClientCommState.create(
                cfg.capacity.client_max_kfs, cfg.capacity.client_max_mps
            )
            for _ in range(n_agents)
        ]
        # client-side tables for server-fed (vicinity) entities
        foreign_kf = [dict() for _ in range(n_agents)]
        foreign_mp = [dict() for _ in range(n_agents)]
        reset_epochs = [0] * n_agents
        if args.trim:
            # bounded client map: trim only sent+acked (CanBeForgotten)
            for i, tr in enumerate(trackers):
                tr.enable_trimming = True
                tr.trim_mask_fn = (
                    lambda m, _i=i: comm.trimmable_mask(m, comm_states[_i])
                )

    viewer = None
    viewer_offer = None
    if args.live_viewer is not None:
        import queue as _queue
        import threading as _threading

        from ccm_slam_tpu.io.live_viewer import LiveViewer

        viewer = LiveViewer(port=args.live_viewer)
        print(f"live viewer: {viewer.url}")
        # snapshot construction (covis matrix + device->host transfers, plus
        # a one-off jit compile on the TPU) runs on a worker thread so the
        # opt-in viewer can never stall the tracking loop; a full queue just
        # drops the frame (latest-wins)
        _vq: "_queue.Queue" = _queue.Queue(maxsize=2)

        def _viewer_worker():
            while True:
                item = _vq.get()
                if item is None:
                    return
                kind, payload = item
                try:
                    if kind == "map":
                        viewer.publish_map(payload)
                    else:
                        viewer.publish_frame(*payload)
                except Exception as e:  # viewer must never kill the run
                    print(f"[viewer] publish failed: {e}")

        _threading.Thread(target=_viewer_worker, daemon=True,
                          name="viewer-pub").start()

        def viewer_offer(kind, payload):
            try:
                _vq.put_nowait((kind, payload))
            except _queue.Full:
                pass

    iters = [iter(s.frames(start=st, limit=args.limit)) for s, st in zip(seqs, starts)]
    live = [True] * n_agents
    frame_count = [0] * n_agents
    last_lost = [0] * n_agents
    pub_every = max(1, int(cfg.camera.fps / cfg.comm.client_pub_freq))
    srv_every = max(1, int(cfg.camera.fps / cfg.comm.server_pub_freq))

    from ccm_slam_tpu.ops import orb as orb_ops
    from ccm_slam_tpu.runtime.frame import build_frame
    from ccm_slam_tpu.runtime.tracker import NOT_INITIALIZED

    def batched_step(pending):
        """One vmapped ORB dispatch per feature-budget group (agents still
        initializing use init_features_factor x the tracking budget)."""
        ex = cfg.extractor
        groups = {}
        for i, fr in pending:
            tr = trackers[i]
            nf = ex.n_features * (
                ex.init_features_factor if tr.state == NOT_INITIALIZED else 1
            )
            nf = min(nf, cfg.capacity.max_keypoints)
            groups.setdefault(nf, []).append((i, fr))
        for nf, items in groups.items():
            imgs = jnp.stack([jnp.asarray(fr.image) for _, fr in items])
            feats = jax.vmap(
                lambda im: orb_ops.extract(
                    im, n_features=nf, n_levels=ex.n_levels,
                    scale_factor=ex.scale_factor, ini_th=float(ex.ini_th_fast),
                    min_th=float(ex.min_th_fast), cell=ex.cell_size,
                    capacity=cfg.capacity.max_keypoints,
                )
            )(imgs)
            for b, (i, fr) in enumerate(items):
                f1 = jax.tree.map(lambda x: x[b], feats)
                frame = build_frame(f1, cam, fr.timestamp, ex.scale_factor)
                trackers[i].process_frame(frame)

    while any(live):
        pending = []
        for i in range(n_agents):
            if not live[i]:
                continue
            try:
                fr = next(iters[i])
            except StopIteration:
                live[i] = False
                continue
            pending.append((i, fr))
        same_shape = len({p[1].image.shape for p in pending}) <= 1
        if args.batch_frontend and len(pending) > 1 and same_shape:
            batched_step(pending)
            for i, _ in pending:
                frame_count[i] += 1
            processed = {i for i, _ in pending}
        else:
            for i, fr in pending:
                trackers[i].process_image(jnp.asarray(fr.image), fr.timestamp)
                frame_count[i] += 1
            processed = {i for i, _ in pending}
        for i in sorted(processed):
            tr_i = trackers[i]
            if args.progress and (
                frame_count[i] % args.progress == 0
                or tr_i.n_lost_frames != last_lost[i]
            ):
                last_lost[i] = tr_i.n_lost_frames
                n_kf = (0 if tr_i.map is None
                        else int(jnp.sum(tr_i.map.kfs.valid & ~tr_i.map.kfs.bad)))
                s = tr_i.stats
                print(f"[agent {i}] frame {frame_count[i]} state={tr_i.state} "
                      f"kfs={n_kf} lost={tr_i.n_lost_frames} "
                      f"path={s.get('path')} "
                      f"mm={s.get('mm_n_match')}/{s.get('mm_n_in')} "
                      f"ref={s.get('ref_n_match')}/{s.get('ref_n_in')} "
                      f"lm={s.get('lm_n_in_a')} "
                      f"reloc={s.get('reloc_fail')},{s.get('reloc_n_match')},"
                      f"{s.get('reloc_pnp_in')},{s.get('reloc_lm_in')}",
                      flush=True)
            if server is not None:
                tr = trackers[i]
                # reset-while-connected: the client restarted ids at 0 —
                # resync every arena-aligned table on both ends
                if tr.reset_epoch != reset_epochs[i]:
                    reset_epochs[i] = tr.reset_epoch
                    comm_states[i] = comm.ClientCommState.create(
                        cfg.capacity.client_max_kfs, cfg.capacity.client_max_mps
                    )
                    foreign_kf[i].clear()
                    foreign_mp[i].clear()
                    server.reset_agent(i)
                if tr.map is None:
                    continue
                # client arena compaction permuted slots: remap the comm
                # state and the foreign-entity tables
                if tr.last_compaction is not None:
                    kf_r, mp_r = (np.asarray(r) for r in tr.last_compaction)
                    tr.last_compaction = None
                    comm_states[i] = comm.remap_client_state(
                        comm_states[i], kf_r, mp_r
                    )
                    foreign_kf[i] = {
                        key: int(kf_r[v]) for key, v in foreign_kf[i].items()
                        if kf_r[v] >= 0
                    }
                    foreign_mp[i] = {
                        key: int(mp_r[v]) for key, v in foreign_mp[i].items()
                        if mp_r[v] >= 0
                    }
                if frame_count[i] % pub_every == 0:
                    closest = int(np.asarray(tr.map.kfs.kf_id)[tr.ref_kf])
                    msg, comm_states[i] = comm.publish_client(
                        tr.map, comm_states[i], i,
                        max_kfs=cfg.comm.client_pub_max_kfs,
                        max_mps=cfg.comm.client_pub_max_mps,
                        current_kf_id=closest,
                    )
                    if not msg.empty:
                        new_ids = [
                            int(k) for k, v in zip(
                                np.asarray(msg.kfs.kf_id), np.asarray(msg.kfs.valid)
                            ) if v
                        ]
                        ack = server.ingest(i, msg)
                        comm_states[i] = comm.apply_server_acks(
                            comm_states[i], tr.map, ack
                        )
                        ag = server.agents[i]
                        for kf_id in new_ids:
                            if kf_id in ag.kf_table:
                                server.mapping_step(i, ag.kf_table[kf_id])
                # server->client vicinity feedback at the server publish rate
                if (cfg.comm.server_kfs_to_client > 0
                        and frame_count[i] % srv_every == 0):
                    vic = server.pack_vicinity(i)
                    if vic.kfs is not None:
                        tr.map = comm.ingest_server_map(
                            tr.map, vic, i, foreign_kf[i], foreign_mp[i],
                            comm_state=comm_states[i],
                        )
        if server is not None:
            server.idle_step()
        if viewer is not None and 0 in processed and frame_count[0] % pub_every == 0:
            if server is not None and trackers[0].map is not None:
                viewer_offer("map", server.maps[server.agents[0].map_slot])
            elif trackers[0].map is not None:
                viewer_offer("map", trackers[0].map)
            raw0 = next((fr for i, fr in pending if i == 0), None)
            if raw0 is not None and trackers[0].last_frame is not None:
                viewer_offer("frame", (raw0.image, trackers[0].last_frame))

    # final GBA on quiescence
    if server is not None:
        for _ in range(server.quiescence_steps + 2):
            server.idle_step()

    if viewer is not None:  # final (post-GBA) scene
        if server is not None and trackers[0].map is not None:
            viewer.publish_map(server.maps[server.agents[0].map_slot])
        elif trackers[0].map is not None:
            viewer.publish_map(trackers[0].map)

    # outputs
    t_sc = np.asarray(cfg.camera.t_sc)
    for i in range(n_agents):
        if server is not None:
            ts, R, t = server.trajectory(i)
        else:
            m = trackers[i].map
            if m is None:
                print(f"agent {i}: no map")
                continue
            alive = np.asarray(m.kfs.valid & ~m.kfs.bad)
            idxs = np.where(alive)[0]
            idxs = idxs[np.argsort(np.asarray(m.kfs.kf_id)[idxs])]
            ts = np.asarray(m.kfs.timestamp)[idxs]
            R = np.asarray(m.kfs.R_cw)[idxs]
            t = np.asarray(m.kfs.t_cw)[idxs]
        path = os.path.join(args.out, f"KF_GBA_{i}.csv")
        writer = write_euroc if args.traj_format == "euroc" else write_tum
        writer(path, ts, R, t, t_sc=t_sc)
        print(f"agent {i}: {len(ts)} keyframes -> {path}")

        # ATE against ground truth when available
        try:
            gt_ts, gt_pos, _ = seqs[i].ground_truth()
            mask, gt_match = euroc.associate_gt(ts, gt_ts, gt_pos)
            if mask.sum() >= 3:
                import jax.numpy as jnp2

                est_pos = np.asarray(camera_centers(jnp.asarray(R), jnp.asarray(t)))
                rmse, _ = ate_rmse(est_pos[mask], gt_match[mask])
                print(f"agent {i}: ATE RMSE (Sim3) = {rmse:.4f} m over {mask.sum()} KFs")
        except FileNotFoundError:
            pass

    # map artifacts
    if server is not None:
        for slot, m in server.maps.items():
            if int(jnp.sum(m.kfs.valid)) == 0:
                continue
            ckpt.save_map(os.path.join(args.out, f"map_{slot}.npz"), m)
            export.export_pointcloud_ply(os.path.join(args.out, f"map_{slot}.ply"), m)
            export.export_scene_json(os.path.join(args.out, f"scene_{slot}.json"), m)
    elif trackers[0].map is not None:
        ckpt.save_map(os.path.join(args.out, "map_0.npz"), trackers[0].map)
        export.export_pointcloud_ply(os.path.join(args.out, "map_0.ply"), trackers[0].map)
        export.export_scene_json(os.path.join(args.out, "scene_0.json"), trackers[0].map)

    if viewer is not None and sys.stdin.isatty():
        import time

        print(f"live viewer still serving at {viewer.url} — Ctrl-C to exit")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass


if __name__ == "__main__":
    main()
