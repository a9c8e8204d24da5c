"""Render map/trajectory visualizations from exported artifacts.

The reference's observability surface is RViz (Viewer: trajectories,
keyframe frusta, landmark clouds, covisibility graph, loop/match edges —
cslam/src/Viewer.cpp).  ccm_slam_tpu exports the same content as files
(io/export.py: scene JSON + PLY + annotated frames); this script turns them
into publication-quality figures without any display server:

  python scripts/visualize.py out/scene_0.json              # top-down map
  python scripts/visualize.py out/scene_0.json --ply out/map_0.ply
  python scripts/visualize.py out/scene_0.json --gt gt.csv  # GT overlay
  python scripts/visualize.py out/scene_0.json --three-d

Writes <scene>.png next to the input (or --out).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_ply_points(path, max_points=60000):
    """Minimal ASCII/binary-LE PLY reader for the x,y,z clouds we export."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(l.split()[-1]) for l in header if l.startswith("element vertex"))
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        if fmt == "ascii":
            pts = np.loadtxt(f, max_rows=n, dtype=np.float32)[:, :3]
        else:
            props = [l for l in header if l.startswith("property")]
            stride = len(props)
            raw = np.frombuffer(f.read(4 * stride * n), dtype="<f4").reshape(n, stride)
            pts = raw[:, :3]
    if len(pts) > max_points:
        pts = pts[:: len(pts) // max_points + 1]
    return pts


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("scene", help="scene JSON from io/export.export_scene_json")
    ap.add_argument("--ply", default=None, help="landmark cloud PLY to underlay")
    ap.add_argument("--gt", default=None, help="ground-truth TUM csv to overlay")
    ap.add_argument("--out", default=None)
    ap.add_argument("--three-d", action="store_true")
    ap.add_argument("--axes", default="xz", help="2-D projection plane (e.g. xy, xz)")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    scene = json.load(open(args.scene))
    ai = {"x": 0, "y": 1, "z": 2}
    a0, a1 = ai[args.axes[0]], ai[args.axes[1]]

    fig = plt.figure(figsize=(9, 7))
    if args.three_d:
        ax = fig.add_subplot(111, projection="3d")
        pick = lambda P: (P[:, 0], P[:, 1], P[:, 2])
    else:
        ax = fig.add_subplot(111)
        pick = lambda P: (P[:, a0], P[:, a1])

    if args.ply and os.path.exists(args.ply):
        pts = load_ply_points(args.ply)
        ax.scatter(*pick(pts), s=0.8, c="#8a8a8a", alpha=0.55, linewidths=0,
                   label=f"landmarks ({scene['n_landmarks']})")

    centers = {int(k): np.asarray(v) for k, v in scene["keyframe_centers"].items()}
    for e in scene.get("covisibility_edges", []):
        a, b = int(e[0]), int(e[1])
        if a in centers and b in centers:
            P = np.stack([centers[a], centers[b]])
            ax.plot(*pick(P), c="#cfe3cf", lw=0.4, zorder=1)
    for e in scene.get("loop_edges", []):
        a, b = int(e[0]), int(e[1])
        if a in centers and b in centers:
            P = np.stack([centers[a], centers[b]])
            ax.plot(*pick(P), c="#d62728", lw=1.8, zorder=5,
                    label="loop edge" if e == scene["loop_edges"][0] else None)

    for cid, traj in sorted(scene["trajectories"].items()):
        P = np.asarray(traj["keyframes"], np.float32)
        if len(P) == 0:
            continue
        color = traj.get("color")
        rgb = tuple(np.asarray(color, np.float32) / max(1.0, np.max(color))) \
            if isinstance(color, (list, tuple)) else None
        # the reference palette targets RViz's dark canvas (agent 0 = white,
        # conf/config.yaml Viewer.Color*); remap near-white for paper-white
        if rgb is not None and min(rgb[:3]) > 0.85:
            rgb = (0.12, 0.12, 0.12)
        ax.plot(*pick(P), "-o", ms=2.5, lw=1.2, color=rgb, zorder=4,
                label=f"agent {cid} ({len(P)} KFs)")

    if args.gt and os.path.exists(args.gt):
        G = np.loadtxt(args.gt)
        ax.plot(*pick(G[:, 1:4]), "--", c="k", lw=0.9, zorder=3, label="ground truth")

    ax.set_xlabel(args.axes[0] + " [m]")
    ax.set_ylabel(args.axes[1] + " [m]")
    if not args.three_d:
        ax.set_aspect("equal", adjustable="datalim")
    ax.legend(loc="best", fontsize=8)
    ax.set_title(
        f"{os.path.basename(args.scene)} — {scene['n_keyframes']} KFs, "
        f"{scene['n_landmarks']} landmarks, {len(scene.get('loop_edges', []))} loop edges"
    )
    out = args.out or os.path.splitext(args.scene)[0] + ".png"
    fig.tight_layout()
    fig.savefig(out, dpi=140)
    print(out)


if __name__ == "__main__":
    main()
