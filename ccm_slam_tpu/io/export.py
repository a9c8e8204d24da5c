"""Map/trajectory visualization export (the Viewer replacement).

The reference's ``Viewer`` (cslam/src/Viewer.cpp) publishes RViz markers:
keyframe frusta, landmark point clouds, per-agent colored trajectories, and
the covisibility graph.  This framework exports the same observability
surface to files instead (SURVEY §7.6): a JSON scene graph + standard PLY
point clouds, loadable by any viewer (meshlab, rerun, Open3D, a browser).

Per-agent colors follow the reference's defaults (config.yaml Viewer.Color*).
"""

from __future__ import annotations

import json

import numpy as np

from ..models import map_store as ms

AGENT_COLORS = [  # reference conf/config.yaml Viewer.ColorR/G/B 0..3
    (1.0, 1.0, 1.0),
    (0.0, 0.8, 0.0),
    (0.0, 0.0, 1.0),
    (0.6, 0.0, 0.6),
]
COVIS_COLOR = (0.6, 0.6, 0.6)


def annotate_frame(img, frame, radius: int = 3):
    """Draw tracked features on a grayscale image (the client Viewer's
    annotated camera frame, Viewer::DrawFrame): landmarks-matched keypoints
    get filled markers, unmatched detections get outlines.  Returns an RGB
    uint8 array (save with PIL or stream wherever)."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    out = np.stack([img.clip(0, 255).astype(np.uint8)] * 3, axis=-1)
    xy = np.asarray(frame.xy)
    valid = np.asarray(frame.valid)
    matched = np.asarray(frame.mp) >= 0

    def draw(x, y, color, fill):
        x, y = int(round(x)), int(round(y))
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                r2 = dx * dx + dy * dy
                on_ring = abs(r2 - radius * radius) <= radius
                if (fill and r2 <= radius * radius) or (not fill and on_ring):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w:
                        out[yy, xx] = color

    for i in np.where(valid)[0]:
        x, y = xy[i]
        if not (0 <= x < w and 0 <= y < h):
            continue
        if matched[i]:
            draw(x, y, (0, 220, 0), True)
        else:
            draw(x, y, (220, 160, 0), False)
    return out


def export_pointcloud_ply(path: str, m: ms.MapState) -> int:
    """Landmarks as a colored PLY point cloud (PubMapPointsAsCloud)."""
    alive = np.asarray(m.mps.valid & ~m.mps.bad)
    pos = np.asarray(m.mps.pos)[alive]
    client = np.asarray(m.mps.client_id)[alive]
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pos)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(pos, client):
            r, g, b = AGENT_COLORS[int(c) % len(AGENT_COLORS)]
            f.write(
                f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                f"{int(r*255)} {int(g*255)} {int(b*255)}\n"
            )
    return len(pos)


def scene_dict(m: ms.MapState, covis_min_weight: int = 100) -> dict:
    """Build the JSON-able scene graph: keyframe trajectories per agent +
    covisibility edges + loop edges (PubTrajectories + PubCovGraph + loop
    markers).  Shared by the file exporter and the live viewer."""
    alive = np.asarray(m.kfs.valid & ~m.kfs.bad)
    centers = np.asarray(m.kfs.center())
    ids = np.asarray(m.kfs.kf_id)
    clients = np.asarray(m.kfs.client_id)

    agents = {}
    for k in np.where(alive)[0]:
        c = int(clients[k])
        agents.setdefault(c, []).append((int(ids[k]), centers[k].tolist()))
    trajectories = {
        str(c): {
            "color": AGENT_COLORS[c % len(AGENT_COLORS)],
            "keyframes": [p for _, p in sorted(pts)],
            "kf_ids": [i for i, _ in sorted(pts)],
        }
        for c, pts in agents.items()
    }

    W = np.asarray(ms.covisibility_matrix(m))
    both = np.outer(alive, alive)
    ab = np.argwhere(np.triu(both & (W >= covis_min_weight), k=1))
    edges = [[int(a), int(b), int(W[a, b])] for a, b in ab]

    loops = []
    loop_edges = np.asarray(m.kfs.loop_edges)  # [K,L] multi-edge table
    for k in np.where(alive & (loop_edges >= 0).any(axis=1))[0]:
        for e in loop_edges[k][loop_edges[k] >= 0]:
            if k < int(e):  # undirected: stored on both endpoints
                loops.append([int(k), int(e)])

    return {
        "n_keyframes": int(alive.sum()),
        "n_landmarks": int(np.asarray(m.mps.valid & ~m.mps.bad).sum()),
        "trajectories": trajectories,
        "covisibility_edges": edges,
        "covis_color": COVIS_COLOR,
        "loop_edges": loops,
        "keyframe_centers": {str(int(k)): centers[k].tolist() for k in np.where(alive)[0]},
    }


def export_scene_json(path: str, m: ms.MapState, covis_min_weight: int = 100) -> dict:
    """Write ``scene_dict`` to a JSON file."""
    scene = scene_dict(m, covis_min_weight)
    with open(path, "w") as f:
        json.dump(scene, f)
    return scene
