"""KITTI odometry dataset loading (monocular, grayscale cam0).

The reference ships KITTI camera configs and launch files and documents a
brief monocular test on the odometry benchmark (cslam/conf/kitti_mono*.yaml,
cslam/launch/KITTI/, readme.md:166-170).  This loader reads the plain
odometry layout directly (no rosbag):

    <root>/sequences/<seq>/image_0/??????.png
    <root>/sequences/<seq>/times.txt
    <root>/sequences/<seq>/calib.txt        (P0 projection -> fx fy cx cy)
    <root>/poses/<seq>.txt                  (ground truth, seqs 00-10)

Ground-truth rows are 3x4 row-major cam0-to-world matrices.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from .euroc import EurocFrame


@dataclass
class KittiSequence:
    root: str           # dataset root containing sequences/ (and poses/)
    seq: str = "00"

    def _seq_dir(self):
        return os.path.join(self.root, "sequences", self.seq)

    def calibration(self):
        """(fx, fy, cx, cy) from the P0 line of calib.txt (rectified,
        distortion-free — the kitti_mono yamls carry zero k1..p2)."""
        with open(os.path.join(self._seq_dir(), "calib.txt")) as f:
            for line in f:
                if line.startswith("P0:"):
                    P = np.fromstring(line.split(":", 1)[1], sep=" ").reshape(3, 4)
                    return float(P[0, 0]), float(P[1, 1]), float(P[0, 2]), float(P[1, 2])
        raise ValueError("calib.txt has no P0 line")

    def frame_index(self):
        """[(timestamp_s, image_path), ...] in sequence order."""
        with open(os.path.join(self._seq_dir(), "times.txt")) as f:
            times = [float(l) for l in f if l.strip()]
        img_dir = os.path.join(self._seq_dir(), "image_0")
        return [
            (times[i], os.path.join(img_dir, f"{i:06d}.png")) for i in range(len(times))
        ]

    def frames(self, start: float = 0.0, limit: Optional[int] = None) -> Iterator[EurocFrame]:
        from PIL import Image

        n = 0
        for ts, path in self.frame_index():
            if ts < start:
                continue
            img = np.asarray(Image.open(path).convert("L"), dtype=np.float32)
            yield EurocFrame(timestamp=ts, image=img)
            n += 1
            if limit is not None and n >= limit:
                return

    def ground_truth(self):
        """(timestamps [T], positions [T,3], R_wc [T,3,3]) from poses/<seq>.txt."""
        path = os.path.join(self.root, "poses", f"{self.seq}.txt")
        mats = np.loadtxt(path).reshape(-1, 3, 4)
        with open(os.path.join(self._seq_dir(), "times.txt")) as f:
            times = np.asarray([float(l) for l in f if l.strip()])
        n = min(len(times), len(mats))
        return times[:n], mats[:n, :, 3].astype(np.float32), mats[:n, :, :3].astype(np.float32)
