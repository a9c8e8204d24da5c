"""Compact wire codec for MapMsg — the byte-level envelope parity layer.

The reference quantizes its wire schema aggressively (cslam_msgs/msg/KF.msg:
u16 kf ids, u8 client ids, CvKeyPoint.msg with u8 size/response/octave,
32-byte descriptors; MP.msg with u16/u8 observation ids).  Our MapMsg pytrees
are fixed-capacity padded arrays — pickling them ships every padded lane at
full dtype width.  This codec packs a MapMsg to parity-or-better:

  * padded rows are dropped (only valid keyframes/landmarks/features ship);
  * poses ship as quaternion+translation (7 f32 vs the reference's 4x4
    float32[16] matrices — decode re-orthonormalizes by construction);
  * per-feature: xy f32[2] + octave u8 + angle u8 (1.4 deg, finer than the
    30 deg rotation-histogram bins that consume it) + 32-byte descriptor
    + i32 landmark id = 46 B vs the reference's 47 B keypoint+descriptor
    plus 7 B association arrays;
  * landmark normals ship as i8[3] unit vectors (0.5 deg, consumed by a
    cos>0.5 view-angle gate);
  * observations ship as packed (i32 kf_id, u16 feat) pairs.

``unpack_map_msg`` restores the ORIGINAL fixed shapes (padding back), so the
jitted server ingest sees the stable [budget]-sized batches it compiled for.

`benchmarks/wire_bench.py` measures this codec against the reference
envelope computed from the .msg schemas.
"""

from __future__ import annotations

import io
import struct

import numpy as np

MAGIC = b"CCMW"
VERSION = 2


def _quat_from_R(R: np.ndarray) -> np.ndarray:
    """Batched rotation matrix -> unit quaternion (w,x,y,z), numerically
    robust branch-free Shepperd variant."""
    R = np.asarray(R, np.float64)
    B = R.shape[0]
    q = np.zeros((B, 4), np.float64)
    tr = R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2]
    # four candidate constructions; pick the best-conditioned per row
    cand = np.stack([
        1.0 + tr,
        1.0 + R[:, 0, 0] - R[:, 1, 1] - R[:, 2, 2],
        1.0 - R[:, 0, 0] + R[:, 1, 1] - R[:, 2, 2],
        1.0 - R[:, 0, 0] - R[:, 1, 1] + R[:, 2, 2],
    ], 1)
    best = np.argmax(cand, axis=1)
    s = np.sqrt(np.clip(cand[np.arange(B), best], 1e-12, None)) * 2.0
    for b in range(B):
        i = best[b]
        Rb = R[b]
        if i == 0:
            q[b] = [s[b] / 4, (Rb[2, 1] - Rb[1, 2]) / s[b],
                    (Rb[0, 2] - Rb[2, 0]) / s[b], (Rb[1, 0] - Rb[0, 1]) / s[b]]
        elif i == 1:
            q[b] = [(Rb[2, 1] - Rb[1, 2]) / s[b], s[b] / 4,
                    (Rb[0, 1] + Rb[1, 0]) / s[b], (Rb[0, 2] + Rb[2, 0]) / s[b]]
        elif i == 2:
            q[b] = [(Rb[0, 2] - Rb[2, 0]) / s[b], (Rb[0, 1] + Rb[1, 0]) / s[b],
                    s[b] / 4, (Rb[1, 2] + Rb[2, 1]) / s[b]]
        else:
            q[b] = [(Rb[1, 0] - Rb[0, 1]) / s[b], (Rb[0, 2] + Rb[2, 0]) / s[b],
                    (Rb[1, 2] + Rb[2, 1]) / s[b], s[b] / 4]
    q /= np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-12, None)
    return q.astype(np.float32)


def _R_from_quat(q: np.ndarray) -> np.ndarray:
    q = np.asarray(q, np.float64)
    q = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True), 1e-12, None)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], -1).reshape(-1, 3, 3)
    return R.astype(np.float32)


def _wa(buf: io.BytesIO, arr: np.ndarray, dtype):
    a = np.ascontiguousarray(np.asarray(arr), dtype)
    buf.write(a.tobytes())


def pack_map_msg(msg) -> bytes:
    """MapMsg -> compact bytes (host-side; call with device arrays already
    fetched or let np.asarray pull them)."""
    kfb, mpb = msg.kfs, msg.mps
    buf = io.BytesIO()
    has_kf = kfb is not None
    has_mp = mpb is not None
    kv = np.asarray(kfb.valid) if has_kf else np.zeros(0, bool)
    mv = np.asarray(mpb.valid) if has_mp else np.zeros(0, bool)
    ksel = np.where(kv)[0]
    msel = np.where(mv)[0]
    Bk = int(kv.shape[0])
    Bm = int(mv.shape[0])
    N = int(np.asarray(kfb.xy).shape[1]) if has_kf else 0
    O = int(np.asarray(mpb.obs_kf_id).shape[1]) if has_mp else 0

    ack_kf = np.asarray(msg.ack_kf_ids, np.int64)
    ack_mp = np.asarray(msg.ack_mp_ids, np.int64)

    # per-KF features: prune invalid lanes, store per-KF count + lane index
    header = struct.pack(
        "<4sBiiiiiiiiqq", MAGIC, VERSION, Bk, Bm, N, O,
        len(ksel), len(msel), len(ack_kf), len(ack_mp),
        int(msg.weak_ack_kf_id), int(msg.weak_ack_mp_id),
    )
    buf.write(header)
    buf.write(struct.pack("<qi", int(msg.closest_kf_id), int(msg.msg_id)))
    _wa(buf, ack_kf, np.int64)
    _wa(buf, ack_mp, np.int64)

    if len(ksel):
        _wa(buf, ksel, np.int32)
        _wa(buf, np.asarray(kfb.full)[ksel], np.uint8)
        _wa(buf, np.asarray(kfb.kf_id)[ksel], np.int32)
        _wa(buf, np.asarray(kfb.client_id)[ksel], np.uint8)
        _wa(buf, np.asarray(kfb.timestamp)[ksel], np.float64)
        _wa(buf, _quat_from_R(np.asarray(kfb.R_cpred)[ksel]), np.float32)
        _wa(buf, np.asarray(kfb.t_cpred)[ksel], np.float32)
        _wa(buf, np.asarray(kfb.pred_kf_id)[ksel], np.int32)
        _wa(buf, _quat_from_R(np.asarray(kfb.R_cpar)[ksel]), np.float32)
        _wa(buf, np.asarray(kfb.t_cpar)[ksel], np.float32)
        _wa(buf, np.asarray(kfb.par_kf_id)[ksel], np.int32)
        fv = np.asarray(kfb.feat_valid)[ksel]            # [S,N]
        counts = fv.sum(axis=1).astype(np.int32)
        _wa(buf, counts, np.int32)
        lanes = np.where(fv.reshape(-1))[0].astype(np.int32)  # flat indices
        _wa(buf, lanes, np.int32)
        flat = fv.reshape(-1)
        _wa(buf, np.asarray(kfb.xy)[ksel].reshape(-1, 2)[flat], np.float32)
        oct_ = np.asarray(kfb.octave)[ksel].reshape(-1)[flat]
        _wa(buf, np.clip(oct_, 0, 255), np.uint8)
        ang = np.asarray(kfb.angle)[ksel].reshape(-1)[flat]
        _wa(buf, np.round((ang % (2 * np.pi)) * (256.0 / (2 * np.pi))) % 256,
            np.uint8)
        _wa(buf, np.asarray(kfb.desc)[ksel].reshape(-1, 32)[flat], np.uint8)
        _wa(buf, np.asarray(kfb.mp_assoc_id)[ksel].reshape(-1)[flat], np.int32)

    if len(msel):
        _wa(buf, msel, np.int32)
        _wa(buf, np.asarray(mpb.full)[msel], np.uint8)
        _wa(buf, np.asarray(mpb.mp_id)[msel], np.int32)
        _wa(buf, np.asarray(mpb.client_id)[msel], np.uint8)
        _wa(buf, np.asarray(mpb.pos_ref)[msel], np.float32)
        _wa(buf, np.asarray(mpb.ref_kf_id)[msel], np.int32)
        _wa(buf, np.asarray(mpb.ref_client_id)[msel], np.uint8)
        _wa(buf, np.asarray(mpb.desc)[msel], np.uint8)
        nrm = np.asarray(mpb.normal_ref)[msel]
        nrm = nrm / np.clip(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9, None)
        _wa(buf, np.round(nrm * 127.0), np.int8)
        _wa(buf, np.asarray(mpb.min_dist)[msel], np.float32)
        _wa(buf, np.asarray(mpb.max_dist)[msel], np.float32)
        ov = np.asarray(mpb.obs_valid)[msel]              # [S,O]
        ocnt = ov.sum(axis=1).astype(np.int32)
        _wa(buf, ocnt, np.int32)
        oflat = ov.reshape(-1)
        _wa(buf, np.asarray(mpb.obs_kf_id)[msel].reshape(-1)[oflat], np.int32)
        _wa(buf, np.asarray(mpb.obs_feat)[msel].reshape(-1)[oflat], np.uint16)
    return buf.getvalue()


class _Reader:
    def __init__(self, data: bytes, off: int):
        self.d = data
        self.o = off

    def arr(self, dtype, shape):
        n = int(np.prod(shape)) if shape else 1
        a = np.frombuffer(self.d, dtype, count=n, offset=self.o)
        self.o += a.nbytes
        return a.reshape(shape)


def unpack_map_msg(data: bytes):
    """bytes -> MapMsg with the ORIGINAL padded shapes restored."""
    from .communicator import KFMsgBatch, MapMsg, MPMsgBatch
    import jax.numpy as jnp

    hdr = struct.unpack_from("<4sBiiiiiiiiqq", data, 0)
    assert hdr[0] == MAGIC and hdr[1] == VERSION, "bad wire message"
    (Bk, Bm, N, O, nk, nm, nack_k, nack_m, weak_kf, weak_mp) = hdr[2:]
    off = struct.calcsize("<4sBiiiiiiiiqq")
    closest, msg_id = struct.unpack_from("<qi", data, off)
    off += struct.calcsize("<qi")
    r = _Reader(data, off)
    ack_kf = r.arr(np.int64, (nack_k,))
    ack_mp = r.arr(np.int64, (nack_m,))

    def zeros(shape, dt):
        return np.zeros(shape, dt)

    kfb = None
    if Bk:
        valid = zeros((Bk,), bool)
        full = zeros((Bk,), bool)
        kf_id = zeros((Bk,), np.int32)
        client_id = zeros((Bk,), np.int32)
        ts = zeros((Bk,), np.float64)
        Rp = np.tile(np.eye(3, dtype=np.float32), (Bk, 1, 1))
        tp = zeros((Bk, 3), np.float32)
        pred = np.full((Bk,), -1, np.int32)
        Ra = np.tile(np.eye(3, dtype=np.float32), (Bk, 1, 1))
        ta = zeros((Bk, 3), np.float32)
        par = np.full((Bk,), -1, np.int32)
        xy = zeros((Bk, N, 2), np.float32)
        octv = zeros((Bk, N), np.int32)
        ang = zeros((Bk, N), np.float32)
        fval = zeros((Bk, N), bool)
        desc = zeros((Bk, N, 32), np.uint8)
        assoc = np.full((Bk, N), -1, np.int32)
        if nk:
            ksel = r.arr(np.int32, (nk,))
            valid[ksel] = True
            full[ksel] = r.arr(np.uint8, (nk,)).astype(bool)
            kf_id[ksel] = r.arr(np.int32, (nk,))
            client_id[ksel] = r.arr(np.uint8, (nk,))
            ts[ksel] = r.arr(np.float64, (nk,))
            Rp[ksel] = _R_from_quat(r.arr(np.float32, (nk, 4)))
            tp[ksel] = r.arr(np.float32, (nk, 3))
            pred[ksel] = r.arr(np.int32, (nk,))
            Ra[ksel] = _R_from_quat(r.arr(np.float32, (nk, 4)))
            ta[ksel] = r.arr(np.float32, (nk, 3))
            par[ksel] = r.arr(np.int32, (nk,))
            counts = r.arr(np.int32, (nk,))
            total = int(counts.sum())
            lanes = r.arr(np.int32, (total,))  # flat [S*N] feature indices
            gk = ksel[lanes // N]
            gf = lanes % N
            fval[gk, gf] = True
            xy[gk, gf] = r.arr(np.float32, (total, 2))
            octv[gk, gf] = r.arr(np.uint8, (total,))
            ang[gk, gf] = r.arr(np.uint8, (total,)).astype(np.float32) * (
                2 * np.pi / 256.0
            )
            desc[gk, gf] = r.arr(np.uint8, (total, 32))
            assoc[gk, gf] = r.arr(np.int32, (total,))
        kfb = KFMsgBatch(
            valid=jnp.asarray(valid), full=jnp.asarray(full),
            kf_id=jnp.asarray(kf_id), client_id=jnp.asarray(client_id),
            timestamp=jnp.asarray(ts.astype(np.float32)),
            R_cpred=jnp.asarray(Rp), t_cpred=jnp.asarray(tp),
            pred_kf_id=jnp.asarray(pred),
            R_cpar=jnp.asarray(Ra), t_cpar=jnp.asarray(ta),
            par_kf_id=jnp.asarray(par),
            xy=jnp.asarray(xy), desc=jnp.asarray(desc),
            octave=jnp.asarray(octv), angle=jnp.asarray(ang),
            feat_valid=jnp.asarray(fval), mp_assoc_id=jnp.asarray(assoc),
        )

    mpb = None
    if Bm:
        valid = zeros((Bm,), bool)
        full = zeros((Bm,), bool)
        mp_id = zeros((Bm,), np.int32)
        client_id = zeros((Bm,), np.int32)
        pos = zeros((Bm, 3), np.float32)
        rki = np.full((Bm,), -1, np.int32)
        rci = zeros((Bm,), np.int32)
        desc = zeros((Bm, 32), np.uint8)
        nrm = zeros((Bm, 3), np.float32)
        mind = zeros((Bm,), np.float32)
        maxd = zeros((Bm,), np.float32)
        okf = np.full((Bm, O), -1, np.int32)
        ofe = zeros((Bm, O), np.int32)
        ova = zeros((Bm, O), bool)
        if nm:
            msel = r.arr(np.int32, (nm,))
            valid[msel] = True
            full[msel] = r.arr(np.uint8, (nm,)).astype(bool)
            mp_id[msel] = r.arr(np.int32, (nm,))
            client_id[msel] = r.arr(np.uint8, (nm,))
            pos[msel] = r.arr(np.float32, (nm, 3))
            rki[msel] = r.arr(np.int32, (nm,))
            rci[msel] = r.arr(np.uint8, (nm,))
            desc[msel] = r.arr(np.uint8, (nm, 32))
            q = r.arr(np.int8, (nm, 3)).astype(np.float32) / 127.0
            nrm[msel] = q / np.clip(
                np.linalg.norm(q, axis=-1, keepdims=True), 1e-9, None
            )
            mind[msel] = r.arr(np.float32, (nm,))
            maxd[msel] = r.arr(np.float32, (nm,))
            ocnt = r.arr(np.int32, (nm,))
            ot = int(ocnt.sum())
            orow = np.repeat(np.arange(nm), ocnt)
            oslot = np.concatenate([np.arange(c) for c in ocnt]) if ot else \
                np.zeros(0, np.int64)
            gk = msel[orow]
            ova[gk, oslot] = True
            okf[gk, oslot] = r.arr(np.int32, (ot,))
            ofe[gk, oslot] = r.arr(np.uint16, (ot,))
        mpb = MPMsgBatch(
            valid=jnp.asarray(valid), full=jnp.asarray(full),
            mp_id=jnp.asarray(mp_id), client_id=jnp.asarray(client_id),
            pos_ref=jnp.asarray(pos), ref_kf_id=jnp.asarray(rki),
            ref_client_id=jnp.asarray(rci), desc=jnp.asarray(desc),
            normal_ref=jnp.asarray(nrm), min_dist=jnp.asarray(mind),
            max_dist=jnp.asarray(maxd), obs_kf_id=jnp.asarray(okf),
            obs_feat=jnp.asarray(ofe), obs_valid=jnp.asarray(ova),
        )

    return MapMsg(
        kfs=kfb, mps=mpb,
        ack_kf_ids=ack_kf, ack_mp_ids=ack_mp,
        weak_ack_kf_id=int(weak_kf), weak_ack_mp_id=int(weak_mp),
        closest_kf_id=int(closest), msg_id=int(msg_id),
    )
