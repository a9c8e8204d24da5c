import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccm_slam_tpu.ops import brief, fast, hamming, orb


def square_grid(h=240, w=320, sq=16, pitch=40):
    """Isolated bright squares on dark background: L-corners, ideal for FAST."""
    img = np.full((h, w), 20.0, np.float32)
    for y0 in range(8, h - sq, pitch):
        for x0 in range(8, w - sq, pitch):
            img[y0 : y0 + sq, x0 : x0 + sq] = 220.0
    return jnp.asarray(img)


def random_texture(key, h=240, w=320):
    img = jax.random.uniform(key, (h, w)) * 255.0
    # smooth a bit so FAST finds structured corners
    k = jnp.ones((5, 5)) / 25.0
    img = jax.scipy.signal.convolve2d(img, k, mode="same")
    return img


class TestFast:
    def test_detects_square_corners(self):
        img = square_grid()
        valid, score = fast.detect(img)
        n = int(jnp.sum(valid))
        # 6x8 squares x 4 corners each = 192 corners (minus NMS merges)
        assert n >= 40, n
        ys, xs = np.where(np.asarray(valid))
        # detections near square corners: offsets from the 40px pitch grid
        # must be close to 8 (top/left edges) or 8+16 (bottom/right edges)
        dy = np.minimum(np.abs((ys % 40) - 8), np.abs((ys % 40) - 24))
        dx = np.minimum(np.abs((xs % 40) - 8), np.abs((xs % 40) - 24))
        assert np.all(dy <= 3) and np.all(dx <= 3)

    def test_flat_image_no_corners(self):
        img = jnp.full((100, 100), 128.0)
        valid, _ = fast.detect(img)
        assert int(jnp.sum(valid)) == 0

    def test_threshold_fallback(self):
        """Low-contrast corners found only by the min threshold."""
        img = np.full((100, 100), 100.0, np.float32)
        img[50:, 50:] = 112.0  # step of 12: above minTh=7, below iniTh=20
        valid_hi, _ = fast.fast_response(jnp.asarray(img), 20.0)
        valid, _ = fast.detect(jnp.asarray(img), 20.0, 7.0)
        assert int(jnp.sum(valid_hi)) == 0
        assert int(jnp.sum(valid)) >= 1

    def test_nms_isolates_peaks(self):
        img = square_grid()
        valid, score = fast.detect(img)
        v = np.asarray(valid)
        ys, xs = np.where(v)
        # no two surviving detections are 8-adjacent
        pts = set(zip(ys.tolist(), xs.tolist()))
        for y, x in pts:
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if (dy or dx) and (y + dy, x + dx) in pts:
                        raise AssertionError("adjacent detections survived NMS")


class TestOrbExtract:
    def test_budget_and_masks(self):
        img = random_texture(jax.random.PRNGKey(0))
        feats = orb.extract(img, n_features=200, n_levels=4, capacity=256)
        assert feats.xy.shape == (256, 2)
        n = int(feats.n)
        assert 50 <= n <= 200, n
        # invalid slots masked
        assert not bool(jnp.any(feats.valid[200:]))
        # level-0 coords within image
        v = np.asarray(feats.valid)
        xy = np.asarray(feats.xy)[v]
        assert xy[:, 0].max() < img.shape[1] and xy[:, 1].max() < img.shape[0]

    def test_multi_level_octaves(self):
        img = random_texture(jax.random.PRNGKey(1))
        feats = orb.extract(img, n_features=300, n_levels=4, capacity=512)
        octs = np.asarray(feats.octave)[np.asarray(feats.valid)]
        assert octs.min() == 0 and octs.max() >= 1  # higher levels populated

    def test_descriptor_distinctiveness(self):
        img = random_texture(jax.random.PRNGKey(2))
        feats = orb.extract(img, n_features=150, n_levels=1, capacity=256)
        v = np.asarray(feats.valid)
        d = feats.desc[jnp.asarray(np.where(v)[0])]
        dist = np.asarray(hamming.hamming_cross(d, d))
        n = dist.shape[0]
        off = dist[~np.eye(n, dtype=bool)]
        # random-texture descriptors should be near-independent (mean ~128)
        assert off.mean() > 80, off.mean()

    def test_descriptors_match_on_shifted_image(self):
        """Same scene translated: descriptors of corresponding corners match."""
        key = jax.random.PRNGKey(3)
        big = random_texture(key, 280, 360)
        img1 = big[:240, :320]
        img2 = big[20:260, 30:350]
        f1 = orb.extract(img1, n_features=150, n_levels=1, capacity=256)
        f2 = orb.extract(img2, n_features=150, n_levels=1, capacity=256)
        v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
        d = np.asarray(hamming.masked_hamming_cross(f1.desc, f1.valid, f2.desc, f2.valid))
        best = d.min(axis=1)
        xy1 = np.asarray(f1.xy)
        xy2 = np.asarray(f2.xy)
        nn = d.argmin(axis=1)
        # for keypoints whose best match is strong, displacement should be (-30,-20)
        strong = (best < 40) & v1
        assert strong.sum() >= 15, strong.sum()
        disp = xy2[nn[strong]] - xy1[strong]
        med = np.median(disp, axis=0)
        np.testing.assert_allclose(med, [-30.0, -20.0], atol=1.5)

    def test_jit_cache(self):
        """Second call with same shapes must not retrace."""
        img = random_texture(jax.random.PRNGKey(4))
        f1 = orb.extract(img, n_features=100, n_levels=2, capacity=128)
        f2 = orb.extract(img + 1.0, n_features=100, n_levels=2, capacity=128)
        assert f1.xy.shape == f2.xy.shape


class TestBrief:
    def test_pattern_deterministic(self):
        p1 = brief.make_pattern()
        p2 = brief.make_pattern()
        np.testing.assert_array_equal(p1, p2)
        assert p1.shape == (256, 4)
        assert np.abs(p1).max() <= brief.PATCH_HALF - 2

    def test_rotation_steering(self):
        """Descriptor of a rotated patch should match the unrotated one when
        angles are supplied (approximate: nearest-neighbor sampling)."""
        key = jax.random.PRNGKey(5)
        img = jax.random.uniform(key, (101, 101)) * 255
        img = orb.gaussian_blur(orb.gaussian_blur(img))
        center = jnp.array([[50.0, 50.0]])
        d0 = brief.descriptor_bits(img, center, jnp.array([0.0]))
        # rotate image by 90deg around center; descriptor with angle=90deg
        img90 = jnp.rot90(img, k=-1)  # (x,y)->(y, 100-x): rotation by +90 about center
        d90 = brief.descriptor_bits(img90, center, jnp.array([jnp.pi / 2]))
        dist = int(hamming.hamming_pairwise(d0[0], d90[0]))
        assert dist < 60, dist  # far below random (~128)


class TestBatchedExtract:
    def test_vmap_matches_single(self):
        """Multi-agent front-end batching (benchmarks/client_throughput.py):
        vmapped extraction must equal per-image extraction exactly."""
        rs = np.random.RandomState(0)
        imgs = jnp.asarray(rs.rand(2, 120, 160).astype(np.float32) * 255)
        f = lambda im: orb.extract(im, n_features=100, n_levels=3, capacity=128)
        b = jax.vmap(f)(imgs)
        for i in range(2):
            s = f(imgs[i])
            assert np.allclose(np.asarray(b.xy[i]), np.asarray(s.xy))
            assert np.array_equal(np.asarray(b.desc[i]), np.asarray(s.desc))
            assert np.array_equal(np.asarray(b.valid[i]), np.asarray(s.valid))
            assert np.array_equal(np.asarray(b.octave[i]), np.asarray(s.octave))


class TestPatchDescriptorStage:
    def test_matches_direct_samplers(self):
        """The patch-based fast path (one blocked gather + one-hot MXU
        sampling) must reproduce ic_angle / gaussian_blur+descriptor_bits
        bit-for-bit, including image-border clipping."""
        rs = np.random.RandomState(0)
        img = jnp.asarray(rs.rand(240, 320).astype(np.float32) * 255)
        pts = np.concatenate([
            np.stack([rs.uniform(30, 290, 48), rs.uniform(30, 210, 48)], 1),
            np.array([[2.0, 3.0], [318.0, 1.0], [5.0, 238.0], [319.0, 239.0]]),
        ]).astype(np.float32)
        kp = jnp.asarray(pts)
        cx = jnp.round(kp[:, 0]).astype(jnp.int32)
        cy = jnp.round(kp[:, 1]).astype(jnp.int32)
        imgp = jnp.pad(img, orb._BLUR_RADIUS, mode="edge")
        patches, sx, sy = orb._gather_patches(imgp, cx, cy, 240, 320)
        a_new = orb._ic_angle_patches(patches, cx, cy, sx, sy, 240, 320)
        np.testing.assert_allclose(
            np.asarray(a_new), np.asarray(orb.ic_angle(img, kp)), atol=1e-6
        )
        blur_full = orb.gaussian_blur(img)
        d_new = orb._brief_patches(
            orb._blur_patches(patches), kp, a_new, sx, sy, 240, 320
        )
        d_old = brief.descriptor_bits(blur_full, kp, a_new)
        np.testing.assert_array_equal(np.asarray(d_new), np.asarray(d_old))
