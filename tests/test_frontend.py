import jax.numpy as jnp
import numpy as np
import pytest

from tpuslam.config import ORBConfig
from tpuslam.datasets import synthetic
from tpuslam.frontend import extractor, fast, matching, orb, pyramid


@pytest.fixture(scope="module")
def world():
    # Moderate density: 250 x 27px patches ~ 60% image coverage, keeps
    # nearest-landmark ground-truth attribution unambiguous.
    return synthetic.make_world(n_points=250, h=480, w=640, seed=0)


@pytest.fixture(scope="module")
def cfg():
    return ORBConfig(n_features=512, n_levels=4)


@pytest.fixture(scope="module")
def frame0(world):
    R, t = synthetic.look_at(np.array([9.0, 0.0, 1.5]), np.zeros(3))
    return synthetic.render(world, R, t), (R, t)


def test_pyramid_shapes():
    img = jnp.zeros((480, 640), jnp.float32)
    levels = pyramid.build_pyramid(img, 4, 1.2)
    assert len(levels) == 4
    assert levels[0].shape == (480, 640)
    assert levels[1].shape == (400, 533)


def test_gaussian_blur_preserves_mean(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)), jnp.float32)
    out = pyramid.gaussian_blur(img)
    assert out.shape == img.shape
    np.testing.assert_allclose(jnp.mean(out), jnp.mean(img), rtol=0.02)


def test_fast_detects_synthetic_corner():
    # A bright square on dark background: corners of the square must fire.
    img = jnp.zeros((64, 64), jnp.float32)
    img = img.at[20:40, 20:40].set(200.0)
    score = fast.detect(img, threshold=20.0, edge_margin=5)
    ys, xs = np.nonzero(np.asarray(score))
    assert len(ys) >= 4
    # All detections near the square's corners.
    corners = np.array([[20, 20], [20, 39], [39, 20], [39, 39]])
    for y, x in zip(ys, xs):
        assert np.min(np.abs(corners - [y, x]).sum(1)) <= 6


def test_fast_flat_image_silent():
    img = jnp.full((64, 64), 128.0)
    score = fast.detect(img, threshold=7.0, edge_margin=5)
    assert float(jnp.sum(score)) == 0.0


def test_extractor_finds_landmarks(world, cfg, frame0):
    img, (R, t) = frame0
    feats = extractor.extract(jnp.asarray(img), cfg)
    n_valid = int(jnp.sum(feats.valid))
    assert n_valid > 150, f"only {n_valid} features"
    # Most detected features should be near some projected landmark.
    uv, z, vis = synthetic.project(world, R, t)
    kp = np.asarray(feats.uv)[np.asarray(feats.valid)]
    d = np.linalg.norm(kp[:, None, :] - uv[None, vis], axis=-1).min(axis=1)
    # Keypoints may sit anywhere on a landmark's texture patch (half=16px).
    assert np.mean(d < 18.0) > 0.8, f"feature-landmark hit rate {np.mean(d<18.0)}"


def test_extractor_capacity_and_levels(cfg, frame0):
    img, _ = frame0
    feats = extractor.extract(jnp.asarray(img), cfg)
    assert feats.uv.shape[0] == sum(
        extractor.features_per_level(cfg.n_features, cfg.n_levels, cfg.scale_factor)
    )
    lv = np.asarray(feats.level)[np.asarray(feats.valid)]
    assert lv.min() == 0 and lv.max() >= 1  # multiple levels populated


def test_descriptor_matching_across_views(world, cfg):
    """Two nearby views: matched features must correspond to the same
    landmark (ground-truth check through projections)."""
    Ra, ta = synthetic.look_at(np.array([9.0, 0.0, 1.5]), np.zeros(3))
    Rb, tb = synthetic.look_at(np.array([8.8, 0.7, 1.6]), np.zeros(3))
    fa = extractor.extract(jnp.asarray(synthetic.render(world, Ra, ta)), cfg)
    fb = extractor.extract(jnp.asarray(synthetic.render(world, Rb, tb)), cfg)

    # Init-style windowed search (SearchForInitialization: window 100,
    # ratio 0.9) + rotation-consistency filter.
    wmask = matching.window_mask(fa.uv, fb.uv, 100.0)
    # max_dist 45: the patch-based MXU descriptors are tight (median
    # true-match distance ~17/256) so the gate can sit well below TH_LOW.
    res = matching.match(fa.desc, fb.desc, fa.valid, fb.valid, mask=wmask,
                         max_dist=45, ratio=0.9, mutual=True)
    res = matching.rotation_consistency(fa.angle, fb.angle, res)
    idx = np.asarray(res.idx)
    matched = idx >= 0
    assert matched.sum() > 50, f"only {matched.sum()} matches"

    # Ground truth: nearest landmark to each keypoint in both frames.
    uva, _, visa = synthetic.project(world, Ra, ta)
    uvb, _, visb = synthetic.project(world, Rb, tb)
    kp_a = np.asarray(fa.uv)
    kp_b = np.asarray(fb.uv)

    def nearest_lm(kp, uv, vis):
        d = np.linalg.norm(kp[:, None, :] - uv[None, :, :], axis=-1)
        d[:, ~vis] = 1e9
        j = np.argmin(d, axis=1)
        return j, d[np.arange(len(kp)), j]

    la, da = nearest_lm(kp_a, uva, visa)
    lb, db = nearest_lm(kp_b, uvb, visb)
    ia = np.nonzero(matched)[0]
    half = 16  # keypoints sit anywhere on the landmark's texture patch
    good = (da[ia] < half) & (db[idx[ia]] < half)
    agree = la[ia[good]] == lb[idx[ia[good]]]
    assert agree.mean() > 0.85, f"match purity {agree.mean():.2f}"


def test_search_by_projection(world, cfg, frame0):
    """Guided search recovers identity when 'map points' are the frame's own
    keypoints with jittered projections (pure matcher test: in the real
    pipeline map points are triangulated at keypoint positions, so the
    projection lands near the keypoint, not the landmark center)."""
    img, _ = frame0
    feats = extractor.extract(jnp.asarray(img), cfg)
    rng = np.random.default_rng(3)
    jitter = rng.uniform(-2, 2, size=(feats.capacity, 2)).astype(np.float32)
    uv_proj = jnp.asarray(np.asarray(feats.uv) + jitter)
    sf = jnp.asarray(extractor.scale_factors(cfg))
    res = matching.search_by_projection(
        uv_proj, feats.level, feats.valid, feats.desc, feats, sf,
        radius=8.0, max_dist=50,
    )
    idx = np.asarray(res.idx)
    valid = np.asarray(feats.valid)
    hit = idx[valid] == np.arange(feats.capacity)[valid]
    assert hit.mean() > 0.95, f"guided-match hit rate {hit.mean():.2f}"


def test_hamming_matrix_basic():
    a = jnp.array([[0, 0, 0, 0, 0, 0, 0, 0]], jnp.uint32)
    b = jnp.array(
        [[0, 0, 0, 0, 0, 0, 0, 0], [0xFFFFFFFF] * 8, [1, 0, 0, 0, 0, 0, 0, 0]],
        jnp.uint32,
    )
    d = matching.hamming_matrix(a, b)
    assert d.tolist() == [[0, 256, 1]]
