"""Landmark-detector tests: the two canonical circle-fit regression
datasets (ref: nuslam/test/test_landmarks.cpp:13-103 — Gander/Golub/
Strebel data with literal expected values), clustering behavior, and
full-pipeline detection on a simulated lidar scan of cylinders.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpunav.estimation import landmarks as lmk
from tpunav.sim.lidar import scan_cylinders


def _fit_points(points):
    """Fit a single cluster of explicit points through the public path."""
    cfg = lmk.LandmarkConfig(max_clusters=4, radius_thresh=1e9)
    pts = jnp.asarray(points, dtype=jnp.float64)
    n = pts.shape[0]
    ids = jnp.zeros((n,), jnp.int32)
    valid = jnp.ones((n,), bool)
    circles = lmk.fit_circles(cfg, pts, ids, valid)
    return (float(circles.centers[0, 0]), float(circles.centers[0, 1]),
            float(circles.radii[0]), bool(circles.valid[0]))


def test_circle_fit_1():
    # ref: test_landmarks.cpp:34-58 → center (4.615482, 2.807354), r=4.8275.
    x, y, r, ok = _fit_points(
        [[1.0, 7.0], [2.0, 6.0], [5.0, 8.0], [7.0, 7.0], [9.0, 5.0],
         [3.0, 7.0]])
    assert ok
    assert np.isclose(x, 4.615482, atol=1e-4)
    assert np.isclose(y, 2.807354, atol=1e-4)
    assert np.isclose(r, 4.8275, atol=1e-4)


def test_circle_fit_2():
    # ref: test_landmarks.cpp:83-103 → center (0.4908357, -22.15212),
    # r=22.17979.
    x, y, r, ok = _fit_points(
        [[-1.0, 0.0], [-0.3, -0.06], [0.3, 0.1], [1.0, 0.0]])
    assert ok
    assert np.isclose(x, 0.4908357, atol=1e-4)
    assert np.isclose(y, -22.15212, atol=1e-4)
    assert np.isclose(r, 22.17979, atol=1e-4)


def test_circle_fit_exact_circle():
    # Points exactly on a circle → rank-deficient branch (sigma4 ≈ 0).
    th = np.linspace(0, 1.5 * np.pi, 12)
    pts = np.stack([0.3 + 0.05 * np.cos(th), -0.2 + 0.05 * np.sin(th)],
                   axis=-1)
    x, y, r, ok = _fit_points(pts)
    assert np.isclose(x, 0.3, atol=1e-9)
    assert np.isclose(y, -0.2, atol=1e-9)
    assert np.isclose(r, 0.05, atol=1e-9)


def test_cluster_scan_basic():
    cfg = lmk.LandmarkConfig(epsilon=0.5)
    # Two groups separated by a big gap.
    pts = jnp.array([[0.0, 0.0], [0.1, 0.0], [0.2, 0.0],
                     [5.0, 0.0], [5.1, 0.0]])
    valid = jnp.ones(5, bool)
    ids = np.asarray(lmk.cluster_scan(cfg, pts, valid))
    assert ids[0] == ids[1] == ids[2]
    assert ids[3] == ids[4]
    assert ids[0] != ids[3]


def test_cluster_scan_wraparound_merge():
    cfg = lmk.LandmarkConfig(epsilon=0.5)
    # Scan starts mid-cluster: first and last points close → same id
    # (ref: clusterScan landmarks.cpp:416-432).
    pts = jnp.array([[0.0, 0.0], [0.1, 0.0],
                     [5.0, 0.0], [5.1, 0.0],
                     [0.2, 0.1]])
    valid = jnp.ones(5, bool)
    ids = np.asarray(lmk.cluster_scan(cfg, pts, valid))
    assert ids[4] == ids[0]
    assert ids[2] == ids[3] != ids[0]


def test_cluster_scan_skips_invalid():
    cfg = lmk.LandmarkConfig(epsilon=0.5)
    # An invalid beam inside a cluster must not split it (the reference
    # filters invalid ranges before clustering).
    pts = jnp.array([[0.0, 0.0], [99.0, 99.0], [0.1, 0.0]])
    valid = jnp.array([True, False, True])
    ids = np.asarray(lmk.cluster_scan(cfg, pts, valid))
    assert ids[0] == ids[2]
    assert ids[1] == -1


def test_feature_detection_on_simulated_scan():
    # Robot at origin; three thin cylinders (r=0.04 < radius_thresh=0.05)
    # within range — the full pipeline should detect all three within 5 mm.
    cfg = lmk.LandmarkConfig()
    # Close enough that each cylinder subtends >= 4 beams (the reference
    # drops clusters smaller than num_points=4, landmarks.cpp:437-445).
    centers = jnp.array([[1.0, 0.0], [0.0, 1.0], [-0.8, -0.8]])
    radii = jnp.full((3,), 0.04)
    pose = jnp.zeros(3, jnp.float64)
    ranges = scan_cylinders(pose, centers, radii)
    circles = lmk.feature_detection(cfg, ranges)

    found = np.asarray(circles.centers)[np.asarray(circles.valid)]
    assert found.shape[0] == 3, f"expected 3 circles, got {found.shape[0]}"
    for c in np.asarray(centers):
        d = np.min(np.linalg.norm(found - c, axis=-1))
        assert d < 5e-3, f"cylinder at {c} missed by {d}"


def test_feature_detection_rejects_walls():
    # A long straight wall segment fits a huge-radius circle → filtered by
    # the radius threshold (ref: featureDetection landmarks.cpp:296-307).
    cfg = lmk.LandmarkConfig()
    n = cfg.props.num_beams
    ranges = np.full(n, cfg.props.range_max, np.float64)
    # Wall at x=1.0 visible for beams -40..40 degrees.
    for i in list(range(0, 41)) + list(range(320, 360)):
        ang = np.deg2rad(i)
        r = 1.0 / np.cos(ang if i <= 40 else ang - 2 * np.pi)
        if 0.12 <= r < 3.5:
            ranges[i] = r
    circles = lmk.feature_detection(cfg, jnp.asarray(ranges))
    assert not bool(np.any(np.asarray(circles.valid))), (
        np.asarray(circles.radii)[np.asarray(circles.valid)])


def test_classify_circles():
    cfg = lmk.LandmarkConfig(radius_thresh=1e9)
    # Arc points (circle) vs collinear points (wall).
    th = np.linspace(0.3, np.pi - 0.3, 10)
    arc = np.stack([np.cos(th), np.sin(th)], -1)
    line = np.stack([np.linspace(0, 1, 10), np.zeros(10)], -1)
    pts = jnp.asarray(np.concatenate([arc, line]), jnp.float64)
    ids = jnp.asarray([0] * 10 + [1] * 10, jnp.int32)
    valid = jnp.ones(20, bool)
    circles = lmk.fit_circles(cfg, pts, ids, valid)
    is_circle = np.asarray(
        lmk.classify_circles(cfg, pts, ids, valid, circles))
    assert bool(is_circle[0])
    assert not bool(is_circle[1])


# -------------------------------------------- wall rejection -------------

def test_classify_circles_gates():
    """Inscribed-angle gates (ref: classifyCircles landmarks.cpp:448-509):
    points on a circular arc pass (mean within [90°, 135°], tight std);
    collinear wall points fail (mean → 180°)."""
    import dataclasses
    from tpunav.estimation.landmarks import (
        LandmarkConfig, Circles, classify_circles)

    cfg = dataclasses.replace(LandmarkConfig(), max_clusters=4)
    n = 24
    # Cluster 0: minor arc of a circle (viewed from outside).
    t = jnp.linspace(0.6, 2.5, 12)
    arc = jnp.stack([0.5 + 0.2 * jnp.cos(t), 0.3 + 0.2 * jnp.sin(t)], -1)
    # Cluster 1: straight wall.
    s = jnp.linspace(0.0, 0.5, 12)[:, None]
    line = jnp.concatenate([1.0 + s, 0.2 + 0.4 * s], axis=-1)
    pts = jnp.concatenate([arc, line])
    ids = jnp.concatenate([jnp.zeros(12, jnp.int32),
                           jnp.ones(12, jnp.int32)])
    valid = jnp.ones(n, bool)
    circ = Circles(centers=jnp.zeros((4, 2)), radii=jnp.zeros(4),
                   valid=jnp.asarray([True, True, False, False]))
    keep = classify_circles(cfg, pts, ids, valid, circ)
    assert bool(keep[0]), "circular arc should classify as circle"
    assert not bool(keep[1]), "collinear wall should be rejected"


def test_wall_rejection_closed_loop():
    """A standalone L-corner (furniture edge) fits a circle under the
    radius threshold and becomes a phantom landmark with the reference's
    radius-filter-only detection; use_classify rejects it while keeping
    the true cylinder (VERDICT r2 item 6; ref gates
    landmarks.cpp:448-509)."""
    import dataclasses
    from tpunav.estimation.landmarks import LandmarkConfig, feature_detection
    from tpunav.sim.lidar import scan_cylinders, scan_segments

    base = dataclasses.replace(LandmarkConfig(), radius_thresh=0.3)
    arms = 0.2
    segs = jnp.asarray([[0.8, 0.0, 0.8 + arms, arms],
                        [0.8, 0.0, 0.8 + arms, -arms]], jnp.float64)
    cyl_c = jnp.asarray([[0.0, 0.6]], jnp.float64)
    cyl_r = jnp.asarray([0.15], jnp.float64)
    pose = jnp.asarray([0.2, 0.0, 0.0], jnp.float64)
    r1 = scan_cylinders(pose, cyl_c, cyl_r, key=jax.random.PRNGKey(4),
                        noise_std=0.002)
    r2 = scan_segments(pose, segs, key=jax.random.PRNGKey(5),
                       noise_std=0.002)
    ranges = jnp.minimum(r1, r2)

    th = float(pose[0])
    R = np.asarray([[np.cos(-th), -np.sin(-th)], [np.sin(-th), np.cos(-th)]])
    truth = (R @ np.asarray(cyl_c).T).T       # robot at origin

    def classify_counts(use_classify):
        cfg = dataclasses.replace(base, use_classify=use_classify)
        c = feature_detection(cfg, ranges)
        cn, vv = np.asarray(c.centers), np.asarray(c.valid)
        d = np.linalg.norm(cn[vv][:, None, :] - truth[None], axis=-1)
        true_hits = int((d.min(axis=-1) < 0.15).sum())
        phantoms = int((d.min(axis=-1) >= 0.15).sum())
        return true_hits, phantoms

    hits_radius, phantoms_radius = classify_counts(False)
    hits_cls, phantoms_cls = classify_counts(True)
    assert hits_radius >= 1 and phantoms_radius >= 1, (
        hits_radius, phantoms_radius)
    assert hits_cls >= 1, "classification must keep the true cylinder"
    assert phantoms_cls == 0, "classification must reject the corner"
