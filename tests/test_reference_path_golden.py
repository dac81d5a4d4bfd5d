"""Golden tests: polyline projection + reference sampling vs reference."""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "tests")
from reference_oracle import load_reference  # noqa: E402

from scp_tpu.ops import reference_path  # noqa: E402


def _pad(points, n):
    pts = np.asarray(points, float)
    pad = np.repeat(pts[-1:], n - len(pts), axis=0)
    valid = np.arange(n) < len(pts)
    return jnp.array(np.vstack([pts, pad])), jnp.array(valid)


def test_projection_matches_reference_two_point_line():
    ref = load_reference()
    line = np.array([[-30.0, 0.0], [30.0, 0.0]])
    pts, valid = _pad(line, 4)
    for pos in [(-30.0, 0.0), (-12.3, 4.0), (0.0, -2.0), (29.0, 1.0),
                (35.0, 0.5), (-33.0, -1.0)]:
        sd_ref, arc_ref, *_ = ref.SampleReferTraj.getShortestDistance(
            line[:, 0], line[:, 1], float(pos[0]), float(pos[1]))
        arc, sd = reference_path.project_to_polyline(pts, valid, jnp.array(pos))
        np.testing.assert_allclose(float(arc), arc_ref, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(float(sd), sd_ref, rtol=1e-12, atol=1e-12)


def test_projection_diagonal_line():
    ref = load_reference()
    c, s = np.cos(0.7), np.sin(0.7)
    line = np.array([[-30 * c, -30 * s], [30 * c, 30 * s]])
    pts, valid = _pad(line, 2)
    for pos in [(-30 * c, -30 * s), (3.0, 1.0), (-5.0, 2.0)]:
        sd_ref, arc_ref, *_ = ref.SampleReferTraj.getShortestDistance(
            line[:, 0], line[:, 1], float(pos[0]), float(pos[1]))
        arc, sd = reference_path.project_to_polyline(pts, valid, jnp.array(pos))
        np.testing.assert_allclose(float(arc), arc_ref, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(float(sd), sd_ref, rtol=1e-10, atol=1e-12)


def test_sampling_matches_reference():
    ref = load_reference()
    hp, step = 10, 1.6
    line = np.array([[-30.0, 0.0], [30.0, 0.0]])
    pts, valid = _pad(line, 4)
    for pos in [(-28.0, 1.0), (0.0, -0.5), (25.0, 0.0), (29.5, 0.2)]:
        want = ref.SampleReferTraj.sampleReferenceTrajectory(
            hp, line, float(pos[0]), float(pos[1]), step)
        got = reference_path.sample_reference(pts, valid, jnp.array(pos),
                                              jnp.array(step), hp)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-9)


def test_sampling_multi_segment_polyline():
    """Multi-segment path: arclength walk stays on the polyline and respects
    vertex crossings (the reference's one-vertex-per-step assumption holds)."""
    line = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [20.0, 10.0]])
    pts, valid = _pad(line, 6)
    got = np.asarray(reference_path.sample_reference(
        pts, valid, jnp.array([1.0, 0.5]), jnp.array(2.0), 12,
        end_compat=False))
    # First samples march along +x at y=0
    np.testing.assert_allclose(got[0], [3.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(got[3], [9.0, 0.0], atol=1e-12)
    # After vertex (10,0): turn up the +y leg
    np.testing.assert_allclose(got[4], [10.0, 1.0], atol=1e-12)
    np.testing.assert_allclose(got[8], [10.0, 9.0], atol=1e-12)
    # After vertex (10,10): along +x again; extrapolate past the end
    np.testing.assert_allclose(got[9], [11.0, 10.0], atol=1e-12)
    np.testing.assert_allclose(got[11], [15.0, 10.0], atol=1e-12)
