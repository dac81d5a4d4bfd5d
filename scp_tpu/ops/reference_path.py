"""Reference-trajectory projection and equidistant sampling — vectorized.

Reference: ``SampleReferTraj.py`` (8-122). Semantics reproduced:

* Project the vehicle position onto the piecewise-linear reference curve.
  Per reference ``getShortestDistance``: the perpendicular (unclamped)
  projection is accepted when the parameter lies inside the segment, and
  additionally *outside* the segment on the first/last segment (allowing
  projections behind the start / past the end); otherwise the segment
  endpoint is the candidate. The candidate with the smallest absolute
  distance wins (SampleReferTraj.py:58-77).
* From the projected arc length ``s0``, the Hp sample points sit at
  ``s0 + stepSize * (i+1)`` along the curve, linearly extrapolated along the
  last segment beyond the end (and along the first segment before the start)
  — this is the fixed-point form of the reference's stepping loop
  (SampleReferTraj.py:20-31), free of its one-vertex-per-step assumption and
  of the MATLAB-leftover crashes in Q6 (SURVEY.md §2a).

Polylines are padded to a static length with the last vertex repeated;
``valid`` marks real vertices. Everything is pure ``jnp`` and vmaps over
vehicles / scenario batches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _segment_geometry(points: jax.Array, valid: jax.Array):
    """Per-segment vectors/lengths/dirs. Segment i joins vertex i and i+1.

    Padding segments (invalid) have zero length and zero direction.
    """
    seg_vec = points[1:] - points[:-1]                   # (P-1, 2)
    valid_seg = valid[1:] & valid[:-1]                   # (P-1,)
    seg_len = jnp.linalg.norm(seg_vec, axis=-1)
    seg_len = jnp.where(valid_seg, seg_len, 0.0)
    safe_len = jnp.where(seg_len > 0, seg_len, 1.0)
    seg_dir = seg_vec / safe_len[:, None]
    seg_dir = jnp.where(valid_seg[:, None], seg_dir, 0.0)
    return seg_vec, seg_len, seg_dir, valid_seg


def project_to_polyline(points: jax.Array, valid: jax.Array, pos: jax.Array):
    """Project ``pos`` (2,) onto the polyline. Returns (arclength, distance).

    ``distance`` is the signed perpendicular distance (left positive), as in
    reference ``Projection2D`` (SampleReferTraj.py:105-108).
    """
    _, seg_len, seg_dir, valid_seg = _segment_geometry(points, valid)
    n_seg = seg_len.shape[0]
    n_valid_seg = jnp.sum(valid_seg)
    first_idx = 0
    last_idx = n_valid_seg - 1

    rel = pos[None, :] - points[:-1]                      # (P-1, 2)
    proj = jnp.einsum("sd,sd->s", rel, seg_dir)           # dot product along seg
    perp = seg_dir[:, 0] * rel[:, 1] - seg_dir[:, 1] * rel[:, 0]  # signed dist
    lam = proj / jnp.where(seg_len > 0, seg_len, 1.0)

    idx = jnp.arange(n_seg)
    # Reference eligibility: (0 < lam or first) and (lam < 1 or last).
    lo_ok = (lam > 0) | (idx == first_idx)
    hi_ok = (lam < 1) | (idx == last_idx)
    interior = lo_ok & hi_ok

    cum = jnp.concatenate([jnp.zeros((1,), seg_len.dtype), jnp.cumsum(seg_len)])

    # Candidate A: perpendicular projection (possibly extrapolated at ends).
    dist_a = jnp.abs(perp)
    arc_a = cum[:-1] + lam * seg_len
    # Candidate B: segment end vertex (reference else-branch, lines 69-76).
    d_end = jnp.linalg.norm(pos[None, :] - points[1:], axis=-1)
    arc_b = cum[1:]

    cand_dist = jnp.where(interior, dist_a, d_end)
    cand_arc = jnp.where(interior, arc_a, arc_b)
    cand_signed = jnp.where(interior, perp, jnp.sign(perp) * d_end)
    cand_dist = jnp.where(valid_seg, cand_dist, jnp.inf)

    best = jnp.argmin(cand_dist)
    return cand_arc[best], cand_signed[best]


def point_at_arclength(points: jax.Array, valid: jax.Array, s: jax.Array):
    """Point on the polyline at arc length ``s``, linearly extrapolated
    along the first/last segment outside [0, total_length]. ``s``: scalar."""
    _, seg_len, seg_dir, valid_seg = _segment_geometry(points, valid)
    cum = jnp.concatenate([jnp.zeros((1,), seg_len.dtype), jnp.cumsum(seg_len)])
    total = cum[-1]
    n_valid_seg = jnp.sum(valid_seg)
    last_idx = n_valid_seg - 1

    t = jnp.clip(s, 0.0, total)
    # Segment index: last k with cum[k] <= t among valid segments.
    k = jnp.clip(jnp.searchsorted(cum[1:-1], t, side="right"), 0, last_idx)
    base = points[k] + (t - cum[k]) * seg_dir[k]
    over = jnp.maximum(s - total, 0.0)
    under = jnp.minimum(s, 0.0)
    return base + over * seg_dir[last_idx] + under * seg_dir[0]


def sample_reference(points: jax.Array, valid: jax.Array, pos: jax.Array,
                     step_size: jax.Array, hp: int,
                     end_compat: bool = True) -> jax.Array:
    """Hp equidistant samples along the curve ahead of ``pos``. Returns (hp, 2).

    Reference ``sampleReferenceTrajectory`` (SampleReferTraj.py:8-32): samples
    at arc lengths ``s0 + step_size * (i+1)``.

    ``end_compat=True`` reproduces the reference's end-of-line behavior
    exactly: the port dropped the MATLAB original's ``TrajectoryIndex``
    increment (SampleReferTraj.py:27 — SURVEY.md Q6), so past the final
    vertex the walk *oscillates* between ``end + e`` and ``end + (h - e)``
    instead of extrapolating. All shipped scenarios use 2-point reference
    lines, where this is the only divergence from clean arc-length sampling.
    ``end_compat=False`` gives the intended semantics: linear extrapolation
    along the final segment.
    """
    s0, _ = project_to_polyline(points, valid, pos)
    h = step_size
    if end_compat:
        _, seg_len, _, _ = _segment_geometry(points, valid)
        s_total = jnp.sum(seg_len)

        def step(c, _):
            rem = jnp.abs(s_total - c)
            nxt = jnp.where(rem > h, c + h, s_total + (h - rem))
            return nxt, nxt

        _, ss = jax.lax.scan(step, s0, None, length=hp)
    else:
        ss = s0 + h * jnp.arange(1, hp + 1, dtype=points.dtype)
    return jax.vmap(lambda s: point_at_arclength(points, valid, s))(ss)


# vmap over vehicles: points (V,P,2), valid (V,P), pos (V,2), step (V,)
sample_reference_batch = jax.vmap(sample_reference,
                                  in_axes=(0, 0, 0, 0, None, None))
