"""Utils: result persistence, checkpoint/resume, viz rendering."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from scp_tpu.scenarios import builders
from scp_tpu.sim import engine
from scp_tpu.utils import checkpoint, results


def _tiny_run(tmp_path=None):
    cfg, data = builders.circle(3, dtype=jnp.float64)
    cfg = cfg.replace(hp=5, hu=5, max_scp_iter=2, qp_max_iter=8)
    carry, out = engine.simulate(cfg, data, n_steps=2)
    return cfg, data, carry, out


def test_results_roundtrip(tmp_path):
    cfg, data, carry, out = _tiny_run()
    arrays = results.sim_outputs_to_arrays(cfg, out)
    p = str(tmp_path / "r.npz")
    results.save_npz(p, arrays)
    back = results.load_npz(p)
    np.testing.assert_allclose(back["states"], arrays["states"])
    np.testing.assert_allclose(back["u_pred"], arrays["u_pred"])


def test_reference_json_export(tmp_path):
    import json
    cfg, data, carry, out = _tiny_run()
    p = str(tmp_path / "r.json")
    results.export_reference_json(p, cfg, data, out)
    with open(p) as f:
        payload = json.load(f)
    veh = np.asarray(payload["vehiclePathFullRes"])
    assert veh.shape == (6, 3, 2 * cfg.ticks_per_sim + 1)
    # first tick is the initial state
    np.testing.assert_allclose(veh[:, :, 0], np.asarray(data.x0).T)


def test_checkpoint_roundtrip(tmp_path):
    cfg, data, carry, out = _tiny_run()
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(p, carry, step=2)
    restored, step = checkpoint.load(p, carry)
    assert step == 2
    np.testing.assert_allclose(np.asarray(restored.state),
                               np.asarray(carry.state))
    np.testing.assert_allclose(np.asarray(restored.u_warm),
                               np.asarray(carry.u_warm))


def test_render_frames(tmp_path):
    from scp_tpu.viz import plot
    cfg, data, carry, out = _tiny_run()
    arrays = results.sim_outputs_to_arrays(cfg, out)
    paths = plot.render_video_frames(cfg, data, arrays, str(tmp_path / "f"))
    assert len(paths) == 2
    assert all(os.path.getsize(p) > 1000 for p in paths)


def test_debug_helpers():
    from scp_tpu.utils import debug
    debug.check_finite({"a": jnp.ones(3)})
    try:
        debug.check_finite({"a": jnp.array([1.0, np.nan])}, "x")
        raise AssertionError("should have raised")
    except FloatingPointError as e:
        assert "non-finite" in str(e)
    dev = debug.determinism_check(
        jax.jit(lambda x: x * 2 + 1), jnp.arange(8.0))
    assert dev == 0.0
