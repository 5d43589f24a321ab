"""Small utility coverage: device z-buffer, latency harness, param report,
logits export."""
import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.geometry import points_to_depthmap
from fusionocc_tpu.utils.profiling import (measure_latency,
                                           param_memory_report)


def test_device_zbuffer_matches_numpy():
    from fusionocc_tpu.data.pipeline import points_to_depthmap_np
    rng = np.random.RandomState(0)
    pts = np.stack([rng.uniform(-5, 40, 3000), rng.uniform(-5, 20, 3000),
                    rng.uniform(0.5, 50, 3000)], 1).astype(np.float32)
    valid = rng.rand(3000) > 0.1
    got = np.asarray(points_to_depthmap(jnp.asarray(pts), jnp.asarray(valid),
                                        16, 32, (1.0, 45.0)))
    ref = points_to_depthmap_np(pts[valid], 16, 32, (1.0, 45.0))
    # device version uses round-half-even via jnp.round too
    np.testing.assert_allclose(got, ref, atol=0)


def test_measure_latency_shape():
    f = jax.jit(lambda x: x * 2)
    out = measure_latency(f, jnp.ones((128, 128)), warmup=1, iters=3)
    assert set(out) == {'mean_ms', 'p50_ms', 'p90_ms', 'p99_ms', 'fps'}
    assert out['fps'] > 0


def test_param_memory_report():
    params = {'a': {'w': jnp.zeros((10, 10))}, 'b': {'w': jnp.zeros((5,))}}
    rep = param_memory_report(params)
    assert rep['total_params'] == 105
    assert rep['a'] == 100 and rep['b'] == 5


def test_export_logits():
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.synthetic import synthetic_batch
    from fusionocc_tpu.eval.calibration import export_logits, fit_temperature
    from fusionocc_tpu.models.fusion_occ import FusionOcc
    cfg = tiny_model_config()
    model = FusionOcc(cfg)
    batch = synthetic_batch(cfg, 1, 0, num_points=256)
    v = jax.jit(lambda b: model.init(
        {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)},
        b, train=False))(batch)
    out = export_logits(model, v, batch)
    assert out['logits'].dtype == np.float16
    assert out['logits'].shape[:4] == out['voxel_semantics'].shape
    # the exported bundle feeds the temperature fit
    t = fit_temperature(out['logits'].astype(np.float32),
                        out['voxel_semantics'], out['mask_camera'],
                        iters=20)
    assert 0.05 <= t <= 10.0
