"""Calibration, uncertainty, mask ablations, visualization utils."""
import jax
import jax.numpy as jnp
import numpy as np

from fusionocc_tpu.data.masks import MASK_MODES, build_training_mask
from fusionocc_tpu.eval.calibration import (apply_temperature,
                                            fit_temperature,
                                            nll_at_temperature,
                                            uncertainty_maps)
from fusionocc_tpu.utils.visualization import (occupancy_bev_image,
                                               save_occupancy_figure)


def test_fit_temperature_recovers_known_scale():
    rng = np.random.RandomState(0)
    n, c = 4000, 18
    true_logits = rng.randn(n, c) * 3.0
    labels = np.array([np.random.RandomState(i).choice(
        c, p=np.exp(true_logits[i]) / np.exp(true_logits[i]).sum())
        for i in range(n)])
    # overconfident logits: scaled by 4 -> optimal temperature ~4
    t = fit_temperature(true_logits * 4.0, labels)
    assert 3.0 < t < 5.5, t
    # NLL at fitted temperature beats T=1
    nll_fit = float(nll_at_temperature(jnp.asarray(true_logits * 4.0),
                                       jnp.asarray(labels), None, t))
    nll_1 = float(nll_at_temperature(jnp.asarray(true_logits * 4.0),
                                     jnp.asarray(labels), None, 1.0))
    assert nll_fit < nll_1


def test_uncertainty_maps():
    logits = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    out = uncertainty_maps(logits)
    assert out['msp'][0] > 0.99
    assert abs(float(out['entropy'][1]) - 1.0) < 1e-5  # uniform -> max ent
    assert out['pred'][0] == 0
    p = apply_temperature(logits, 1e6)
    np.testing.assert_allclose(np.asarray(p[0]), [1 / 3] * 3, atol=1e-4)


def test_mask_modes():
    X, Y, Z = 20, 20, 4
    rng = np.random.RandomState(0)
    sem = np.full((X, Y, Z), 17, np.int32)
    sem[2, 2, 0] = 4      # far occupied (corner)
    sem[10, 10, 0] = 4    # near occupied (center)
    mask = np.zeros((X, Y, Z), np.uint8)

    out = build_training_mask(sem, mask, 'baseline_with_mask')
    assert out.sum() == 0
    out = build_training_mask(sem, mask, 'baseline_without_mask')
    assert out.all()
    # condition_C with default 35 m: center occupied voxel forced on;
    # pc_range_x=80 -> voxel 4 m; corner voxel ~ (2-9.5)*4 = 42 m away
    out = build_training_mask(sem, mask, 'condition_C')
    assert out[10, 10, 0] == 1 and out[2, 2, 0] == 0
    assert out.sum() == 1
    out = build_training_mask(sem, mask, 'condition_C_full')
    assert out[2, 2, 0] == 1 and out.sum() == 2
    out = build_training_mask(sem, mask, 'condition_D_full')
    assert out.sum() == X * Y * Z - 2
    # condition_D: only free voxels within 20 m
    out = build_training_mask(sem, mask, 'condition_D')
    assert out[0, 0, 0] == 0 and out[10, 9, 0] == 1


def test_bev_image_and_figure(tmp_path):
    occ = np.full((10, 12, 3), 17, np.uint8)
    occ[2, 3, 0] = 4   # car at (x=2, y=3)
    img = occupancy_bev_image(occ)
    assert img.shape == (12, 10, 3)
    assert (img == np.array([0, 150, 245])).all(-1).sum() == 1
    p = save_occupancy_figure(occ, str(tmp_path / 'occ.png'), gt=occ)
    import os
    assert os.path.exists(p)
