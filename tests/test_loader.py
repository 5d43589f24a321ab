"""Host loader: threaded fetch == serial fetch, index yielding, resampling.

The threaded path is the reference's `workers_per_gpu=4` dataloader
(configs/fusion_occ.py:317) realised as a thread pool (PIL/numpy release
the GIL) with a batch-level pipeline window.
"""
import os
import sys

import numpy as np

from fusionocc_tpu.data.dataset import data_loader
from fusionocc_tpu.models.fusion_occ import Batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class FakeDataset:
    """Deterministic per-index samples shaped like pipeline outputs."""

    def __init__(self, n=10, fail_once_at=None):
        self.n = n
        self.fail_once_at = fail_once_at
        self.failed = set()

    def __len__(self):
        return self.n

    def __getitem__(self, j):
        if j == self.fail_once_at and j not in self.failed:
            self.failed.add(j)
            raise OSError(f'corrupt sample {j}')
        sample = {k: None for k in Batch._fields}
        sample['imgs'] = np.full((2, 3), float(j), np.float32)
        sample['points'] = np.full((4,), float(j) * 10, np.float32)
        return sample


def _collect(**kw):
    return list(data_loader(FakeDataset(), batch_size=2, shuffle=False, **kw))


def test_threaded_loader_matches_serial():
    serial = _collect(num_workers=0)
    threaded = _collect(num_workers=4, pipeline_batches=3)
    assert len(serial) == len(threaded) == 5
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a.imgs, b.imgs)
        np.testing.assert_array_equal(a.points, b.points)
    # content encodes the index: batch k holds samples 2k, 2k+1
    for k, b in enumerate(threaded):
        np.testing.assert_array_equal(b.imgs[0], np.full((2, 3), 2 * k))
        np.testing.assert_array_equal(b.imgs[1], np.full((2, 3), 2 * k + 1))


def test_yield_indices():
    out = _collect(num_workers=2, yield_indices=True)
    for k, (batch, idxs) in enumerate(out):
        assert list(idxs) == [2 * k, 2 * k + 1]
        assert isinstance(batch, Batch)


def test_dataset_rng_determinism_across_workers(tmp_path):
    """Real dataset pipeline (augs, BDA, sweep subsampling) must produce
    byte-identical batches regardless of worker count — the per-sample
    derived RNG makes __getitem__ thread-safe (a shared RandomState would
    make augs depend on thread interleaving).  Reference analog:
    per-worker seeding via DistSamplerSeedHook (configs/fusion_occ.py:412)."""
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from tools.bench_loader import make_fake_tree
    from fusionocc_tpu.config import tiny_model_config
    from fusionocc_tpu.data.dataset import NuScenesOccDataset

    cfg = tiny_model_config()
    root = str(tmp_path)
    ann = make_fake_tree(root, 4, img_hw=(96, 160), n_points=3000,
                         occ_shape=(20, 20, 4))
    ds = NuScenesOccDataset(ann, cfg, data_root=root, train=True)

    serial = list(data_loader(ds, 2, shuffle=False, num_workers=0))
    threaded = list(data_loader(ds, 2, shuffle=False, num_workers=4))
    assert len(serial) == len(threaded) == 2
    for a, b in zip(serial, threaded):
        for f in Batch._fields:
            va, vb = getattr(a, f), getattr(b, f)
            if va is None:
                assert vb is None
                continue
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                          err_msg=f)

    # and a fresh pass is reproducible...
    again = next(iter(data_loader(ds, 2, shuffle=False, num_workers=4)))
    np.testing.assert_array_equal(again.imgs, serial[0].imgs)
    # ...while a new epoch draws different augmentations
    ds.set_epoch(1)
    other = next(iter(data_loader(ds, 2, shuffle=False, num_workers=0)))
    assert not np.array_equal(np.asarray(other.imgs),
                              np.asarray(serial[0].imgs))


def test_resample_on_failure_threaded():
    ds = FakeDataset(fail_once_at=3)
    out = list(data_loader(ds, batch_size=2, shuffle=False, num_workers=4))
    assert len(out) == 5
    vals = sorted(float(b.imgs[i, 0, 0]) for b in out for i in range(2))
    # sample 3 was replaced by a resampled index; all values stay in range
    assert all(0 <= v < 10 for v in vals)
