"""Host loader: threaded fetch == serial fetch, index yielding, resampling.

The threaded path is the reference's `workers_per_gpu=4` dataloader
(configs/fusion_occ.py:317) realised as a thread pool (PIL/numpy release
the GIL) with a batch-level pipeline window.
"""
import numpy as np

from fusionocc_tpu.data.dataset import data_loader
from fusionocc_tpu.models.fusion_occ import Batch


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


def test_resample_on_failure_threaded():
    ds = FakeDataset(fail_once_at=3)
    out = list(data_loader(ds, batch_size=2, shuffle=False, num_workers=4))
    assert len(out) == 5
    vals = sorted(float(b.imgs[i, 0, 0]) for b in out for i in range(2))
    # sample 3 was replaced by a resampled index; all values stay in range
    assert all(0 <= v < 10 for v in vals)
