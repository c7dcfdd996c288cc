"""Hard-mode synthetic generator: shared-basis class signal with
in-subspace nuisance (difficulty knob), plus the nz white-noise knob."""

import numpy as np
import pytest

from clsurvey_tpu.data import synthetic as syn
from clsurvey_tpu.data.registry import parse


pytestmark = pytest.mark.smoke


def test_name_knobs_parse():
    seq = parse("synthetic_3t_4c_32px_50n_nz35_hd200")
    assert seq.task_count == 3
    assert seq._noise == pytest.approx(0.35)
    assert seq._hard_rho == pytest.approx(2.0)
    td = seq.get_task_dataset(1)
    assert td.train.images.shape == (4 * 50, 32, 32, 3)
    assert td.train.images.dtype == np.uint8


def test_hard_mode_deterministic_and_distinct_tasks():
    a = parse("synthetic_2t_4c_32px_30n_hd150").get_task_dataset(1)
    b = parse("synthetic_2t_4c_32px_30n_hd150").get_task_dataset(1)
    np.testing.assert_array_equal(a.train.images, b.train.images)
    t2 = parse("synthetic_2t_4c_32px_30n_hd150").get_task_dataset(2)
    assert not np.array_equal(a.train.images, t2.train.images)


def test_hard_mode_no_mean_color_shortcut():
    """Per-class mean colors must be indistinguishable (the easy mode's
    solid-color anchor is the trivially-separable shortcut hard mode
    removes)."""
    td = parse("synthetic_1t_4c_32px_100n_hd100").get_task_dataset(1)
    imgs = td.train.images.astype(np.float64)
    labels = td.train.labels
    means = np.stack([imgs[labels == c].mean(axis=(0, 1, 2))
                      for c in range(4)])
    assert np.ptp(means, axis=0).max() < 8.0, means


def test_hard_mode_signal_in_shared_basis():
    """Class-mean fields must project mostly onto the global basis, and
    the basis is identical for every task (transferable features)."""
    h = w = 32
    basis = syn._shared_basis(h, w)
    td = parse("synthetic_2t_3c_32px_80n_hd100").get_task_dataset(1)
    imgs = td.train.images.astype(np.float64)
    labels = td.train.labels
    cls_mean = imgs[labels == 0].mean(axis=0).mean(axis=-1) - 128.0
    flat_basis = basis.reshape(syn._BASIS_K, -1)
    # least-squares projection of the class mean onto the basis span
    coef, *_ = np.linalg.lstsq(flat_basis.T, cls_mean.ravel(), rcond=None)
    recon = flat_basis.T @ coef
    resid = np.linalg.norm(cls_mean.ravel() - recon)
    assert resid < 0.35 * np.linalg.norm(cls_mean.ravel())


def test_ts_knob_parses_and_is_deterministic():
    seq2 = parse("synthetic_2t_3c_32px_40n_hd200_ts50")
    assert seq2._hard_rho == pytest.approx(2.0)
    assert seq2._task_frac == pytest.approx(0.5)
    a = parse("synthetic_2t_3c_32px_40n_hd200_ts50").get_task_dataset(1)
    b = parse("synthetic_2t_3c_32px_40n_hd200_ts50").get_task_dataset(1)
    np.testing.assert_array_equal(a.train.images, b.train.images)


def test_ts_knob_interference_structure():
    """With ts50, a task's class-mean fields carry substantial energy in
    that task's PRIVATE basis, and (near-)none in another task's private
    basis — the structure that makes later tasks overwrite earlier tasks'
    detectors (interference), unlike the fully-shared ts0 default."""
    h = w = 32
    name = "synthetic_2t_3c_32px_80n_hd100_ts50"
    k_ts = round(syn._BASIS_K * 0.5)

    def private_energy_frac(task, private_of):
        td = parse(name).get_task_dataset(task)
        imgs = td.train.images.astype(np.float64)
        labels = td.train.labels
        cls_mean = imgs[labels == 0].mean(axis=0).mean(axis=-1) - 128.0
        shared = syn._shared_basis(h, w)[:syn._BASIS_K - k_ts]
        private = syn._task_basis(h, w, private_of, k_ts)
        full = np.concatenate([shared, private]).reshape(syn._BASIS_K, -1)
        coef, *_ = np.linalg.lstsq(full.T, cls_mean.ravel(), rcond=None)
        energy = coef ** 2
        return energy[-k_ts:].sum() / energy.sum()

    own = private_energy_frac(1, private_of=1)
    cross = private_energy_frac(2, private_of=1)
    assert own > 0.25, own          # real class signal in the private span
    assert cross < own / 3, (own, cross)


def test_disk_cache_roundtrip(tmp_path, monkeypatch):
    """CLSURVEY_SYNTH_CACHE: a fresh instance loads byte-identical data
    from the npz cache, and the uncached path generates the same."""
    import numpy as np

    from clsurvey_tpu.data import registry as d

    monkeypatch.setenv("CLSURVEY_SYNTH_CACHE", str(tmp_path))
    td1 = d.parse("synthetic_2t_3c_16px_hd200").get_task_dataset(1)
    assert any(p.name.endswith(".npz") for p in tmp_path.iterdir())
    td2 = d.parse("synthetic_2t_3c_16px_hd200").get_task_dataset(1)
    np.testing.assert_array_equal(td1.train.images, td2.train.images)
    np.testing.assert_array_equal(td1.val.labels, td2.val.labels)
    assert td1.classes == td2.classes
    monkeypatch.delenv("CLSURVEY_SYNTH_CACHE")
    td3 = d.parse("synthetic_2t_3c_16px_hd200").get_task_dataset(1)
    np.testing.assert_array_equal(td1.train.images, td3.train.images)
