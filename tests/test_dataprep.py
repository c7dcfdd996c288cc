"""Dataprep validation on synthetic raw directory trees.

The reference's prep scripts were exercised only on the real downloads
(ref:src/data/tinyimgnet_dataprep.py:154-174); here a fake
``tiny-imagenet-200`` tree (all 200 wnids, a few 64px images each) drives
``prepare()`` end-to-end, pinning the survey class ordering, the 80/20
train/val split, val->test relabeling, and token idempotence."""

import os

import numpy as np
import pytest

from clsurvey_tpu.data import tinyimagenet as tiny
from clsurvey_tpu.data.imagefolders import load_imagefolder, split_train_val

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_png(path, value):
    arr = np.full((64, 64, 3), value % 256, np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    """Fake tiny-imagenet-200: every survey wnid with 5 train + 2 val
    images (64x64)."""
    root = tmp_path_factory.mktemp("tiny-imagenet-200")
    with open(tiny.SURVEY_ORDER_FILE) as f:
        wnids = [line.strip() for line in f if line.strip()]
    assert len(wnids) == 200
    with open(root / "wnids.txt", "w") as f:
        f.write("\n".join(sorted(wnids)))
    val_dir = root / "val" / "images"
    val_dir.mkdir(parents=True)
    ann_lines = []
    for ci, wnid in enumerate(wnids):
        img_dir = root / "train" / wnid / "images"
        img_dir.mkdir(parents=True)
        for j in range(5):
            _write_png(img_dir / f"{wnid}_{j}.JPEG", ci * 5 + j)
        for j in range(2):
            fn = f"val_{ci * 2 + j}.JPEG"
            _write_png(val_dir / fn, ci)
            ann_lines.append(f"{fn}\t{wnid}\t0\t0\t0\t0")
    with open(root / "val" / "val_annotations.txt", "w") as f:
        f.write("\n".join(ann_lines))
    return root, wnids


def test_prepare_survey_order_and_splits(raw_tree, tmp_path):
    raw_root, wnids = raw_tree
    out = tiny.prepare(str(raw_root), str(tmp_path), task_count=10)
    # task 1 holds exactly the first 20 wnids of the survey ordering, in
    # order (ref:tinyimgnet_dataprep.py:216 consumes the fixed file)
    z = np.load(os.path.join(out, "task_1.npz"), allow_pickle=False)
    assert [str(c) for c in z["classes"]] == wnids[:20]
    # 80/20 split of 5 train images: 4 train + 1 val per class
    assert z["train_images"].shape == (20 * 4, 64, 64, 3)
    assert z["val_images"].shape == (20 * 1, 64, 64, 3)
    # official val becomes test: 2 per class
    assert z["test_images"].shape == (20 * 2, 64, 64, 3)
    assert set(np.unique(z["train_labels"])) == set(range(20))
    # test images carry the class-identifying pixel value
    for local, wnid in enumerate(wnids[:3]):
        sel = z["test_images"][z["test_labels"] == local]
        ci = wnids.index(wnid)
        assert np.all(sel == ci % 256), wnid

    # the sequence registry reads the prepared bundles
    seq = tiny.TinyImagenetSequence("tiny", ds_root=str(tmp_path))
    td = seq.get_task_dataset(1)
    assert td.classes == wnids[:20]
    assert td.train.images.dtype == np.uint8

    # idempotence: second call is a no-op via the token
    # (ref *.TOKEN pattern)
    marker = os.path.join(out, "task_1.npz")
    mtime = os.path.getmtime(marker)
    assert tiny.prepare(str(raw_root), str(tmp_path), task_count=10) == out
    assert os.path.getmtime(marker) == mtime


def test_prepare_40task_variant(raw_tree, tmp_path):
    raw_root, wnids = raw_tree
    out = tiny.prepare(str(raw_root), str(tmp_path), task_count=40)
    z = np.load(os.path.join(out, "task_40.npz"), allow_pickle=False)
    assert [str(c) for c in z["classes"]] == wnids[195:200]
    seq = tiny.TinyImagenetSequence("tiny40", ds_root=str(tmp_path))
    assert seq.task_count == 40
    assert seq.classes_per_task["40"] == 5


def test_load_imagefolder_and_split(tmp_path):
    """ImageFolder loader: class order, min_images filter, resize, and the
    stratified train/val split (ref:src/data/imgfolder.py +
    inaturalist ≥100-image filter)."""
    for cname, n in (("classA", 4), ("classB", 6), ("tiny", 1)):
        d = tmp_path / cname
        d.mkdir()
        for j in range(n):
            _write_png(d / f"{j}.png", hash(cname) % 200 + j)
    images, labels, classes = load_imagefolder(
        str(tmp_path), (32, 32), min_images=2)
    assert classes == ["classA", "classB"]  # 'tiny' filtered out
    assert images.shape == (10, 32, 32, 3)
    assert list(np.bincount(labels)) == [4, 6]
    tr, va = split_train_val(images, labels, val_fraction=0.25, seed=3)
    assert len(tr.labels) + len(va.labels) == 10
    # at least one val sample per class (reference splits per class)
    assert set(np.unique(va.labels)) == {0, 1}


def test_inaturalist_prepare_synthetic_tree(tmp_path, monkeypatch):
    """iNaturalist prep over a fake supercategory/species tree
    (ref:src/data/inaturalist_dataprep.py: >=100-img class filter,
    per-class test/val carving, supercategory ordering)."""
    from clsurvey_tpu.data import inaturalist as inat

    monkeypatch.setattr(inat, "MIN_IMAGES_PER_CLASS", 3)
    monkeypatch.setattr(inat, "IMG_SIZE", 16)
    raw = tmp_path / "raw"
    for sc in inat.ORDER_UNREL:
        for sp in ("sp_a", "sp_b"):
            d = raw / sc / sp
            d.mkdir(parents=True)
            for j in range(6):
                _write_png(d / f"{j}.png", hash(sc + sp) % 200 + j)
        # a species below the filter threshold must be dropped
        small = raw / sc / "sp_rare"
        small.mkdir()
        _write_png(small / "0.png", 7)
    out = inat.prepare(str(raw), str(tmp_path / "ds"), order="unrel",
                       test_fraction=0.2, val_fraction=0.25)
    assert os.path.isfile(os.path.join(out, "PREP.TOKEN"))
    for t in range(1, 11):
        assert os.path.isfile(os.path.join(out, f"task_{t}.npz"))
    seq = inat.INaturalistSequence("inat", ds_root=str(tmp_path / "ds"))
    assert seq.get_taskname(1) == "Amphibia"
    assert seq.get_taskname(10) == "Animalia"
    td = seq.get_task_dataset(1)
    assert list(td.classes) == ["sp_a", "sp_b"]  # rare species filtered
    # per task: 2 species x 6 imgs split into train/val/test, all disjoint
    total = td.train.size + td.val.size + td.test.size
    assert total == 12 and td.test.size >= 2
    # rerunning is a no-op (token idempotence)
    assert inat.prepare(str(raw), str(tmp_path / "ds")) == out


def test_recogseq_prepare_synthetic_tree(tmp_path, monkeypatch):
    """RecogSeq prep over fake per-dataset train/test ImageFolders
    (ref:src/data/recogseq_dataprep.py:13-134: 90/10 val/test carve of the
    original test split, unequal class counts across tasks)."""
    from clsurvey_tpu.data import recogseq as rs

    monkeypatch.setattr(rs, "IMG_SIZE", 16)
    raw = tmp_path / "raw"
    for k, name in enumerate(rs.TASKS):
        ncls = 2 + (k % 3)  # unequal class counts
        for c in range(ncls):
            tr = raw / name / "train" / f"cls{c}"
            te = raw / name / "test" / f"cls{c}"
            tr.mkdir(parents=True)
            te.mkdir(parents=True)
            for j in range(3):
                _write_png(tr / f"{j}.png", 10 * k + c + j)
            for j in range(10):
                _write_png(te / f"{j}.png", 10 * k + c - j)
    out = rs.prepare(str(raw), str(tmp_path / "ds"))
    seq = rs.RecogSeqSequence("recogseq", ds_root=str(tmp_path / "ds"))
    assert seq.get_taskname(1) == "flowers"
    assert seq.get_taskname(8) == "svhn"
    for t in range(1, 9):
        td = seq.get_task_dataset(t)
        ncls = 2 + ((t - 1) % 3)
        assert len(td.classes) == ncls
        assert td.train.size == 3 * ncls
        # 90/10 val/test of the 10 test images per class
        assert td.val.size == 9 * ncls
        assert td.test.size == 1 * ncls
    # unequal class counts surface through the registry metadata
    assert seq.classes_per_task["flowers"] == 2
    assert seq.classes_per_task["birds"] == 4


def test_inat_sequence_through_framework(fresh_config, monkeypatch):
    """The real iNaturalist TaskSequence drives the full framework
    (train + eval) over a reduced-size prepared tree — the BASELINE
    config-5 dataset path, not the synthetic stand-in."""
    from clsurvey_tpu.data import inaturalist as inat

    monkeypatch.setattr(inat, "MIN_IMAGES_PER_CLASS", 3)
    monkeypatch.setattr(inat, "IMG_SIZE", 32)
    raw = fresh_config.ds_root_path + "/raw"
    for sc in inat.ORDER_UNREL:
        for sp in ("sp_a", "sp_b", "sp_c"):
            d = os.path.join(raw, sc, sp)
            os.makedirs(d)
            for j in range(8):
                _write_png(os.path.join(d, f"{j}.png"),
                           hash(sc + sp) % 200 + 17 * j)
    inat.prepare(raw, fresh_config.ds_root_path)
    # only 2 tasks prepared -> cap the loop there
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from tests.helpers import load_seq_res
    from clsurvey_tpu.utils import paths as paths_lib

    manager = run_main(RunArgs(
        model_name="tiny_CNN_cl_32_32", ds_name="inat",
        method_name="finetuning", num_epochs=4, batch_size=8,
        lr_grid=(1e-2,), gridsearch_name="testgrid", max_task_count=2,
        test=True))
    assert manager.dataset.input_size == (32, 32)
    assert manager.dataset.get_taskname(1) == "Amphibia"
    out_dir = paths_lib.get_test_results_path(
        "inat", "finetuning", "tiny_CNN_cl_32_32", "testgrid",
        manager.exp_name, create=False)
    assert len(load_seq_res(out_dir, "finetuning", 1)) == 2


def test_recogseq_sequence_through_framework(fresh_config, monkeypatch):
    """RecogSeq TaskSequence (unequal class counts) through the framework."""
    from clsurvey_tpu.data import recogseq as rs

    monkeypatch.setattr(rs, "IMG_SIZE", 32)
    raw = fresh_config.ds_root_path + "/raw"
    for k, name in enumerate(rs.TASKS):
        ncls = 2 + (k % 2)  # flowers: 2 classes, scenes: 3 classes, ...
        for c in range(ncls):
            for split, n in (("train", 6), ("test", 10)):
                d = os.path.join(raw, name, split, f"cls{c}")
                os.makedirs(d)
                for j in range(n):
                    _write_png(os.path.join(d, f"{j}.png"), 31 * k + 7 * c + j)
    rs.prepare(raw, fresh_config.ds_root_path)
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from tests.helpers import load_seq_res
    from clsurvey_tpu.utils import paths as paths_lib

    manager = run_main(RunArgs(
        model_name="tiny_CNN_cl_32_32", ds_name="recogseq",
        method_name="finetuning", num_epochs=4, batch_size=8,
        lr_grid=(1e-2,), gridsearch_name="testgrid", max_task_count=2,
        test=True))
    assert manager.dataset.classes_per_task["flowers"] == 2
    assert manager.dataset.classes_per_task["scenes"] == 3
    out_dir = paths_lib.get_test_results_path(
        "recogseq", "finetuning", "tiny_CNN_cl_32_32", "testgrid",
        manager.exp_name, create=False)
    assert len(load_seq_res(out_dir, "recogseq" and "finetuning", 1)) == 2


def test_tiny_sequence_through_framework(fresh_config, raw_tree):
    """The real Tiny-ImageNet TaskSequence (survey ordering, 20 classes/
    task) drives the framework end-to-end over a prepared fake tree."""
    root, wnids = raw_tree
    tiny.prepare(str(root), fresh_config.ds_root_path, task_count=10)
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from tests.helpers import load_seq_res
    from clsurvey_tpu.utils import paths as paths_lib

    manager = run_main(RunArgs(
        model_name="tiny_CNN_cl_32_32", ds_name="tiny",
        method_name="finetuning", num_epochs=3, batch_size=20,
        lr_grid=(1e-2,), gridsearch_name="testgrid", max_task_count=2,
        test=True))
    assert manager.dataset.classes_per_task["1"] == 20
    # the first task trains on the survey ordering's first 20 wnids
    td = manager.dataset.get_task_dataset(1)
    assert list(td.classes) == wnids[:20]
    out_dir = paths_lib.get_test_results_path(
        "tiny", "finetuning", "tiny_CNN_cl_32_32", "testgrid",
        manager.exp_name, create=False)
    assert len(load_seq_res(out_dir, "finetuning", 1)) == 2


def test_inat_ordering_name_parse(tmp_path):
    """'inat_unrel' must select the UNRELATED ordering ('unrel' ends with
    'rel' — regression for the suffix trap) and 'inat_rel' the related."""
    from clsurvey_tpu.data import inaturalist as inat_mod

    from clsurvey_tpu.data import imagefolders as imf
    from clsurvey_tpu.data.registry import SplitData

    sd = SplitData(np.zeros((2, 4, 4, 3), np.uint8),
                   np.zeros(2, np.int32))
    for order in ("rel", "unrel"):
        out = tmp_path / f"inaturalist_{order}_10tasks"
        out.mkdir()
        imf.save_task_npz(str(out), 1, sd, sd, sd, ["c0"])
    for name, want in (("inat", "unrel"), ("inat_unrel", "unrel"),
                       ("inat_rel", "rel")):
        seq = inat_mod.INaturalistSequence(name, ds_root=str(tmp_path))
        assert seq.order == want, (name, seq.order)
        assert seq.ordering == (inat_mod.ORDER_REL if want == "rel"
                                else inat_mod.ORDER_UNREL)
