"""Unequal per-task class counts (the RecogSeq regime): padded heads with
logit masking through the full framework (SURVEY §7 hard-part 3)."""

import os

import numpy as np

from clsurvey_tpu.framework.common import RunArgs
from clsurvey_tpu.framework.main import main as run_main
from clsurvey_tpu.utils import io, paths as paths_lib


def test_unequal_counts_full_pipeline(fresh_config):
    from clsurvey_tpu.data import parse as parse_ds

    seq = parse_ds("synthetic_3t_5-3-4c_32px")
    assert seq.task_count == 3
    assert seq.class_count_list() == [5, 3, 4]
    assert seq.max_classes_per_task == 5

    manager = run_main(RunArgs(
        model_name="tiny_CNN_cl_32_32", ds_name="synthetic_3t_5-3-4c_32px",
        method_name="finetuning", num_epochs=6, batch_size=32,
        lr_grid=(1e-2,), gridsearch_name="testgrid", test=True))
    best = io.load(manager.previous_task_model_path)
    # head bank width = max classes; counts preserved
    assert np.asarray(best["heads"]["kernel"]).shape[-1] == 5
    np.testing.assert_array_equal(
        np.asarray(best["heads"]["class_counts"])[:3], [5, 3, 4])
    out_dir = paths_lib.get_test_results_path(
        "synthetic_3t_5-3-4c_32px", "finetuning", "tiny_CNN_cl_32_32",
        "testgrid", manager.exp_name, create=False)
    from tests.helpers import load_seq_res

    for t in (1, 2, 3):
        accs = load_seq_res(out_dir, "finetuning", t)
        assert len(accs) == 3 - t + 1
        # task-2 has 3 classes: masked slots must never be predicted, so
        # accuracy on its own model should clear chance comfortably
        assert accs[-1] >= 0.0
    assert load_seq_res(out_dir, "finetuning", 2)[0] > 60.0


def test_rebuild_head_bank_preserves_trained_slots():
    """A width/task-count rebuild must carry over every existing head slot
    (latent footgun flagged in r1: fresh init wiped all tasks' heads)."""
    import jax

    from clsurvey_tpu.methods.common import rebuild_head_bank
    from clsurvey_tpu.models import heads as heads_lib

    key = jax.random.PRNGKey(0)
    bank = heads_lib.init_head_bank(key, 3, feat_dim=8, num_classes=4,
                                    class_counts=[4, 3, 4])
    trained = {
        "kernel": np.asarray(bank["kernel"]) + 1.0,  # pretend-trained
        "bias": np.asarray(bank["bias"]) + 2.0,
        "class_counts": bank["class_counts"],
    }
    new = rebuild_head_bank(trained, jax.random.PRNGKey(1), n_tasks=4,
                            class_counts=np.asarray([4, 3, 4, 7]))
    assert np.asarray(new["kernel"]).shape == (4, 8, 7)
    # old slots preserved in the overlapping width
    np.testing.assert_array_equal(np.asarray(new["kernel"])[:3, :, :4],
                                  trained["kernel"])
    np.testing.assert_array_equal(np.asarray(new["bias"])[:3, :4],
                                  trained["bias"])
    np.testing.assert_array_equal(np.asarray(new["class_counts"]),
                                  [4, 3, 4, 7])
    # narrowing keeps the overlap too
    nar = rebuild_head_bank(trained, jax.random.PRNGKey(2), n_tasks=3,
                            class_counts=np.asarray([2, 2, 2]))
    np.testing.assert_array_equal(np.asarray(nar["kernel"])[:3, :, :2],
                                  trained["kernel"][:, :, :2])
