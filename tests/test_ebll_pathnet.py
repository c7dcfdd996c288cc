"""EBLL + PathNet sequence tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

COMMON = dict(
    model_name="tiny_CNN_cl_32_32",
    ds_name="synthetic_2t_4c_32px",
    num_epochs=3, batch_size=32, lr_grid=(1e-2,),
    gridsearch_name="testgrid", max_attempts_per_task=2,
)


def test_autoencoder_learns_identityish():
    from clsurvey_tpu.methods.ebll import (
        decode, encode, init_autoencoder)

    ae = init_autoencoder(jax.random.PRNGKey(0), x_dim=8, h_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    h = encode(ae, x)
    assert h.shape == (16, 4)
    assert float(h.min()) >= 0.0 and float(h.max()) <= 1.0  # sigmoid codes
    recon = decode(ae, h)
    assert recon.shape == x.shape


def test_ebll_sequence(fresh_config):
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io, paths as paths_lib

    run_main(RunArgs(method_name="SI",
                     runmode="first_task_basemodel_dump", **COMMON))
    manager = run_main(RunArgs(
        method_name="EBLL", test=True,
        # tiny AE grid: 1 dim x 1 alpha x 1 lr, few epochs
        static_hyperparams="0.01;5;0.1;16",
        **COMMON))
    best = io.load(manager.previous_task_model_path)
    assert "method_aux" in best
    encoders = best["method_aux"]["encoders"]
    assert len(encoders) == 1  # one encoder for task 1
    out_dir = paths_lib.get_test_results_path(
        COMMON["ds_name"], "EBLL", COMMON["model_name"], "testgrid",
        manager.exp_name, create=False)
    from tests.helpers import load_seq_res

    assert len(load_seq_res(out_dir, "EBLL", 1)) == 2


def test_pathnet_sequence(fresh_config):
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io, paths as paths_lib

    manager = run_main(RunArgs(
        method_name="pathnet", test=True,
        hyperparams="2",            # N = 2 modules per layer
        static_hyperparams="4;2",   # M = 4, generations = 2
        **COMMON))
    best = io.load(manager.previous_task_model_path)
    assert best["meta"].get("pathnet")
    bps = best["method_aux"]["best_paths"]
    assert len(bps) == 2  # one best path per task
    # N may have grown via the increment decay operator during attempts
    assert np.asarray(bps[0]).shape[-1] >= 2
    out_dir = paths_lib.get_test_results_path(
        COMMON["ds_name"], "pathnet", COMMON["model_name"], "testgrid",
        manager.exp_name, create=False)
    from tests.helpers import load_seq_forgetting, load_seq_res

    seq = load_seq_res(out_dir, "pathnet", 1)
    assert len(seq) == 2
    assert seq[0] > 40.0  # must beat chance (25%)
    # task-1 path modules are frozen -> zero forgetting
    assert abs(load_seq_forgetting(out_dir, "pathnet", 1)[0]) < 1e-6


def test_pathnet_decay_operator():
    from clsurvey_tpu.methods.pathnet import PathNet

    m = PathNet()
    assert m.decay_operator(3, 0.5) == 4  # increments, never multiplies


def test_pathnet_diverged_candidate_cannot_poison_frozen_modules(tmp_path):
    """A candidate trained at a divergent lr produces NaN grads; the
    0-gated (frozen) modules must stay finite and bit-identical (NaN*0
    through a multiplicative gate would destroy every previous task's
    subnetwork), and the saved model must be finite (regression:
    demo task-4 NaN cascade)."""
    from collections import OrderedDict

    from clsurvey_tpu.data.registry import parse as parse_ds
    from clsurvey_tpu.framework.common import Manager, RunArgs
    from clsurvey_tpu.methods.pathnet import PathNet, _layer_index
    from clsurvey_tpu.models.registry import parse_model_name
    from clsurvey_tpu.utils import io

    spec = parse_model_name(str(tmp_path / "models"), "tiny_CNN_cl_32_32",
                            (32, 32))
    ds = parse_ds("synthetic_2t_4c_32px")
    args = RunArgs(model_name="tiny_CNN_cl_32_32",
                   ds_name="synthetic_2t_4c_32px", num_epochs=2,
                   batch_size=32, lr_grid=(1e-2,), gridsearch_name="g")
    m = Manager(args=args, dataset=ds, method=None, model_spec=spec)
    pn = PathNet(static_hyperparams=OrderedDict(
        {"M": 2, "generations": 2}))
    pn.hyperparams = OrderedDict({"N": 1})

    m.set_dataset(1)
    m.extras["lr"] = 1e-2
    d1 = str(tmp_path / "t1")
    out1, _ = pn._evolve(args, m, N=1, generations=1, nepochs_per_gen=2,
                         exp_dir=d1, seed=7)

    # task 2 at a divergent lr
    m.set_dataset(2)
    m.previous_task_model_path = os.path.join(d1, "best_model.pth.tar")
    m.extras["lr"] = 1e6
    d2 = str(tmp_path / "t2")
    out2, _ = pn._evolve(args, m, N=1, generations=2, nepochs_per_gen=2,
                         exp_dir=d2, seed=7)

    bp1 = [np.asarray(p) for p in out1["method_aux"]["best_paths"]]
    L, M = bp1[0].shape[0], 2
    frozen = np.zeros((L, M))
    for p in bp1:
        for layer in range(L):
            for k in p[layer]:
                frozen[layer, k % M] = 1
    n_convs = sum(1 for n in out1["params"]
                  if n.startswith("conv_") and n.endswith("_kernel"))
    for name in out1["params"]:
        layer = _layer_index(name, n_convs)
        a = np.asarray(out1["params"][name])
        b = np.asarray(out2["params"][name])
        assert np.isfinite(b).all(), f"non-finite {name}"
        for mod in range(M):
            if frozen[layer, mod]:
                np.testing.assert_array_equal(a[mod], b[mod],
                                              err_msg=f"{name}[{mod}]")


def test_pathnet_eval_honors_test_set(tmp_path):
    """--test_set val must evaluate the val split (VERDICT r1 #6; the
    reference eval honors the subset arg, ref:src/framework/main.py:74)."""
    from collections import OrderedDict

    from clsurvey_tpu.data.registry import parse as parse_ds
    from clsurvey_tpu.framework.common import Manager, RunArgs
    from clsurvey_tpu.methods.pathnet import PathNet

    spec_path = str(tmp_path / "models")
    from clsurvey_tpu.models.registry import parse_model_name
    spec = parse_model_name(spec_path, "tiny_CNN_cl_32_32", (32, 32))
    ds = parse_ds("synthetic_1t_4c_32px")
    args = RunArgs(model_name="tiny_CNN_cl_32_32",
                   ds_name="synthetic_1t_4c_32px", num_epochs=4,
                   batch_size=32, lr_grid=(1e-2,), gridsearch_name="g")
    m = Manager(args=args, dataset=ds, method=None, model_spec=spec)
    pn = PathNet(static_hyperparams=OrderedDict({"M": 2, "generations": 1}))
    pn.hyperparams = OrderedDict({"N": 1})
    m.set_dataset(1)
    m.extras["lr"] = 1e-2
    out, _ = pn._evolve(args, m, N=1, generations=1, nepochs_per_gen=4,
                        exp_dir=str(tmp_path / "t1"), seed=7)

    # corrupt the cached test split so the two subsets are distinguishable
    td = ds.get_task_dataset(1)
    td.test.labels[:] = (td.test.labels + 1) % 4

    args.test_set = "test"
    acc_test = pn.inference_eval(m, out, 1, 1)
    args.test_set = "val"
    acc_val = pn.inference_eval(m, out, 1, 1)
    assert acc_val > 0.9          # learnable split, trained path
    assert acc_test < 0.1         # rotated labels -> near zero
    assert acc_val - acc_test > 0.5


def test_module_train_mask_two_configs_interleaved():
    """Two PathNet configs with different conv counts used in the same
    process must not corrupt each other's fc layer indexing (VERDICT r1
    weak #5: the old `_layer_index.n_convs` global side channel)."""
    import jax.numpy as jnp

    from clsurvey_tpu.methods.pathnet import module_train_mask

    M = 3
    params_a = {  # 1 conv + 1 fc -> L = 2
        "conv_0_kernel": jnp.zeros((M, 3, 3, 3, 4)),
        "fc_0_kernel": jnp.zeros((M, 8, 4)),
    }
    params_b = {  # 2 convs + 1 fc -> L = 3
        "conv_0_kernel": jnp.zeros((M, 3, 3, 3, 4)),
        "conv_1_kernel": jnp.zeros((M, 3, 3, 4, 4)),
        "fc_0_kernel": jnp.zeros((M, 8, 4)),
    }
    path_a = np.array([[0], [1]])           # fc uses module 1
    path_b = np.array([[0], [0], [2]])      # fc uses module 2
    frozen_a = np.zeros((2, M), np.float32)
    frozen_b = np.zeros((3, M), np.float32)

    # interleave: a, b, a — each must see its own layer mapping
    for _ in range(2):
        ga = module_train_mask(params_a, path_a, frozen_a, n_convs=1)
        gb = module_train_mask(params_b, path_b, frozen_b, n_convs=2)
        np.testing.assert_array_equal(
            np.asarray(ga["fc_0_kernel"]).ravel(), [0, 1, 0])
        np.testing.assert_array_equal(
            np.asarray(gb["fc_0_kernel"]).ravel(), [0, 0, 1])
