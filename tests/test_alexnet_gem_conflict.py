"""AlexNet backbone shapes + GEM projection firing under real conflict."""

import jax
import jax.numpy as jnp
import numpy as np

from clsurvey_tpu.models.registry import init_model_state, parse_model_name


def test_alexnet_backbone_shapes(tmp_path):
    spec = parse_model_name(str(tmp_path), "alexnet", (224, 224))
    assert spec.arch == "alexnet" and spec.feature_dim == 4096
    state = init_model_state(spec, jax.random.PRNGKey(0), max_tasks=2,
                             classes_per_task=5)
    backbone = spec.make_backbone()
    x = jnp.zeros((2, 224, 224, 3))
    feats = backbone.apply({"params": state["params"]}, x, train=False)
    assert feats.shape == (2, 4096)
    # dropout path needs an rng in train mode
    feats_t = backbone.apply({"params": state["params"]}, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
    assert feats_t.shape == (2, 4096)


def test_gem_projection_fires_on_conflicting_tasks(tmp_path):
    """Task-2 batch = task-1 memory images with permuted labels -> the
    current gradient must conflict with the memory gradient and the QP
    projection must fire (ref:gem.py:275-283)."""
    from clsurvey_tpu.engine.train import Engine, TrainState, make_context, \
        tree_zeros_like
    from clsurvey_tpu.methods.rehearsal import GEMRule, fresh_task_memory

    spec = parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32", (32, 32))
    sd = init_model_state(spec, jax.random.PRNGKey(2), max_tasks=2,
                          classes_per_task=4)
    rule = GEMRule(n_memories=16, mem_batch=16)
    ctx = make_context(spec, task=1, n_tasks=2, class_counts=[4, 4],
                       mean=(0.485, 0.456, 0.406),
                       std=(0.229, 0.224, 0.225),
                       update_rule=rule, augment=False, mesh=None)
    engine = Engine(ctx)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, (16,), dtype=np.int32)

    memory = fresh_task_memory(2, 16, (32, 32))
    memory["mem_images"] = memory["mem_images"].at[0].set(jnp.asarray(imgs))
    memory["mem_labels"] = memory["mem_labels"].at[0].set(
        jnp.asarray(labels))
    memory["mem_count"] = memory["mem_count"].at[0].set(16)

    trainable = jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True),
        {"params": sd["params"],
         "heads": {"kernel": sd["heads"]["kernel"],
                   "bias": sd["heads"]["bias"]}})
    # make BOTH heads identical so the same images with shifted labels
    # produce directly opposed gradients through the shared backbone
    trainable["heads"]["kernel"] = trainable["heads"]["kernel"].at[1].set(
        trainable["heads"]["kernel"][0])
    mstate = rule.init_state(trainable, {"margin": 1.0}, ctx, memory=memory)
    state = TrainState(trainable, {}, tree_zeros_like(trainable), mstate)

    conflicting_labels = (labels + 1) % 4  # same images, different answers
    projections = 0.0
    for i in range(5):
        state, metrics = engine._train_step(
            state, jnp.asarray(imgs), jnp.asarray(conflicting_labels),
            jax.random.PRNGKey(i), jnp.float32(0.05))
        projections += float(metrics["projected"])
    assert projections > 0, "QP projection never fired under conflict"
    assert not np.isnan(float(metrics["loss"]))


def test_gem_vmapped_memory_grads_match_loop(tmp_path):
    """The vmapped all-tasks memory-gradient computation must equal the
    sequential per-task loop (the reference's replay order)."""
    from clsurvey_tpu.engine.train import make_context
    from clsurvey_tpu.methods.rehearsal import GEMRule, fresh_task_memory
    from jax.flatten_util import ravel_pytree

    spec = parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32", (32, 32))
    sd = init_model_state(spec, jax.random.PRNGKey(2), max_tasks=3,
                          classes_per_task=4)
    rule = GEMRule(n_memories=8, mem_batch=8)
    ctx = make_context(spec, task=2, n_tasks=3, class_counts=[4, 4, 4],
                       mean=(0.485, 0.456, 0.406),
                       std=(0.229, 0.224, 0.225),
                       update_rule=rule, augment=False, mesh=None)
    rng_np = np.random.default_rng(1)
    memory = fresh_task_memory(3, 8, (32, 32))
    for t in range(2):
        memory["mem_images"] = memory["mem_images"].at[t].set(
            jnp.asarray(rng_np.integers(0, 255, (8, 32, 32, 3),
                                        dtype=np.uint8)))
        memory["mem_labels"] = memory["mem_labels"].at[t].set(
            jnp.asarray(rng_np.integers(0, 4, (8,), dtype=np.int32)))
        memory["mem_count"] = memory["mem_count"].at[t].set(8)
    trainable = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a),
        {"params": sd["params"],
         "heads": {"kernel": sd["heads"]["kernel"],
                   "bias": sd["heads"]["bias"]}})
    mstate = rule.init_state(trainable, {"margin": 1.0}, ctx, memory=memory)
    rng = jax.random.PRNGKey(5)
    G_vmap = np.asarray(rule._memory_grads_all(ctx, trainable, {}, mstate,
                                               rng))
    for tt in range(2):
        g_loop = rule._memory_grads(ctx, trainable, {}, mstate, tt, rng)
        np.testing.assert_allclose(G_vmap[tt],
                                   np.asarray(ravel_pytree(g_loop)[0]),
                                   rtol=1e-4, atol=1e-6)
