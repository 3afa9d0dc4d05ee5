"""SPMD correctness on the virtual 8-device CPU mesh: sharded train step
matches single-device numerics; sharded evaluation produces identical
hypotheses."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models.transformer import dims_from_config, init_transformer
from end2end_asr_tpu.parallel.mesh import (batch_sharded, check_divisible,
                                           make_mesh, replicated)
from end2end_asr_tpu.training.optimizer import init_adam_state
from end2end_asr_tpu.training.steps import make_encode_fn, make_train_step

CFG = Config(num_layers=2, num_heads=4, dim_model=64, dim_key=16,
             dim_value=16, dim_inner=128, dim_emb=64, feat_extractor="",
             dim_input=161, dtype="float32", dropout=0.0,
             src_max_len=64, tgt_max_len=16, src_buckets=(64,),
             tgt_buckets=(8,))
V = 24


def _batch(B):
    rs = np.random.RandomState(0)
    spect = rs.randn(B, 161, 64).astype(np.float32)
    nf = np.full(B, 64, np.int32)
    tg = np.zeros((B, 8), np.int32)
    tg[:, 0] = 1
    tg[:, 1:4] = rs.randint(3, V, size=(B, 3))
    tg[:, 4] = 2
    tl = np.full(B, 5, np.int32)
    return spect, nf, tg, tl


def test_mesh_requires_divisible_batch():
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        check_divisible(12, mesh)
    check_divisible(16, mesh)
    # grad-accum must divide the PER-DEVICE batch on a mesh
    check_divisible(16, mesh, grad_accum=2)
    with pytest.raises(ValueError):
        check_divisible(16, mesh, grad_accum=4)


def test_sharded_train_step_matches_single_device():
    mesh = make_mesh(8)
    init = jax.jit(functools.partial(init_transformer, cfg=CFG,
                                     num_vocab=V))
    step = make_train_step(CFG, dims_from_config(CFG), from_pcm=False)
    spect, nf, tg, tl = _batch(16)
    rng = jax.random.PRNGKey(5)

    # two independent (identical) inits: the step DONATES param/opt
    # buffers, and device_put may alias the source as the local shard
    params, state = init(jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    p1, o1, s1, m1, hyp1, gold1 = step(params, opt, state, rng, spect,
                                       nf, tg, tl, spect_T=64)

    params_b, state_b = init(jax.random.PRNGKey(0))
    rep = replicated(mesh)
    params2 = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                     params_b)
    opt2 = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                  init_adam_state(params_b))
    state = state_b
    put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
    p2, o2, s2, m2, hyp2, gold2 = step(params2, opt2, state, rng,
                                       put(spect), put(nf), put(tg),
                                       put(tl), spect_T=64)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hyp2))
    la = jax.tree_util.tree_leaves(p1)
    lb = jax.tree_util.tree_leaves(p2)
    for a, b in zip(la, lb):
        # cross-device psum changes float accumulation order slightly
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)


def test_sharded_encode_decode_matches_single_device():
    from end2end_asr_tpu.decoding.greedy import greedy_decode

    mesh = make_mesh(8)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=CFG, num_vocab=V))(jax.random.PRNGKey(1))
    dims = dims_from_config(CFG)
    encode_fn = make_encode_fn(CFG, dims, from_pcm=False)
    spect, nf, _, _ = _batch(16)

    enc1, _ = encode_fn(params, state, spect, nf, spect_T=64)
    ids1 = greedy_decode(params, enc1, dims, max_len=6)

    rep = replicated(mesh)
    params2 = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                     params)
    put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
    enc2, _ = encode_fn(params2, state, put(spect), put(nf), spect_T=64)
    ids2 = greedy_decode(params2, enc2, dims, max_len=6)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))


def test_sharded_grad_accum_matches_unsharded():
    """--grad-accum composes with the mesh: the INTERLEAVED microbatch
    split (training/steps.py resh) keeps every microbatch exactly
    batch-sharded, and the accumulated step matches the unsharded
    full-batch step."""
    mesh = make_mesh(8)
    cfg1 = CFG
    cfgK = CFG.replace(grad_accum=2)
    init = jax.jit(functools.partial(init_transformer, cfg=cfg1,
                                     num_vocab=V))
    spect, nf, tg, tl = _batch(16)
    # ragged target lengths so microbatch token counts differ
    tl = np.array([3 + (b % 4) for b in range(16)], np.int32)
    rng = jax.random.PRNGKey(5)

    params, state = init(jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    step1 = make_train_step(cfg1, dims_from_config(cfg1), from_pcm=False)
    p1, _, _, m1, hyp1, _ = step1(params, opt, state, rng, spect, nf,
                                  tg, tl, spect_T=64)

    params_b, state_b = init(jax.random.PRNGKey(0))
    rep = replicated(mesh)
    params2 = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                     params_b)
    opt2 = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep),
                                  init_adam_state(params_b))
    put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
    stepK = make_train_step(cfgK, dims_from_config(cfgK), from_pcm=False)
    p2, _, _, m2, hyp2, _ = stepK(params2, opt2, state_b, rng,
                                  put(spect), put(nf), put(tg), put(tl),
                                  spect_T=64)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hyp2))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)


def test_sharded_multi_dispatch_matches_sequential():
    """--steps-per-dispatch composes with the mesh: the K-stacked batch
    re-constrained to stacked_batch_sharded scans K sharded steps that
    match K sequential sharded dispatches."""
    import jax.numpy as jnp

    from end2end_asr_tpu.parallel.mesh import stacked_batch_sharded
    from end2end_asr_tpu.training.steps import make_multi_train_step

    mesh = make_mesh(8)
    K = 2
    init = jax.jit(functools.partial(init_transformer, cfg=CFG,
                                     num_vocab=V))
    dims = dims_from_config(CFG)
    rngs = jax.random.split(jax.random.PRNGKey(9), K)
    batches = []
    for k in range(K):
        spect, nf, tg, tl = _batch(16)
        spect = spect + k  # distinct batches
        batches.append((spect, nf, tg, tl))

    rep = replicated(mesh)
    put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))

    # arm A: K sequential sharded single-step dispatches
    params_a, state_a = init(jax.random.PRNGKey(0))
    params_a = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), params_a)
    opt_a = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), init_adam_state(params_a))
    step = make_train_step(CFG, dims, from_pcm=False)
    losses_a = []
    for k in range(K):
        spect, nf, tg, tl = batches[k]
        params_a, opt_a, state_a, m, _, _ = step(
            params_a, opt_a, state_a, rngs[k], put(spect), put(nf),
            put(tg), put(tl), spect_T=64)
        losses_a.append(float(m["loss"]))

    # arm B: one K-step program over the stacked, re-constrained batch
    params_b, state_b = init(jax.random.PRNGKey(0))
    params_b = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), params_b)
    opt_b = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), init_adam_state(params_b))
    stack = lambda c: jax.device_put(
        jnp.stack([put(b[c]) for b in batches]),
        stacked_batch_sharded(mesh, np.ndim(batches[0][c]) + 1))
    multi = make_multi_train_step(CFG, dims, from_pcm=False)
    params_b, opt_b, state_b, ms, _, _ = multi(
        params_b, opt_b, state_b, rngs, stack(0), stack(1), stack(2),
        stack(3), spect_T=64)

    losses_b = [float(x) for x in np.asarray(ms["loss"])]
    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
