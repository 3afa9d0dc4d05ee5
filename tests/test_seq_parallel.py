"""Sequence parallelism (parallel/sp.py) on the virtual 8-device CPU
mesh: Megatron-SP sharding constraints over the encoder time axis are a
pure LAYOUT change — train step, eval, and decode numerics match plain
tensor parallelism and single-device execution exactly (up to fp
reduction order). Beyond the reference's capability (its only
parallelism is nn.DataParallel, train.py:97-99)."""

import functools

import jax
import numpy as np
import pytest

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                init_transformer)
from end2end_asr_tpu.parallel import sp
from end2end_asr_tpu.parallel.mesh import batch_sharded, make_mesh
from end2end_asr_tpu.parallel.tp import (make_mesh_2d, shard_opt_state,
                                         shard_params)
from end2end_asr_tpu.training.optimizer import init_adam_state
from end2end_asr_tpu.training.steps import make_encode_fn, make_train_step

pytestmark = pytest.mark.slow  # full-grad compiles / long e2e soak

CFG = Config(num_layers=2, num_heads=4, dim_model=64, dim_key=16,
             dim_value=16, dim_inner=128, dim_emb=64, feat_extractor="",
             dim_input=161, dtype="float32", dropout=0.0,
             src_max_len=64, tgt_max_len=16, src_buckets=(64,),
             tgt_buckets=(8,))
V = 24


@pytest.fixture(autouse=True)
def _sp_cleanup():
    yield
    sp.install(None)


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


def _init(cfg, seed=0):
    return jax.jit(functools.partial(init_transformer, cfg=cfg,
                                     num_vocab=V))(jax.random.PRNGKey(seed))


def test_sp_requires_model_axis_and_divisible_T():
    with pytest.raises(ValueError):
        sp.install(make_mesh(8))  # data-only mesh
    mesh = make_mesh_2d(2, n_data=4)
    sp.install(mesh)
    assert sp.active()
    sp.check_seq_divisible(64)
    with pytest.raises(ValueError):
        sp.check_seq_divisible(63)
    sp.install(None)
    assert not sp.active()
    sp.check_seq_divisible(63)  # no-op when off


def test_sp_train_step_matches_single_device():
    cfg_sp = CFG.replace(seq_parallel=True)
    mesh = make_mesh_2d(2, n_data=4)
    spect, nf, tg, tl = _batch(16)
    rng = jax.random.PRNGKey(5)

    # arm A: single device, SP off
    step1 = make_train_step(CFG, dims_from_config(CFG), from_pcm=False)
    params, state = _init(CFG)
    opt = init_adam_state(params)
    p1, _, _, m1, hyp1, _ = step1(params, opt, state, rng, spect, nf,
                                  tg, tl, spect_T=64)

    # arm B: TP + SP on the (data=4, model=2) mesh
    sp.install(mesh)
    step2 = make_train_step(cfg_sp, dims_from_config(cfg_sp),
                            from_pcm=False)
    params_b, state_b = _init(cfg_sp)
    params2 = shard_params(mesh, params_b)
    opt2 = shard_opt_state(mesh, init_adam_state(params_b), params_b)
    put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
    p2, _, _, m2, hyp2, _ = step2(params2, opt2, state_b, rng,
                                  put(spect), put(nf), put(tg), put(tl),
                                  spect_T=64)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hyp2))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)


def test_sp_encode_decode_matches_single_device():
    from end2end_asr_tpu.decoding.greedy import greedy_decode

    cfg_sp = CFG.replace(seq_parallel=True)
    mesh = make_mesh_2d(2, n_data=4)
    params, state = _init(CFG, seed=1)
    spect, nf, _, _ = _batch(16)

    dims1 = dims_from_config(CFG)
    enc1, _ = make_encode_fn(CFG, dims1, from_pcm=False)(
        params, state, spect, nf, spect_T=64)
    ids1 = greedy_decode(params, enc1, dims1, max_len=6)

    sp.install(mesh)
    dims2 = dims_from_config(cfg_sp)
    params2 = shard_params(mesh, params)
    put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
    enc2, _ = make_encode_fn(cfg_sp, dims2, from_pcm=False)(
        params2, state, put(spect), put(nf), spect_T=64)
    # encoder output is gathered back to full layout
    ids2 = greedy_decode(params2, enc2, dims2, max_len=6)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
