"""Pipeline parallelism (parallel/pp.py) on the virtual 8-device CPU mesh.

GPipe microbatch pipelining of the encoder/decoder layer stacks over a
'pipe' mesh axis (shard_map manual over 'pipe' only; ppermute stage
hops; autodiff-pipelined backward). Beyond the reference's capability
envelope (its only parallelism is nn.DataParallel, train.py:97-99) —
verified here against single-device numerics for the raw pipeline
primitive, the encoder/decoder stacks, the full train step, and the
composition with tensor parallelism on a ('data','pipe','model') mesh.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models.transformer import (dims_from_config, forward,
                                                init_transformer)
from end2end_asr_tpu.parallel import pp
from end2end_asr_tpu.parallel.mesh import batch_sharded
from end2end_asr_tpu.training.optimizer import init_adam_state
from end2end_asr_tpu.training.steps import make_train_step

pytestmark = pytest.mark.slow  # full-grad compiles / long e2e soak

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


def _init(cfg=CFG, seed=0):
    return jax.jit(functools.partial(init_transformer, cfg=cfg,
                                     num_vocab=V))(jax.random.PRNGKey(seed))


def test_mesh_pipe_shapes_and_validation():
    mesh = pp.make_mesh_pipe(2)
    assert mesh.shape == {"data": 4, "pipe": 2}
    mesh = pp.make_mesh_pipe(2, n_model=2)
    assert mesh.shape == {"data": 2, "pipe": 2, "model": 2}
    mesh = pp.make_mesh_pipe(4, n_data=2)
    assert mesh.shape == {"data": 2, "pipe": 4}
    with pytest.raises(ValueError):
        pp.make_mesh_pipe(16)
    with pytest.raises(ValueError):
        pp.make_mesh_pipe(3)  # does not divide 8
    with pytest.raises(ValueError):
        pp.check_pp_divisibility(CFG, 3)  # 2 layers over 3 stages
    pp.check_pp_divisibility(CFG, 2)


@pytest.mark.parametrize("n_pipe,n_micro", [(2, 2), (4, 2), (2, 4)])
def test_pipeline_apply_generic(n_pipe, n_micro):
    """The raw GPipe primitive reproduces a sequential layer loop,
    forward and grad, for any (stages, microbatches) split."""
    L, B, T, H = 4, 8, 6, 16
    mesh = pp.make_mesh_pipe(n_pipe)
    ws = jax.random.normal(jax.random.PRNGKey(0), (L, H, H)) * 0.2
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H))
    mask = (jnp.arange(B) % 2).astype(jnp.float32)[:, None, None]

    def layer(w, a, m):
        return jnp.tanh(a @ w) * m + a * (1 - m)

    @jax.jit
    def seq_loss(ws, x):
        a = x
        for i in range(L):
            a = layer(ws[i], a, mask)
        return jnp.sum(a ** 2), a

    def pipe_loss(ws, x):
        a = pp.pipeline_apply(
            ws, x, (mask * jnp.ones((B, 1, 1)),),
            lambda w, a, cs, mb: layer(w, a, cs[0]),
            n_micro=n_micro, mesh=mesh)
        return jnp.sum(a ** 2), a

    (l1, y1) = seq_loss(ws, x)
    (l2, y2) = jax.jit(pipe_loss)(ws, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-6)
    g1 = jax.jit(jax.grad(lambda w, x: seq_loss(w, x)[0]))(ws, x)
    g2 = jax.jit(jax.grad(lambda w, x: pipe_loss(w, x)[0]))(ws, x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_forward_pipeline_matches_sequential():
    """Teacher-forced forward through BOTH pipelined stacks (encoder +
    decoder) equals the sequential path (deterministic)."""
    params, state = _init()
    spect, nf, tg, _ = _batch(8)
    dims_seq = dims_from_config(CFG)
    dims_pp = dims_from_config(CFG.replace(mesh_pipe=2))
    assert dims_pp.pipeline and not dims_seq.pipeline

    pred1, gold1, _ = jax.jit(functools.partial(
        forward, dims=dims_seq, train=False))(params, state, spect, nf, tg)
    pp.install(pp.make_mesh_pipe(2), 2)
    try:
        pred2, gold2, _ = jax.jit(functools.partial(
            forward, dims=dims_pp, train=False))(params, state, spect,
                                                 nf, tg)
    finally:
        pp.install(None)
    np.testing.assert_array_equal(np.asarray(gold1), np.asarray(gold2))
    np.testing.assert_allclose(np.asarray(pred1), np.asarray(pred2),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_model", [1, 2])
def test_pp_train_step_matches_single_device(n_model):
    """Full train step (loss, update, argmax hyp) under the pipeline
    mesh — alone and composed with tensor parallelism — matches the
    single-device step to fp-reduction tolerance."""
    cfg_pp = CFG.replace(mesh_pipe=2)
    mesh = pp.make_mesh_pipe(2, n_model=n_model)
    spect, nf, tg, tl = _batch(16)
    rng = jax.random.PRNGKey(5)

    step = make_train_step(CFG, dims_from_config(CFG), from_pcm=False)
    params, state = _init()
    opt = init_adam_state(params)
    p1, o1, s1, m1, hyp1, gold1 = step(params, opt, state, rng, spect,
                                       nf, tg, tl, spect_T=64)

    params_b, state_b = _init()
    opt_b = init_adam_state(params_b)
    if n_model > 1:
        from end2end_asr_tpu.parallel.tp import (shard_opt_state,
                                                 shard_params)
        opt_b = shard_opt_state(mesh, opt_b, params_b)
        params_b = shard_params(mesh, params_b)
    put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
    pp.install(mesh, 2)
    try:
        step2 = make_train_step(cfg_pp, dims_from_config(cfg_pp),
                                from_pcm=False)
        p2, o2, s2, m2, hyp2, gold2 = step2(params_b, opt_b, state_b, rng,
                                            put(spect), put(nf), put(tg),
                                            put(tl), spect_T=64)
        loss2 = float(m2["loss"])
    finally:
        pp.install(None)

    assert abs(float(m1["loss"]) - loss2) < 1e-5
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hyp2))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)


def test_pp_train_mode_dropout_runs_and_is_deterministic():
    """Train-mode dropout under the pipeline draws per-(layer,
    microbatch) streams — not numerically comparable to the sequential
    path, but must run, be finite, and be deterministic per seed."""
    cfg = CFG.replace(mesh_pipe=2, dropout=0.1)
    spect, nf, tg, tl = _batch(8)
    params, state = _init(cfg)
    dims = dims_from_config(cfg)
    pp.install(pp.make_mesh_pipe(2), 2)
    try:
        f = jax.jit(functools.partial(forward, dims=dims, train=True))
        pred1, _, _ = f(params, state, spect, nf, tg,
                        rng=jax.random.PRNGKey(7))
        pred2, _, _ = f(params, state, spect, nf, tg,
                        rng=jax.random.PRNGKey(7))
        pred3, _, _ = f(params, state, spect, nf, tg,
                        rng=jax.random.PRNGKey(8))
    finally:
        pp.install(None)
    assert np.all(np.isfinite(np.asarray(pred1)))
    np.testing.assert_array_equal(np.asarray(pred1), np.asarray(pred2))
    assert np.any(np.asarray(pred1) != np.asarray(pred3))


def test_pp_microbatch_divisibility_error():
    mesh = pp.make_mesh_pipe(2)
    ws = jnp.zeros((2, 4, 4))
    x = jnp.zeros((6, 3, 4))
    with pytest.raises(ValueError, match="not divisible"):
        pp.pipeline_apply(ws, x, (), lambda w, a, cs, mb: a,
                          n_micro=4, mesh=mesh)
    with pytest.raises(ValueError, match="split over"):
        pp.pipeline_apply(jnp.zeros((3, 4, 4)), x, (),
                          lambda w, a, cs, mb: a, n_micro=2, mesh=mesh)
