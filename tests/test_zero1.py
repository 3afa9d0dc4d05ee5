"""ZeRO-1 optimizer-state sharding (parallel/zero.py) on the virtual
8-device CPU mesh.

--zero1 lays the Adam moments out sharded over the 'data' mesh axis
(optimizer memory scales down with data-parallel degree; GSPMD
partitions the update and all-gathers the parameter delta). Beyond the
reference's capability (its optimizer state is replicated per GPU by
nn.DataParallel construction, train.py:97-99) — verified here against
unsharded numerics for the train step, alone and composed with tensor
parallelism, plus layout/coverage unit checks.
"""

import functools

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                init_transformer)
from end2end_asr_tpu.parallel import zero
from end2end_asr_tpu.parallel.mesh import batch_sharded, make_mesh
from end2end_asr_tpu.parallel.tp import make_mesh_2d, shard_params
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


def _init(seed=0, cfg=CFG):
    return jax.jit(functools.partial(init_transformer, cfg=cfg,
                                     num_vocab=V))(jax.random.PRNGKey(seed))


@pytest.fixture(autouse=True)
def _uninstall():
    yield
    zero.install(None)


def test_moment_pspecs_rules():
    params, _ = _init()
    mesh = make_mesh_2d(2)  # data=4, model=2
    specs = zero.moment_pspecs(params, mesh)
    enc0 = specs["encoder"]["layers"][0]
    # TP column spec P(None,'model') + 'data' on the free dim 0
    assert enc0["self_attn"]["q"]["w"] == P("data", "model")
    assert enc0["ffn"]["w1"]["w"] == P("data", "model")
    # TP row spec P('model',None) + 'data' on the free dim 1
    assert enc0["self_attn"]["out"]["w"] == P("model", "data")
    # replicated-under-TP leaves: 'data' on the largest divisible dim
    assert enc0["self_attn"]["ln"]["scale"] == P("data")
    assert "data" in tuple(specs["decoder"]["embedding"])
    # column bias is fully taken by 'model' (1-D) — stays as-is
    assert enc0["self_attn"]["q"]["b"] == P("model")


def test_moment_pspecs_indivisible_falls_back():
    params = {"odd": np.zeros((7, 13), np.float32),
              "scalar": np.zeros((), np.float32)}
    mesh = make_mesh(0)  # 8-way data
    specs = zero.moment_pspecs(params, mesh)
    assert specs["odd"] == P()
    assert specs["scalar"] == P()


def test_coverage_is_high():
    params, _ = _init()
    assert zero.coverage(params, make_mesh(0)) > 0.9


def _moment_sharded_leaves(opt):
    n = 0
    for leaf in jax.tree_util.tree_leaves(opt["mu"]):
        sh = leaf.sharding
        if isinstance(sh, NamedSharding) and "data" in jax.tree_util.tree_leaves(
                tuple(sh.spec)):
            n += 1
    return n


@pytest.mark.parametrize("mesh_kind", ["data", "data_model"])
def test_zero1_train_step_matches_unsharded(mesh_kind):
    if mesh_kind == "data":
        mesh = make_mesh(0)
        cfg = CFG.replace(zero1=True)
    else:
        mesh = make_mesh_2d(2)  # data=4, model=2
        cfg = CFG.replace(zero1=True, mesh_model=2)
    dims = dims_from_config(cfg)
    spect, nf, tg, tl = _batch(16)
    rng = jax.random.PRNGKey(5)

    # baseline: unsharded step (zero1 off)
    params, state = _init()
    opt = init_adam_state(params)
    step0 = make_train_step(CFG.replace(mesh_model=cfg.mesh_model),
                            dims, from_pcm=False)
    p1, o1, s1, m1, hyp1, _ = step0(params, opt, state, rng, spect, nf,
                                    tg, tl, spect_T=64)

    # ZeRO-1: moments sharded over 'data'
    zero.install(mesh)
    try:
        params_b, state_b = _init()
        params2 = shard_params(mesh, params_b)
        opt2 = zero.shard_opt_state(mesh, init_adam_state(params_b),
                                    params_b)
        assert _moment_sharded_leaves(opt2) > 0
        put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
        step = make_train_step(cfg, dims, from_pcm=False)
        p2, o2, s2, m2, hyp2, _ = step(params2, opt2, state_b, rng,
                                       put(spect), put(nf), put(tg),
                                       put(tl), spect_T=64)
    finally:
        zero.install(None)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hyp2))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(o1["mu"]),
                    jax.tree_util.tree_leaves(o2["mu"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)
    # the updated moments keep their ZeRO layout (donation round-trips)
    assert _moment_sharded_leaves(o2) == _moment_sharded_leaves(opt2)


def test_zero1_multi_step_stays_sharded():
    """Two consecutive steps: the constrained outputs feed back in as
    inputs with the same layout (no re-replication between steps)."""
    mesh = make_mesh(0)
    cfg = CFG.replace(zero1=True)
    dims = dims_from_config(cfg)
    spect, nf, tg, tl = _batch(16)

    zero.install(mesh)
    try:
        params, state = _init()
        params = shard_params(mesh, params)
        opt = zero.shard_opt_state(mesh, init_adam_state(params), params)
        n0 = _moment_sharded_leaves(opt)
        put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
        step = make_train_step(cfg, dims, from_pcm=False)
        for i in range(2):
            params, opt, state, m, _, _ = step(
                params, opt, state, jax.random.PRNGKey(i), put(spect),
                put(nf), put(tg), put(tl), spect_T=64)
            assert np.isfinite(float(m["loss"]))
            assert _moment_sharded_leaves(opt) == n0
    finally:
        zero.install(None)


def test_trainer_place_model_uses_zero_layout():
    from end2end_asr_tpu.training.trainer import Trainer

    mesh = make_mesh(0)
    zero.install(mesh)
    try:
        id2label = {0: "¶", 1: "§", 2: "¤"}
        label2id = {v: k for k, v in id2label.items()}
        tr = Trainer(CFG.replace(zero1=True), label2id, id2label,
                     mesh=mesh)
        params, state = _init()
        opt = init_adam_state(params)
        p, o, s = tr._place_model(params, opt, state)
        assert _moment_sharded_leaves(o) > 0
        # params stay replicated on a pure data mesh
        for leaf in jax.tree_util.tree_leaves(p):
            assert all(x is None for x in leaf.sharding.spec)
    finally:
        zero.install(None)


# ---------------------------------------------------------------------------
# ZeRO-3 / FSDP (stage 3): params shard over 'data' too
# ---------------------------------------------------------------------------

def test_fsdp_pspecs_shard_params_but_not_frontend():
    from jax.sharding import PartitionSpec as P
    cfg_vgg = CFG.replace(feat_extractor="vgg_cnn", dim_input=161,
                          src_max_len=256)
    params, _ = jax.jit(functools.partial(
        init_transformer, cfg=cfg_vgg, num_vocab=V))(jax.random.PRNGKey(0))
    mesh = make_mesh(0)
    specs = zero.fsdp_pspecs(params, mesh)
    # encoder/decoder weights shard over 'data'
    assert "data" in tuple(specs["encoder"]["layers"][0]["ffn"]["w1"]["w"])
    # the Pallas-consumed conv frontend stays replicated
    for s in jax.tree_util.tree_leaves(
            specs["frontend"], is_leaf=lambda x: isinstance(x, P)):
        assert "data" not in tuple(s)


def _param_sharded_leaves(params):
    n = 0
    for leaf in jax.tree_util.tree_leaves(params):
        sh = leaf.sharding
        if isinstance(sh, NamedSharding) and "data" in \
                jax.tree_util.tree_leaves(tuple(sh.spec)):
            n += 1
    return n


def test_fsdp_train_step_matches_unsharded():
    mesh = make_mesh(0)
    cfg = CFG.replace(fsdp=True)
    dims = dims_from_config(cfg)
    spect, nf, tg, tl = _batch(16)
    rng = jax.random.PRNGKey(5)

    params, state = _init()
    opt = init_adam_state(params)
    step0 = make_train_step(CFG, dims, from_pcm=False)
    p1, o1, s1, m1, hyp1, _ = step0(params, opt, state, rng, spect, nf,
                                    tg, tl, spect_T=64)

    zero.install(mesh, stage=3)
    try:
        params_b, state_b = _init()
        params2 = zero.shard_params_fsdp(mesh, params_b)
        n_sharded = _param_sharded_leaves(params2)
        assert n_sharded > 0
        opt2 = zero.shard_opt_state(mesh, init_adam_state(params_b),
                                    params_b)
        put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
        step = make_train_step(cfg, dims, from_pcm=False)
        p2, o2, s2, m2, hyp2, _ = step(params2, opt2, state_b, rng,
                                       put(spect), put(nf), put(tg),
                                       put(tl), spect_T=64)
    finally:
        zero.install(None)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hyp2))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)
    # updated params keep the FSDP layout (donation round-trips)
    assert _param_sharded_leaves(p2) == n_sharded
