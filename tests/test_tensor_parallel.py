"""Tensor parallelism (parallel/tp.py) on the virtual 8-device CPU mesh.

A ('data','model') 2-D mesh shards attention/FFN weights Megatron-style
(column-parallel q/k/v/w1, row-parallel out/w2) with XLA GSPMD inserting
the per-layer all-reduces. Beyond the reference's capability (its only
parallelism is nn.DataParallel, train.py:97-99) — verified here against
single-device numerics for the train step, eval, and greedy decode.
"""

import functools

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                init_transformer)
from end2end_asr_tpu.parallel.mesh import batch_sharded
from end2end_asr_tpu.parallel.tp import (check_tp_divisibility,
                                         make_mesh_2d, mesh_model_size,
                                         param_pspecs, shard_opt_state,
                                         shard_params)
from end2end_asr_tpu.training.optimizer import init_adam_state
from end2end_asr_tpu.training.steps import (make_encode_fn, make_eval_step,
                                            make_train_step)

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


def _init(seed=0):
    return jax.jit(functools.partial(init_transformer, cfg=CFG,
                                     num_vocab=V))(jax.random.PRNGKey(seed))


def test_mesh_2d_shape_and_validation():
    mesh = make_mesh_2d(2)  # 4x2 from the 8 virtual devices
    assert mesh.shape == {"data": 4, "model": 2}
    assert mesh_model_size(mesh) == 2
    mesh = make_mesh_2d(4, n_data=2)
    assert mesh.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh_2d(16)
    with pytest.raises(ValueError):
        make_mesh_2d(4, n_data=4)  # 16 > 8 devices


def test_tp_divisibility_check():
    check_tp_divisibility(CFG, 2)
    check_tp_divisibility(CFG, 4)  # 4 heads, inner 128
    with pytest.raises(ValueError):
        check_tp_divisibility(CFG, 3)  # 4 % 3 != 0
    with pytest.raises(ValueError):
        check_tp_divisibility(CFG.replace(dim_inner=130), 4)  # 130 % 4


def test_param_pspecs_rules():
    params, _ = _init()
    specs = param_pspecs(params, 2)
    enc0 = specs["encoder"]["layers"][0]
    assert enc0["self_attn"]["q"]["w"] == P(None, "model")
    assert enc0["self_attn"]["q"]["b"] == P("model")
    assert enc0["self_attn"]["out"]["w"] == P("model", None)
    assert enc0["self_attn"]["out"]["b"] == P()
    assert enc0["ffn"]["w1"]["w"] == P(None, "model")
    assert enc0["ffn"]["w1"]["b"] == P("model")
    assert enc0["ffn"]["w2"]["w"] == P("model", None)
    assert enc0["ffn"]["w2"]["b"] == P()
    assert enc0["self_attn"]["ln"]["scale"] == P()
    assert specs["decoder"]["embedding"] == P()
    assert specs["decoder"]["output_linear"]["w"] == P()
    # n_model=1 -> everything replicated
    for s in jax.tree_util.tree_leaves(
            param_pspecs(params, 1), is_leaf=lambda x: isinstance(x, P)):
        assert s == P()


def test_indivisible_leaf_falls_back_to_replication():
    params, _ = _init()
    # heads*dim_key = 64; n_model=48 divides nothing cleanly
    specs = param_pspecs(params, 48)
    enc0 = specs["encoder"]["layers"][0]
    assert enc0["self_attn"]["q"]["w"] == P()
    assert enc0["ffn"]["w1"]["w"] == P()


def _sharded_leaf_count(tree, mesh):
    n = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        sh = leaf.sharding
        if isinstance(sh, NamedSharding) and any(
                s is not None for s in sh.spec):
            n += 1
    return n


@pytest.mark.parametrize("n_model,n_data", [(2, 4), (4, 2)])
def test_tp_train_step_matches_single_device(n_model, n_data):
    mesh = make_mesh_2d(n_model, n_data=n_data)
    step = make_train_step(CFG, dims_from_config(CFG), from_pcm=False)
    spect, nf, tg, tl = _batch(16)
    rng = jax.random.PRNGKey(5)

    # two independent identical inits: the step DONATES param/opt buffers
    params, state = _init()
    opt = init_adam_state(params)
    p1, o1, s1, m1, hyp1, gold1 = step(params, opt, state, rng, spect,
                                       nf, tg, tl, spect_T=64)

    params_b, state_b = _init()
    params2 = shard_params(mesh, params_b)
    assert _sharded_leaf_count(params2, mesh) > 0
    opt2 = shard_opt_state(mesh, init_adam_state(params_b), params_b)
    # moments inherit their param's sharding
    q_w = params2["encoder"]["layers"][0]["self_attn"]["q"]["w"]
    q_mu = opt2["mu"]["encoder"]["layers"][0]["self_attn"]["q"]["w"]
    assert q_w.sharding == q_mu.sharding
    put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
    p2, o2, s2, m2, hyp2, gold2 = step(params2, opt2, state_b, rng,
                                       put(spect), put(nf), put(tg),
                                       put(tl), spect_T=64)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hyp2))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        # cross-device reduction changes float accumulation order
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-5)
    # updated params keep their TP sharding (donation round-trips)
    assert _sharded_leaf_count(p2, mesh) == _sharded_leaf_count(
        params2, mesh)


def test_tp_eval_and_greedy_decode_match_single_device():
    from end2end_asr_tpu.decoding.greedy import greedy_decode

    mesh = make_mesh_2d(2, n_data=4)
    params, state = _init(seed=1)
    dims = dims_from_config(CFG)
    spect, nf, tg, tl = _batch(16)

    eval_step = make_eval_step(CFG, dims, from_pcm=False)
    loss1, hyp1, _ = eval_step(params, state, spect, nf, tg, tl,
                               spect_T=64)
    encode_fn = make_encode_fn(CFG, dims, from_pcm=False)
    enc1, _ = encode_fn(params, state, spect, nf, spect_T=64)
    ids1 = greedy_decode(params, enc1, dims, max_len=6)

    params2 = shard_params(mesh, params)
    put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
    loss2, hyp2, _ = eval_step(params2, state, put(spect), put(nf),
                               put(tg), put(tl), spect_T=64)
    enc2, _ = encode_fn(params2, state, put(spect), put(nf), spect_T=64)
    ids2 = greedy_decode(params2, enc2, dims, max_len=6)

    assert abs(float(loss1) - float(loss2)) < 1e-5
    np.testing.assert_array_equal(np.asarray(hyp1), np.asarray(hyp2))
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))


def test_trainer_place_model_uses_tp_shardings():
    from end2end_asr_tpu.training.trainer import Trainer

    mesh = make_mesh_2d(2, n_data=4)
    id2label = {0: "¶", 1: "§", 2: "¤"}
    label2id = {v: k for k, v in id2label.items()}
    tr = Trainer(CFG, label2id, id2label, mesh=mesh)
    params, state = _init()
    opt = init_adam_state(params)
    p, o, s = tr._place_model(params, opt, state)
    assert _sharded_leaf_count(p, mesh) > 0
    assert _sharded_leaf_count(o["mu"], mesh) > 0
    assert _sharded_leaf_count(s, mesh) == 0  # BN stats replicate


def test_checkpoint_roundtrip_under_tp(tmp_path):
    """TP-sharded params/Adam moments save through the npz path (the
    single-process np.asarray gather) and reload bit-equal — the
    preemption/recovery story must survive --mesh-model (the shardings
    are a placement property, not a value property)."""
    from end2end_asr_tpu.training.checkpoint import (load_checkpoint,
                                                     save_checkpoint)

    mesh = make_mesh_2d(2)  # 4x2
    dims = dims_from_config(CFG)
    params, state = _init()
    opt = shard_opt_state(mesh, init_adam_state(params), params)
    params = shard_params(mesh, params)
    spect, nf, tg, tl = _batch(4)
    put = lambda a: jax.device_put(a, batch_sharded(mesh, np.ndim(a)))
    step = make_train_step(CFG, dims, from_pcm=False)
    params, opt, state, m, _, _ = step(
        params, opt, state, jax.random.PRNGKey(1), put(spect), put(nf),
        put(tg), put(tl), spect_T=64)
    assert np.isfinite(float(m["loss"]))

    base = str(tmp_path / "ck")
    save_checkpoint(base, CFG, 1, params, opt, state,
                    {"a": 3}, {3: "a"})
    _, epoch, p2, o2, s2, _, _, _ = load_checkpoint(base)
    assert epoch == 1
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), b)
    for a, b in zip(jax.tree_util.tree_leaves(opt),
                    jax.tree_util.tree_leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_evaluate_tp_matches_single_device(tmp_path):
    """End-to-end evaluate() (test.py path) under a data x model mesh:
    TP-sharded weights must reproduce the single-device CER/WER exactly
    (test.py --parallel --mesh-model N)."""
    from end2end_asr_tpu.config import load_vocab
    from end2end_asr_tpu.data.dataset import ManifestDataset
    from end2end_asr_tpu.data.loader import AudioBatchLoader
    from end2end_asr_tpu.evaluation import evaluate
    from tests.synth import make_corpus

    texts = ["ab", "ba", "abba", "baab", "aabb", "bbaa", "abab", "baba"]
    manifest, labels = make_corpus(str(tmp_path / "c"), texts=texts,
                                   exact_samples=63 * 160)
    cfg = CFG.replace(batch_size=8, tgt_max_len=8)
    label2id, id2label = load_vocab(labels)

    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=len(label2id)))(
            jax.random.PRNGKey(0))

    def loader():
        return AudioBatchLoader(ManifestDataset([manifest], label2id),
                                cfg)

    r_single = evaluate(params, state, cfg, loader(), id2label)
    r_tp = evaluate(params, state, cfg, loader(), id2label,
                    mesh=make_mesh_2d(2))
    assert r_single == r_tp
