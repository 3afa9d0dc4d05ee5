"""--steps-per-dispatch K (training/steps.py make_multi_train_step):
K optimizer steps scanned inside ONE dispatched program must be
numerically identical to K separate dispatches — same traced step body,
same RNG stream. Beyond the reference's capability; the value on this
image is host-side (1 dispatch + 1 metrics pull per K batches through
the tunnel).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.config import Config, load_vocab
from end2end_asr_tpu.data.dataset import ManifestDataset
from end2end_asr_tpu.data.loader import AudioBatchLoader
from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                init_transformer)
from end2end_asr_tpu.training.optimizer import init_adam_state
from end2end_asr_tpu.training.steps import (make_multi_train_step,
                                            make_train_step)
from end2end_asr_tpu.training.trainer import Trainer
from tests.synth import make_corpus

CFG = Config(num_layers=2, num_heads=4, dim_model=64, dim_key=16,
             dim_value=16, dim_inner=128, dim_emb=64, feat_extractor="",
             dim_input=161, dtype="float32", dropout=0.0,
             src_max_len=64, tgt_max_len=16, src_buckets=(64,),
             tgt_buckets=(8,))
V = 24
K = 3


def _batches(n, B=4, seed=0):
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        spect = rs.randn(B, 161, 64).astype(np.float32)
        nf = np.full(B, 64, np.int32)
        tg = np.zeros((B, 8), np.int32)
        tg[:, 0] = 1
        for b in range(B):
            m = 2 + rs.randint(0, 4)
            tg[b, 1:1 + m] = rs.randint(3, V, size=m)
            tg[b, 1 + m] = 2
        tl = (tg != 0).sum(1).astype(np.int32)
        out.append((spect, nf, tg, tl))
    return out


def _init(cfg):
    return jax.jit(functools.partial(init_transformer, cfg=cfg,
                                     num_vocab=V))(jax.random.PRNGKey(0))


def test_multi_step_matches_sequential():
    dims = dims_from_config(CFG)
    batches = _batches(K)
    rngs = [jax.random.PRNGKey(100 + i) for i in range(K)]

    params, state = _init(CFG)
    step = make_train_step(CFG, dims, from_pcm=False)
    o = init_adam_state(params)
    p, s = params, state
    seq_metrics = []
    for (sp, nf, tg, tl), r in zip(batches, rngs):
        p, o, s, m, hyp, gold = step(p, o, s, r, sp, nf, tg, tl,
                                     spect_T=64)
        seq_metrics.append(m)

    params2, state2 = _init(CFG)
    multi = make_multi_train_step(CFG, dims, from_pcm=False)
    stack = lambda c: jnp.stack([b[c] for b in batches])
    pK, oK, sK, ms, hyps, golds = multi(
        params2, init_adam_state(params2), state2, jnp.stack(rngs),
        stack(0), stack(1), stack(2), stack(3), spect_T=64)

    for j, m in enumerate(seq_metrics):
        np.testing.assert_allclose(float(m["loss"]),
                                   float(ms["loss"][j]), rtol=1e-6)
        assert int(m["num_token"]) == int(ms["num_token"][j])
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(pK)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(o),
                    jax.tree_util.tree_leaves(oK)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_trainer_steps_per_dispatch_exact(tmp_path):
    """TWO full trainer epochs with --steps-per-dispatch 3 (4 batches →
    one group of 3 + one partial single per epoch) match the K=1 run.
    Two epochs matter: the multi-step program and its from_pcm flag must
    persist across epochs (a round-3 review caught both being rebuilt —
    and the flag silently reset — per epoch)."""
    texts = ["ab", "ba", "abba", "baab", "aabb", "bbaa", "abab", "baba"]
    manifest, labels = make_corpus(str(tmp_path / "c"), texts=texts,
                                   exact_samples=63 * 160)
    base = Config(
        feat_extractor="", num_layers=1, num_heads=2, dim_model=32,
        dim_key=16, dim_value=16, dim_inner=64, dim_emb=32, batch_size=2,
        dropout=0.1, src_max_len=64, tgt_max_len=8, src_buckets=(64,),
        tgt_buckets=(8,), dtype="float32", epochs=2, save_every=100,
        save_folder=str(tmp_path), name="md")
    label2id, id2label = load_vocab(labels)

    results = []
    for k in (1, 3):
        cfg = base.replace(steps_per_dispatch=k)
        ds = ManifestDataset([manifest], label2id)
        train_loader = AudioBatchLoader(ds, cfg)
        valid_loader = AudioBatchLoader(ds, cfg)
        params, state = jax.jit(functools.partial(
            init_transformer, cfg=cfg, num_vocab=len(label2id)))(
                jax.random.PRNGKey(0))
        trainer = Trainer(cfg, label2id, id2label)
        results.append(trainer.train(
            params, init_adam_state(params), state, train_loader,
            [valid_loader], start_epoch=0, num_epochs=2, prefetch=True))

    (p1, _, _, m1), (pK, _, _, mK) = results
    np.testing.assert_allclose(m1["train_loss"], mK["train_loss"],
                               rtol=1e-6)
    assert m1["train_cer"] == mK["train_cer"]
    np.testing.assert_allclose(m1["valid_loss"], mK["valid_loss"],
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pK)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_trainer_dispatch_and_accum_under_mesh(tmp_path):
    """--steps-per-dispatch 2 + --grad-accum 2 compose with a data mesh
    (stacked batches keep their batch-axis sharding through the scan;
    microbatch reshape re-shards cleanly)."""
    from end2end_asr_tpu.parallel.mesh import make_mesh

    texts = ["ab", "ba", "abba", "baab", "aabb", "bbaa", "abab", "baba",
             "aaab", "bbba", "abaa", "babb", "aaba", "bbab", "abbb",
             "baaa"]
    manifest, labels = make_corpus(str(tmp_path / "c"), texts=texts,
                                   exact_samples=63 * 160)
    cfg = Config(
        feat_extractor="", num_layers=1, num_heads=2, dim_model=32,
        dim_key=16, dim_value=16, dim_inner=64, dim_emb=32, batch_size=4,
        dropout=0.0, src_max_len=64, tgt_max_len=8, src_buckets=(64,),
        tgt_buckets=(8,), dtype="float32", epochs=1, save_every=100,
        save_folder=str(tmp_path), name="mdm", steps_per_dispatch=2,
        grad_accum=2)
    label2id, id2label = load_vocab(labels)
    ds = ManifestDataset([manifest], label2id)
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=len(label2id)))(
            jax.random.PRNGKey(0))
    trainer = Trainer(cfg, label2id, id2label, mesh=make_mesh(2))
    _, _, _, m = trainer.train(
        params, init_adam_state(params), state,
        AudioBatchLoader(ds, cfg), [AudioBatchLoader(ds, cfg)],
        start_epoch=0, num_epochs=1, prefetch=True)
    assert np.isfinite(m["train_loss"])
    assert np.isfinite(m["valid_loss"])


def test_multi_step_inf_skip_inside_group():
    """A CTC-infeasible batch INSIDE a K-group must be skipped (params/
    opt untouched for that sub-step) exactly like the sequential path —
    the reference's 'Found infinity loss, masking' continue
    (trainer/asr/trainer.py:87-90) applied per scanned step."""
    cfg = CFG.replace(loss="ctc", label_smoothing=0.0)
    dims = dims_from_config(cfg)
    good = _batches(1, seed=1)[0]
    sp, nf, tg, tl = _batches(1, seed=2)[0]
    bad = (sp, np.full_like(nf, 4), tg, tl)  # in_len 0-1 < tgt len: inf
    rngs = [jax.random.PRNGKey(5), jax.random.PRNGKey(6)]

    params, state = _init(cfg)
    step = make_train_step(cfg, dims, from_pcm=False)
    p, o, s = params, init_adam_state(params), state
    fins = []
    for (a, b, c, d), r in zip((good, bad), rngs):
        p, o, s, m, _, _ = step(p, o, s, r, a, b, c, d, spect_T=64)
        fins.append(bool(m["finite"]))
    assert fins == [True, False]

    params2, state2 = _init(cfg)
    multi = make_multi_train_step(cfg, dims, from_pcm=False)
    stack = lambda c: jnp.stack([good[c], bad[c]])
    pK, oK, sK, ms, _, _ = multi(
        params2, init_adam_state(params2), state2, jnp.stack(rngs),
        stack(0), stack(1), stack(2), stack(3), spect_T=64)
    assert [bool(x) for x in np.asarray(ms["finite"])] == [True, False]
    assert int(np.asarray(oK["step"])) == int(np.asarray(o["step"])) == 1
    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(pK)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
