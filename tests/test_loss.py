"""Loss oracles: our CE/label-smoothing and CTC vs torch (CPU).

The reference computes these with torch.nn.functional
(utils/metrics.py:102-168); torch here is only an *oracle*, never a
runtime dependency.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from end2end_asr_tpu.config import PAD_TOKEN
from end2end_asr_tpu.training.loss import (calculate_metrics,
                                           cross_entropy_loss)
from end2end_asr_tpu.ops.ctc import ctc_loss

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


def _rand_ce_case(B=4, U=12, C=30, seed=0):
    rng = np.random.RandomState(seed)
    pred = rng.randn(B, U, C).astype(np.float32)
    gold = rng.randint(1, C, size=(B, U)).astype(np.int64)
    lengths = rng.randint(3, U + 1, size=(B,))
    for b in range(B):
        gold[b, lengths[b]:] = PAD_TOKEN
    return pred, gold


def _torch_smoothed_ce(pred, gold, eps):
    """Reference label smoothing, metrics.py:115-130, verbatim in torch."""
    pred = torch.tensor(pred).view(-1, pred.shape[-1])
    gold = torch.tensor(gold).view(-1)
    gold_for_scatter = gold.ne(PAD_TOKEN).long() * gold
    one_hot = torch.zeros_like(pred).scatter(1, gold_for_scatter.view(-1, 1), 1)
    one_hot = one_hot * (1 - eps) + (1 - one_hot) * eps / pred.size(1)
    log_prob = TF.log_softmax(pred, dim=1)
    non_pad_mask = gold.ne(PAD_TOKEN)
    num_word = non_pad_mask.sum().item()
    loss = -(one_hot * log_prob).sum(dim=1)
    return (loss.masked_select(non_pad_mask).sum() / num_word).item()


def test_ce_no_smoothing_matches_torch():
    pred, gold = _rand_ce_case()
    ours = float(cross_entropy_loss(jnp.asarray(pred), jnp.asarray(gold), 0.0))
    ref = TF.cross_entropy(torch.tensor(pred).view(-1, pred.shape[-1]),
                           torch.tensor(gold).view(-1),
                           ignore_index=PAD_TOKEN, reduction="mean").item()
    assert abs(ours - ref) < 1e-5


@pytest.mark.parametrize("eps", [0.1, 0.3])
def test_ce_label_smoothing_matches_reference_formula(eps):
    pred, gold = _rand_ce_case(seed=1)
    ours = float(cross_entropy_loss(jnp.asarray(pred), jnp.asarray(gold), eps))
    ref = _torch_smoothed_ce(pred, gold, eps)
    assert abs(ours - ref) < 1e-5


def test_token_accuracy_matches_torch():
    pred, gold = _rand_ce_case(seed=2)
    _, num_correct = calculate_metrics(jnp.asarray(pred), jnp.asarray(gold))
    tp = torch.tensor(pred).view(-1, pred.shape[-1])
    tg = torch.tensor(gold).view(-1)
    hyp = tp.max(1)[1]
    ref = hyp.eq(tg).masked_select(tg.ne(PAD_TOKEN)).sum().item()
    assert int(num_correct) == ref


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_matches_torch(seed):
    rng = np.random.RandomState(seed)
    B, T, C, U = 3, 25, 12, 7
    logits = rng.randn(B, T, C).astype(np.float32)
    log_probs = np.asarray(
        TF.log_softmax(torch.tensor(logits), dim=-1).numpy())
    targets = rng.randint(1, C, size=(B, U)).astype(np.int64)
    in_lens = np.array([25, 20, 16])
    tgt_lens = np.array([7, 5, 3])

    ref = TF.ctc_loss(torch.tensor(log_probs).transpose(0, 1),
                      torch.tensor(targets), torch.tensor(in_lens),
                      torch.tensor(tgt_lens), blank=0,
                      reduction="mean").item()
    ours = float(ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                          jnp.asarray(in_lens), jnp.asarray(tgt_lens),
                          blank=0, reduction="mean"))
    assert abs(ours - ref) < 1e-4


def test_ctc_train_step_runs():
    """--loss ctc end-to-end: gradients flow through the scan-based CTC
    (the reference wires CTC through the same decoder outputs,
    trainer.py:81-85)."""
    import functools
    import jax

    from end2end_asr_tpu.config import Config
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    from end2end_asr_tpu.training.optimizer import init_adam_state
    from end2end_asr_tpu.training.steps import make_train_step

    cfg = Config(num_layers=1, num_heads=2, dim_model=32, dim_key=16,
                 dim_value=16, dim_inner=64, dim_emb=32, feat_extractor="",
                 dim_input=161, dtype="float32", loss="ctc")
    params, state = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=16))(jax.random.PRNGKey(0))
    opt = init_adam_state(params)
    step = make_train_step(cfg, dims_from_config(cfg), from_pcm=False)
    spect = np.random.RandomState(0).randn(2, 161, 64).astype(np.float32)
    tg = np.array([[1, 5, 6, 7, 2, 0, 0, 0]] * 2, np.int32)
    p2, o2, s2, m, _, _ = step(params, opt, state, jax.random.PRNGKey(1),
                               spect, np.array([64, 64], np.int32), tg,
                               np.array([5, 5], np.int32), spect_T=64)
    assert np.isfinite(float(m["loss"]))
    # params actually changed
    a = jax.tree_util.tree_leaves(p2)[0]
    assert np.isfinite(np.asarray(a)).all()


def test_ctc_repeated_labels():
    # repeated labels exercise the no-skip rule (z_s == z_{s-2})
    rng = np.random.RandomState(7)
    B, T, C = 2, 30, 8
    logits = rng.randn(B, T, C).astype(np.float32)
    log_probs = np.asarray(
        TF.log_softmax(torch.tensor(logits), dim=-1).numpy())
    targets = np.array([[3, 3, 3, 4, 4], [1, 2, 1, 2, 1]], dtype=np.int64)
    in_lens = np.array([30, 28])
    tgt_lens = np.array([5, 5])
    ref = TF.ctc_loss(torch.tensor(log_probs).transpose(0, 1),
                      torch.tensor(targets), torch.tensor(in_lens),
                      torch.tensor(tgt_lens), blank=0,
                      reduction="mean").item()
    ours = float(ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                          jnp.asarray(in_lens), jnp.asarray(tgt_lens)))
    assert abs(ours - ref) < 1e-4


def test_ctc_infeasible_rows_match_torch_inf():
    """The reference computes CTC input_lengths as src_percentage *
    decoder_width (trainer/asr/trainer.py:81-82): a short utterance in a
    tall bucket can get input_length < target_length, which torch
    F.ctc_loss (no zero_infinity) scores as +inf and the reference then
    SKIPS the whole batch ("Found infinity loss, masking" + continue).
    Our ctc_loss must go non-finite-sized the same way so the trainer's
    Inf-skip engages — this is the mechanism behind 'exploding' losses
    when mixed-length batches hit --loss ctc, reproduced from the
    reference, not a bug."""
    import jax
    import torch
    import torch.nn.functional as TF

    rng = np.random.RandomState(3)
    B, T, C, U = 3, 9, 12, 5
    logits = rng.randn(B, T, C).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    targets = rng.randint(3, C, size=(B, U)).astype(np.int32)
    tgt_lengths = np.array([5, 5, 5], np.int32)
    in_lens = np.array([9, 4, 9], np.int32)   # row 1 infeasible (4 < 5)

    ours = np.asarray(ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                               jnp.asarray(in_lens),
                               jnp.asarray(tgt_lengths), reduction="none"))
    ref = TF.ctc_loss(torch.tensor(log_probs).transpose(0, 1),
                      torch.tensor(targets.astype(np.int64)),
                      torch.tensor(in_lens.astype(np.int64)),
                      torch.tensor(tgt_lengths.astype(np.int64)),
                      reduction="none").numpy()
    # feasible rows agree exactly; the infeasible row is +inf in BOTH
    # (the sentinel is promoted to a literal inf so the trainer's
    # isfinite batch-skip engages exactly like the reference's)
    np.testing.assert_allclose(ours[[0, 2]], ref[[0, 2]], rtol=1e-5)
    assert np.isinf(ref[1]) and np.isinf(ours[1])
