"""Full-model TRAIN-STEP parity vs the ACTUAL reference implementation.

ref_train_dump.py runs the reference's real per-batch pipeline
(trainer/asr/trainer.py:58-111: forward → calculate_metrics →
backward → clip_grad_norm_ → NoamOpt(Adam).step) for 3 steps from a
fixed init and dumps the state_dict after every step, the pre-clip
gradients of every step, and the losses/rates.

The JAX side pins, in a chaos-free decomposition:

  1. loss value AND full-model gradients at all three of the
     reference's visited parameter points (forward+backward parity at
     points produced by real training, not just init);
  2. the optimizer chain — the reference's own per-step gradients
     replayed through our clip_by_global_norm + Noam(model_size=
     dim_input quirk) + torch-semantics Adam must land on the
     reference's exact post-step weights, three steps deep (pins
     moment accumulation and bias correction);
  3. BN running-stat updates (emb_cnn) against the reference's
     post-step buffers;
  4. the assembled jitted train step's loss/LR metrics.

End-to-end weight trajectories are NOT compared directly: with
eps=1e-9, Adam's first update is lr·sign(g), so elements with |g| near
fp noise diverge chaotically — the reference run on a different BLAS
would fail that comparison against itself. The decomposition above is
equality-of-functions at observed points, which composes to trajectory
parity wherever trajectories are numerically well-posed.

This is the construction-level training-parity proof — the strongest
offline proxy for the README CER table (reference README.md:22-28)
available without the corpus.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models.transformer import dims_from_config, forward
from end2end_asr_tpu.training.loss import calculate_loss
from end2end_asr_tpu.training.optimizer import (adam_noam_update,
                                                init_adam_state)
from end2end_asr_tpu.training.steps import (make_train_step,
                                            noam_config_from)
from tools.convert_reference_checkpoint import convert_state_dict

REF = "/root/reference"
TGT_MAX = 16
N_STEPS = 3


class _T:  # minimal tensor shim for convert_state_dict's _np()
    def __init__(self, a):
        self.a = a

    def detach(self):
        return self

    def cpu(self):
        return self

    def numpy(self):
        return self.a


def _dump(tmp_path, feat, loss_type):
    out = os.path.join(str(tmp_path),
                       f"reftrain_{feat or 'none'}_{loss_type}.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "ref_train_dump.py"),
         out, feat, loss_type],
        capture_output=True, text=True, env=env, timeout=600)
    if r.returncode != 0:
        pytest.skip(f"reference model not importable: {r.stderr[-500:]}")
    return out


def _convert_sd(sd, feat):
    return convert_state_dict(
        {k: _T(v) for k, v in sd.items()}, num_layers=2,
        feat_extractor=feat, emb_trg_sharing=False, dim_model=32,
        src_max_len=64, tgt_max_len=TGT_MAX)


def _convert(data, prefix, feat):
    sd = {k[len(prefix):]: data[k] for k in data.files
          if k.startswith(prefix)}
    return _convert_sd(sd, feat)


def _convert_grads(data, step, feat):
    """Grads keyed by torch param names; conversion is the same linear
    re-layout as the weights. Buffers (BN running stats, PE) have no
    grads — fill from the init shapes with zeros so the converter sees a
    complete state_dict, then zero the converter-regenerated PE tables
    (the real train step's PE grad is exactly zero via stop_gradient)."""
    sd = {}
    for k in data.files:
        if k.startswith("sd0."):
            name = k[4:]
            g = data.get(f"g{step}." + name)
            sd[name] = (np.zeros_like(data[k]) if g is None
                        else np.asarray(g, np.float32))
    grads, _ = _convert_sd(sd, feat)
    grads["encoder"]["pe"] = np.zeros_like(grads["encoder"]["pe"])
    grads["decoder"]["pe"] = np.zeros_like(grads["decoder"]["pe"])
    return grads


def _assert_tree_close(ours, ref, rtol, atol, skip_pe=False, msg=""):
    flat_o = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_r = jax.tree_util.tree_leaves(ref)
    assert len(flat_o) == len(flat_r)
    for (path, o), r in zip(flat_o, flat_r):
        name = msg + jax.tree_util.keystr(path)
        if skip_pe and "'pe'" in name:
            continue  # fixed buffer: converter regenerates it, not trained
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            rtol=rtol, atol=atol, err_msg=name)


@pytest.mark.parametrize("feat", ["", "vgg_cnn", "emb_cnn"])
@pytest.mark.parametrize("loss_type", ["ce", "ctc"])
def test_train_step_matches_reference(tmp_path, feat, loss_type):
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    data = np.load(_dump(tmp_path, feat, loss_type))

    points = [_convert(data, f"sd{i}.", feat) for i in range(N_STEPS + 1)]
    points = [(jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32),
                                      p), s) for p, s in points]

    cfg = Config(num_layers=2, num_heads=2, dim_model=32, dim_key=16,
                 dim_value=16, dim_inner=64, dim_emb=32,
                 feat_extractor=feat, dropout=0.0, dtype="float32",
                 src_max_len=64, tgt_max_len=TGT_MAX,
                 label_smoothing=0.1, loss=loss_type,
                 clip=True, max_norm=1.0,
                 warmup=1, k_lr=1.0, min_lr=1e-9)
    dims = dims_from_config(cfg)

    spect = data["spect"][:, 0]                      # (B, F, T)
    n_frames = data["lengths"].astype(np.int32)
    T = spect.shape[-1]
    # pad targets to TGT_MAX-1 so seq widths (U+1 = 16) equal the
    # reference's pad_list(tgt_max_len) width — required for the CTC
    # input_lengths recipe (sizes = src_percentages * pred_width,
    # trainer.py:81-82) to be value-identical.
    tgt = np.zeros((2, TGT_MAX - 1), np.int32)
    tgt[:, :data["targets"].shape[1]] = data["targets"]
    tgt_lengths = data["tgt_lengths"].astype(np.int32)

    # --- 1. loss + full-model gradients at every visited point ---
    def loss_fn(p, model_state):
        pred, gold, new_state = forward(
            p, model_state, jnp.asarray(spect), jnp.asarray(n_frames),
            jnp.asarray(tgt), dims, train=True,
            rng=jax.random.PRNGKey(0))
        U_out = pred.shape[1]
        in_lens = (jnp.asarray(n_frames, jnp.float32) / T
                   * U_out).astype(jnp.int32)
        loss = calculate_loss(pred, gold, in_lens,
                              jnp.asarray(tgt_lengths), 0.1, loss_type)
        return loss, new_state

    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    for i in range(N_STEPS):
        (loss_i, new_state_i), grads_i = vg(*points[i])
        np.testing.assert_allclose(float(loss_i), data["losses"][i],
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"loss at step {i}")
        _assert_tree_close(grads_i, _convert_grads(data, i, feat),
                           rtol=2e-3, atol=2e-5, skip_pe=True,
                           msg=f"grad step {i} ")
        # PE is a fixed buffer in the reference — its grad must be
        # exactly zero (stop_gradient), or Adam would train it.
        assert not np.asarray(grads_i["encoder"]["pe"]).any()
        assert not np.asarray(grads_i["decoder"]["pe"]).any()
        if points[i][1]:  # 3. BN running stats advance like torch's
            _assert_tree_close(new_state_i, points[i + 1][1],
                               rtol=1e-4, atol=1e-5,
                               msg=f"BN state after step {i} ")

    # --- 2. optimizer chain on the reference's own gradients ---
    noam = noam_config_from(cfg)
    p = points[0][0]
    opt_state = init_adam_state(p)
    chain = jax.jit(lambda p, s, g: adam_noam_update(
        p, g, s, noam, clip=True, max_norm=1.0))
    for i in range(N_STEPS):
        p, opt_state, lr = chain(p, opt_state,
                                 _convert_grads(data, i, feat))
        np.testing.assert_allclose(float(lr), data["rates"][i], rtol=1e-6,
                                   err_msg=f"noam rate at step {i}")
        _assert_tree_close(p, points[i + 1][0], rtol=1e-4, atol=2e-5,
                           skip_pe=True, msg=f"params after step {i} ")
        p = points[i + 1][0]  # resync: isolate per-step update parity

    # --- 4. the assembled jitted train step wires it all together ---
    step_fn = make_train_step(cfg, dims, from_pcm=False)
    params, model_state = points[0]
    params, opt_state, model_state, metrics, _, _ = step_fn(
        params, init_adam_state(params), model_state,
        jax.random.PRNGKey(0), spect, n_frames, tgt, tgt_lengths,
        spect_T=T)
    assert bool(metrics["finite"])
    np.testing.assert_allclose(float(metrics["loss"]), data["losses"][0],
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(float(metrics["lr"]), data["rates"][0],
                               rtol=1e-6)
    # weight compare masked to elements with |ref grad| > 1e-4: there the
    # Adam update ≈ lr·sign(g) is insensitive to fp-level grad noise; the
    # near-zero-grad elements are pinned by the identical-grad chain above.
    g0 = _convert_grads(data, 0, feat)
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_r = jax.tree_util.tree_leaves(points[1][0])
    flat_g = jax.tree_util.tree_leaves(g0)
    checked = 0
    for (path, o), r, g in zip(flat_p, flat_r, flat_g):
        name = jax.tree_util.keystr(path)
        if "'pe'" in name:
            continue
        m = np.abs(np.asarray(g)) > 1e-4
        checked += int(m.sum())
        np.testing.assert_allclose(
            np.asarray(o, np.float32)[m], np.asarray(r, np.float32)[m],
            rtol=1e-4, atol=1e-5, err_msg="full-step params " + name)
    assert checked > 100  # the mask must actually cover real weights
