"""End-to-end converter contract: a reference-layout torch .th checkpoint
(full argparse namespace, DataParallel-wrapped state dict, Noam scalars)
converts via tools/convert_reference_checkpoint.convert_file and loads/
runs through the framework's own checkpoint loader."""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _ref_args():
    # the namespace the reference pickles into checkpoints (constant.py)
    ns = argparse.Namespace()
    d = dict(model="TRFS", name="ref", sample_rate=16000, batch_size=4,
             num_workers=0, labels_path="labels.json", label_smoothing=0.0,
             window_size=0.02, window_stride=0.01, window="hamming",
             epochs=10, cuda=False, device_ids=None, lr=1e-4, save_every=5,
             save_folder="save/", emb_trg_sharing=False, feat_extractor="",
             verbose=False, continue_from="", augment=False, noise_dir=None,
             noise_prob=0.4, noise_min=0.0, noise_max=0.5, num_layers=1,
             num_heads=2, dim_model=32, dim_key=16, dim_value=16,
             dim_input=161, dim_inner=64, dim_emb=32, src_max_len=64,
             tgt_max_len=16, warmup=4000, min_lr=1e-5, k_lr=1.0,
             momentum=0.9, lr_anneal=1.1, beam_search=False, beam_width=3,
             beam_nbest=5, lm_rescoring=False, lm_path="lm.pt",
             lm_weight=0.1, c_weight=0.1, prob_weight=1.0, loss="ce",
             clip=False, max_norm=400, dropout=0.0, parallel=True,
             shuffle=False)
    ns.__dict__.update(d)
    return ns


def _mha_sd(prefix, dm, dk, dv, nh):
    t = torch.randn
    return {
        f"{prefix}.query_linear.weight": t(nh * dk, dm),
        f"{prefix}.query_linear.bias": t(nh * dk),
        f"{prefix}.key_linear.weight": t(nh * dk, dm),
        f"{prefix}.key_linear.bias": t(nh * dk),
        f"{prefix}.value_linear.weight": t(nh * dv, dm),
        f"{prefix}.value_linear.bias": t(nh * dv),
        f"{prefix}.output_linear.weight": t(dm, nh * dv),
        f"{prefix}.output_linear.bias": t(dm),
        f"{prefix}.layer_norm.weight": torch.ones(dm),
        f"{prefix}.layer_norm.bias": torch.zeros(dm),
    }


def _ffn_sd(prefix, dm, di):
    t = torch.randn
    return {
        f"{prefix}.conv_1.weight": t(di, dm, 1),
        f"{prefix}.conv_1.bias": t(di),
        f"{prefix}.conv_2.weight": t(dm, di, 1),
        f"{prefix}.conv_2.bias": t(dm),
        f"{prefix}.layer_norm.weight": torch.ones(dm),
        f"{prefix}.layer_norm.bias": torch.zeros(dm),
    }


def _ref_sd(dm, dk, dv, nh, di, V, num_layers=1, prefix="module."):
    """Reference-layout (DataParallel-wrapped) state dict, no frontend."""
    sd = {}
    sd[prefix + "encoder.input_linear.weight"] = torch.randn(dm, 161)
    sd[prefix + "encoder.input_linear.bias"] = torch.randn(dm)
    sd[prefix + "encoder.layer_norm_input.weight"] = torch.ones(dm)
    sd[prefix + "encoder.layer_norm_input.bias"] = torch.zeros(dm)
    for n in range(num_layers):
        for k, v in {**_mha_sd(f"encoder.layers.{n}.self_attn", dm, dk, dv, nh),
                     **_ffn_sd(f"encoder.layers.{n}.pos_ffn", dm, di)}.items():
            sd[prefix + k] = v
    sd[prefix + "decoder.trg_embedding.weight"] = torch.randn(V, dm)
    for n in range(num_layers):
        for k, v in {**_mha_sd(f"decoder.layers.{n}.self_attn", dm, dk, dv, nh),
                     **_mha_sd(f"decoder.layers.{n}.encoder_attn", dm, dk, dv, nh),
                     **_ffn_sd(f"decoder.layers.{n}.pos_ffn", dm, di)}.items():
            sd[prefix + k] = v
    sd[prefix + "decoder.output_linear.weight"] = torch.randn(V, dm)
    return sd


def test_convert_file_and_evaluate(tmp_path):
    torch.manual_seed(0)
    dm, dk, dv, nh, di, V = 32, 16, 16, 2, 64, 8
    sd = {}
    # DataParallel wrapping ("module." prefix) like --parallel checkpoints
    sd["module.encoder.input_linear.weight"] = torch.randn(dm, 161)
    sd["module.encoder.input_linear.bias"] = torch.randn(dm)
    sd["module.encoder.layer_norm_input.weight"] = torch.ones(dm)
    sd["module.encoder.layer_norm_input.bias"] = torch.zeros(dm)
    for k, v in {**_mha_sd("encoder.layers.0.self_attn", dm, dk, dv, nh),
                 **_ffn_sd("encoder.layers.0.pos_ffn", dm, di)}.items():
        sd["module." + k] = v
    sd["module.decoder.trg_embedding.weight"] = torch.randn(V, dm)
    for k, v in {**_mha_sd("decoder.layers.0.self_attn", dm, dk, dv, nh),
                 **_mha_sd("decoder.layers.0.encoder_attn", dm, dk, dv, nh),
                 **_ffn_sd("decoder.layers.0.pos_ffn", dm, di)}.items():
        sd["module." + k] = v
    sd["module.decoder.output_linear.weight"] = torch.randn(V, dm)

    id2label = {i: c for i, c in enumerate("¶§¤abcde")}
    ckpt = {
        "label2id": {v: k for k, v in id2label.items()},
        "id2label": id2label,
        "args": _ref_args(),
        "epoch": 7,
        "model_state_dict": sd,
        "optimizer_state_dict": {},
        "optimizer_params": {"_step": 1234, "_rate": 3e-4,
                             "warmup": 4000, "factor": 1.0,
                             "model_size": 161},
        "metrics": {"valid_loss": 2.5},
    }
    th_path = tmp_path / "ref_model.th"
    torch.save(ckpt, str(th_path))

    from tools.convert_reference_checkpoint import convert_file
    out_base = str(tmp_path / "converted")
    convert_file(str(th_path), out_base)

    from end2end_asr_tpu.training.checkpoint import load_checkpoint
    (cfg, epoch, params, opt_state, model_state, label2id, id2label2,
     metrics) = load_checkpoint(out_base)
    assert epoch == 7
    assert cfg.dim_model == dm and cfg.feat_extractor == ""
    assert metrics["noam_step"] == 1234
    assert id2label2[3] == "a"

    # converted params run a teacher-forced forward
    import functools
    import jax
    import jax.numpy as jnp
    from end2end_asr_tpu.models.transformer import dims_from_config, forward
    dims = dims_from_config(cfg.replace(dtype="float32"))
    spect = jnp.asarray(np.random.RandomState(0).randn(2, 161, 20),
                        jnp.float32)
    tgt = jnp.array([[1, 3, 4, 2, 0, 0]] * 2, jnp.int32)
    pred, gold, _ = jax.jit(functools.partial(forward, dims=dims))(
        params, model_state, spect, jnp.array([20, 15]), tgt)
    assert pred.shape == (2, 7, V)
    assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.slow
def test_train_resume_from_converted_checkpoint(tmp_path):
    """The reference's --continue-from training-resume contract
    (utils/functions.py:86-94, train.py:84-99): resuming from a converted
    .th must rebuild optimizer state and CONTINUE the Noam LR schedule
    from the checkpoint's _step, not restart at step 1."""
    import os
    import re
    import subprocess
    import sys

    from tests.synth import make_corpus

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    manifest, labels_path = make_corpus(str(tmp_path / "c"),
                                        exact_samples=63 * 160)
    import json as _json
    from end2end_asr_tpu.config import build_vocab
    with open(labels_path, encoding="utf-8") as f:
        label2id, id2label = build_vocab("".join(_json.load(f)))
    V = len(label2id)

    torch.manual_seed(1)
    dm, dk, dv, nh, di = 64, 16, 16, 2, 128
    ns = _ref_args()
    ns.__dict__.update(num_layers=1, dim_model=dm, dim_key=dk, dim_value=dv,
                       dim_inner=di, dim_emb=dm, dim_input=161,
                       src_max_len=128, tgt_max_len=16, epochs=1,
                       name="resume", parallel=False, shuffle=False)
    noam_step = 1234
    ckpt = {
        "label2id": label2id,
        "id2label": id2label,
        "args": ns,
        "epoch": 0,
        "model_state_dict": _ref_sd(dm, dk, dv, nh, di, V),
        "optimizer_state_dict": {},
        "optimizer_params": {"_step": noam_step, "_rate": 3e-4,
                             "warmup": 4000, "factor": 1.0,
                             "model_size": 161},
        "metrics": {},
    }
    th_path = tmp_path / "trained_ref.th"
    torch.save(ckpt, str(th_path))

    from tools.convert_reference_checkpoint import convert_file
    out_base = str(tmp_path / "converted_train")
    convert_file(str(th_path), out_base)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "train.py"),
         "--continue-from", out_base,
         "--train-manifest-list", manifest,
         "--valid-manifest-list", manifest,
         "--labels-path", labels_path,
         "--name", "resume", "--save-folder", "models",
         "--epochs", "1", "--save-every", "1", "--batch-size", "4",
         "--dtype", "float32"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]

    # the first logged LR must be the Noam rate at step noam_step+1
    log = (tmp_path / "log" / "resume").read_text()
    m = re.search(r"LR:([0-9.]+)", log)
    assert m, log[-2000:]
    import jax.numpy as jnp
    from end2end_asr_tpu.training.optimizer import NoamConfig, noam_rate
    expect = float(noam_rate(jnp.asarray(noam_step + 1),
                             NoamConfig(model_size=161, factor=1.0,
                                        warmup=4000, min_lr=1e-5)))
    assert abs(float(m.group(1)) - expect) < 1e-6, (m.group(1), expect)

    # and the saved checkpoint carries the advanced optimizer step
    from end2end_asr_tpu.training.checkpoint import load_checkpoint
    (_, _, _, opt_state, *_rest) = load_checkpoint(
        str(tmp_path / "models" / "resume" / "epoch_1"))
    assert int(opt_state["step"]) == noam_step + 1
