#!/usr/bin/env python3
"""Convert a reference torch checkpoint (.th) into this framework's
npz/json checkpoint, so trained reference models evaluate drop-in
(reproducing the published 13.5% beam-8 AiShell CER, README.md:22-28).

Reference checkpoint layout: utils/functions.py:11-59 — a dict with
label2id/id2label, the full argparse namespace under 'args', epoch,
model_state_dict, optimizer state and Noam scalars, metrics.

State-dict name mapping (reference module tree → our param pytree):

  encoder.input_linear.weight (D,I)        → encoder.input_linear.w (I,D)ᵀ
  encoder.layer_norm_input.{weight,bias}   → encoder.ln_input.{scale,bias}
  encoder.layers.N.self_attn.query_linear.*→ encoder.layers[N].self_attn.q.*
     (same for key/value/output linears; torch Linear weights transpose)
  *.self_attn.layer_norm.*                 → *.self_attn.ln.*
  *.pos_ffn.conv_1.weight (H,D,1)          → *.ffn.w1.w (D,H) squeeze+ᵀ
  *.pos_ffn.conv_2.weight (D,H,1)          → *.ffn.w2.w (H,D) squeeze+ᵀ
  decoder.trg_embedding.weight             → decoder.embedding
  decoder.output_linear.weight (V,D)       → decoder.output_linear.w (D,V)ᵀ
  conv.K.weight (O,I,kh,kw)  [frontend]    → frontend.convM.w (kh,kw,I,O)
  conv.K.{running_mean,running_var}        → state.frontend.bnM.{mean,var}

Usage:
  python tools/convert_reference_checkpoint.py in.th out_base
"""

from __future__ import annotations

import sys
from typing import Dict, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def _linear(sd, name) -> Dict[str, np.ndarray]:
    p = {"w": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        p["b"] = _np(sd[f"{name}.bias"])
    return p


def _ln(sd, name) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"])}


def _mha(sd, base) -> Dict:
    return {
        "q": _linear(sd, f"{base}.query_linear"),
        "k": _linear(sd, f"{base}.key_linear"),
        "v": _linear(sd, f"{base}.value_linear"),
        "out": _linear(sd, f"{base}.output_linear"),
        "ln": _ln(sd, f"{base}.layer_norm"),
    }


def _ffn(sd, base) -> Dict:
    w1 = _np(sd[f"{base}.conv_1.weight"])[:, :, 0].T  # (D,H)
    w2 = _np(sd[f"{base}.conv_2.weight"])[:, :, 0].T  # (H,D)
    return {
        "w1": {"w": w1, "b": _np(sd[f"{base}.conv_1.bias"])},
        "w2": {"w": w2, "b": _np(sd[f"{base}.conv_2.bias"])},
        "ln": _ln(sd, f"{base}.layer_norm"),
    }


def _conv2d(sd, name) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{name}.weight"])  # (O, I, kh, kw)
    return {"w": np.transpose(w, (2, 3, 1, 0)),  # HWIO
            "b": _np(sd[f"{name}.bias"])}


def _bn(sd, name) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{name}.weight"]),
              "bias": _np(sd[f"{name}.bias"])}
    state = {"mean": _np(sd[f"{name}.running_mean"]),
             "var": _np(sd[f"{name}.running_var"])}
    return params, state


def convert_state_dict(sd: Dict, num_layers: int, feat_extractor: str,
                       emb_trg_sharing: bool, dim_model: int,
                       src_max_len: int, tgt_max_len: int):
    """Returns (params, model_state) pytrees matching init_transformer."""
    from end2end_asr_tpu.models.layers import sinusoid_table

    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}  # unwrap nn.DataParallel

    encoder = {
        "input_linear": _linear(sd, "encoder.input_linear"),
        "ln_input": _ln(sd, "encoder.layer_norm_input"),
        "layers": [
            {"self_attn": _mha(sd, f"encoder.layers.{i}.self_attn"),
             "ffn": _ffn(sd, f"encoder.layers.{i}.pos_ffn")}
            for i in range(num_layers)
        ],
        "pe": np.asarray(sinusoid_table(src_max_len, dim_model)),
    }
    decoder = {
        "embedding": _np(sd["decoder.trg_embedding.weight"]),
        "layers": [
            {"self_attn": _mha(sd, f"decoder.layers.{i}.self_attn"),
             "enc_attn": _mha(sd, f"decoder.layers.{i}.encoder_attn"),
             "ffn": _ffn(sd, f"decoder.layers.{i}.pos_ffn")}
            for i in range(num_layers)
        ],
        "pe": np.asarray(sinusoid_table(tgt_max_len + 1, dim_model)),
    }
    if not emb_trg_sharing:
        decoder["output_linear"] = {
            "w": _np(sd["decoder.output_linear.weight"]).T}

    params = {"encoder": encoder, "decoder": decoder}
    model_state: Dict = {}

    if feat_extractor == "vgg_cnn":
        # nn.Sequential indices: 0,2 convs → pool → 5,7 convs → pool
        params["frontend"] = {
            "conv1": _conv2d(sd, "conv.0"),
            "conv2": _conv2d(sd, "conv.2"),
            "conv3": _conv2d(sd, "conv.5"),
            "conv4": _conv2d(sd, "conv.7"),
        }
    elif feat_extractor == "emb_cnn":
        bn1_p, bn1_s = _bn(sd, "conv.1")
        bn2_p, bn2_s = _bn(sd, "conv.4")
        params["frontend"] = {
            "conv1": _conv2d(sd, "conv.0"), "bn1": bn1_p,
            "conv2": _conv2d(sd, "conv.3"), "bn2": bn2_p,
        }
        model_state["frontend"] = {"bn1": bn1_s, "bn2": bn2_s}

    return params, model_state


def convert_file(in_path: str, out_base: str) -> None:
    import torch

    from end2end_asr_tpu.config import Config
    from end2end_asr_tpu.training.checkpoint import save_checkpoint

    ckpt = torch.load(in_path, map_location="cpu", weights_only=False)
    ns = ckpt["args"]
    args = vars(ns) if not isinstance(ns, dict) else dict(ns)
    cfg = Config.from_dict(args)
    label2id = ckpt["label2id"]
    id2label = ckpt["id2label"]

    params, model_state = convert_state_dict(
        ckpt["model_state_dict"], cfg.num_layers, cfg.feat_extractor,
        cfg.emb_trg_sharing, cfg.dim_model, cfg.src_max_len,
        cfg.tgt_max_len)

    # carry Noam scalar state forward so resumed training continues the
    # schedule (functions.py:86-91); Adam moments are not converted.
    metrics = dict(ckpt.get("metrics") or {})
    opt_params = ckpt.get("optimizer_params") or {}
    if "_step" in opt_params:
        metrics["noam_step"] = int(opt_params["_step"])

    save_checkpoint(out_base, cfg, int(ckpt.get("epoch", 0)), params,
                    None, model_state, label2id, id2label, metrics)
    print(f"converted {in_path} -> {out_base}.npz/.json")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    convert_file(sys.argv[1], sys.argv[2])
