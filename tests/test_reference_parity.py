"""Numerics parity vs the ACTUAL reference implementation: the torch
model from /root/reference runs in a subprocess (ref_forward_dump.py),
its state_dict converts through tools/convert_reference_checkpoint.py,
and our teacher-forced forward must reproduce its logits.

This validates every quirk at once: masks, EOS-as-pad preprocess,
conv-FFN-as-dense, PE layout, frontend layouts, LN eps, init-independent
forward math.
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models.transformer import dims_from_config, forward
from tools.convert_reference_checkpoint import convert_state_dict

REF = "/root/reference"


def _dump(tmp_path, feat):
    out = os.path.join(str(tmp_path), f"ref_{feat or 'none'}.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "ref_forward_dump.py"),
         out, feat],
        capture_output=True, text=True, env=env, timeout=300)
    if r.returncode != 0:
        pytest.skip(f"reference model not importable: {r.stderr[-500:]}")
    return out


@pytest.mark.parametrize("feat", ["", "vgg_cnn", "emb_cnn"])
def test_forward_matches_reference(tmp_path, feat):
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    dump = _dump(tmp_path, feat)
    data = np.load(dump)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}

    class _T:  # minimal tensor shim for convert_state_dict's _np()
        def __init__(self, a):
            self.a = a

        def detach(self):
            return self

        def cpu(self):
            return self

        def numpy(self):
            return self.a

    params, model_state = convert_state_dict(
        {k: _T(v) for k, v in sd.items()}, num_layers=2,
        feat_extractor=feat, emb_trg_sharing=False, dim_model=32,
        src_max_len=64, tgt_max_len=16)
    params = jax.tree_util.tree_map(np.asarray, params)

    cfg = Config(num_layers=2, num_heads=2, dim_model=32, dim_key=16,
                 dim_value=16, dim_inner=64, dim_emb=32,
                 feat_extractor=feat, dropout=0.0, dtype="float32",
                 src_max_len=64, tgt_max_len=16)
    dims = dims_from_config(cfg)

    spect = data["spect"][:, 0]  # (B, F, T)
    # reference pads seq to tgt_max_len=16 (common_layers.py:14-22);
    # match its width for position-by-position comparison
    pred, gold, _ = jax.jit(
        lambda p, s, x, l, t: forward(p, s, x, l, t, dims,
                                      tgt_pad_to=16))(
        params, model_state, spect, data["lengths"], data["targets"])

    np.testing.assert_array_equal(np.asarray(gold), data["gold"])
    np.testing.assert_allclose(np.asarray(pred), data["pred"],
                               rtol=2e-4, atol=2e-4)
