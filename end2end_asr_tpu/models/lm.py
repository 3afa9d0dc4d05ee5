"""Word-level LSTM language model for beam rescoring.

Reference: utils/lstm_utils.py:47-201 — a torch LSTM LM checkpoint
(word2idx/idx2word, ninp/nhid/nlayers, optional tied weights) whose
`evaluate(seq)` returns the summed cross-entropy of the word sequence
(with <eos> appended and <oov> fallback).

Here the LSTM runs as a `lax.scan` over time in JAX (gate order i,f,g,o —
torch convention, so converted torch checkpoints drop straight in).
Checkpoints load from either our .npz format or a torch .pt file (torch
is only imported for conversion).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def lstm_forward(params: Dict, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens: (T,) int32 → logits (T, V). Eval mode (no dropout)."""
    emb = params["embedding"][tokens]  # (T, ninp)
    x = emb
    for layer in params["layers"]:
        W_ih, W_hh = layer["w_ih"], layer["w_hh"]
        b = layer["b_ih"] + layer["b_hh"]
        H = W_hh.shape[1]

        def cell(carry, x_t):
            h, c = carry
            gates = x_t @ W_ih.T + h @ W_hh.T + b
            i, f, g, o = jnp.split(gates, 4)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros(H), jnp.zeros(H))
        _, x = jax.lax.scan(cell, init, x)
    logits = x @ _decoder_w(params).T + params["decoder_b"]
    return logits


def _decoder_w(params: Dict) -> jnp.ndarray:
    """Tied models carry NO separate decoder_w leaf — the decoder IS the
    embedding, so training gradients sum both uses into one parameter
    (torch tie_weights semantics); a copied leaf would untie after one
    Adam step."""
    w = params.get("decoder_w")
    return params["embedding"] if w is None else w


def init_lstm_params(key, ntoken: int, ninp: int, nhid: int,
                     nlayers: int, tie_weights: bool = False) -> Dict:
    """torch RNNModel init semantics (lstm_utils.py:179-183): embedding
    and decoder U(-0.1, 0.1), decoder bias 0, LSTM weights torch default
    U(-1/sqrt(H), 1/sqrt(H))."""
    import math
    keys = jax.random.split(key, 3 + 4 * nlayers)
    emb = jax.random.uniform(keys[0], (ntoken, ninp), jnp.float32,
                             -0.1, 0.1)
    if tie_weights and ninp != nhid:
        raise ValueError(
            f"--tie-weights requires ninp == nhid (got {ninp} vs "
            f"{nhid}), same as torch RNNModel")
    # tied: no decoder_w leaf at all (see _decoder_w) — otherwise the
    # optimizer would update two copies independently
    dec_w = (None if tie_weights else
             jax.random.uniform(keys[1], (ntoken, nhid), jnp.float32,
                                -0.1, 0.1))
    layers = []
    bound = 1.0 / math.sqrt(nhid)
    for i in range(nlayers):
        d_in = ninp if i == 0 else nhid
        ks = keys[3 + 4 * i: 7 + 4 * i]
        layers.append({
            "w_ih": jax.random.uniform(ks[0], (4 * nhid, d_in),
                                       jnp.float32, -bound, bound),
            "w_hh": jax.random.uniform(ks[1], (4 * nhid, nhid),
                                       jnp.float32, -bound, bound),
            "b_ih": jax.random.uniform(ks[2], (4 * nhid,),
                                       jnp.float32, -bound, bound),
            "b_hh": jax.random.uniform(ks[3], (4 * nhid,),
                                       jnp.float32, -bound, bound),
        })
    return {"embedding": emb, "decoder_w": dec_w,
            "decoder_b": jnp.zeros((ntoken,)), "layers": layers}


def lstm_forward_batch(params: Dict, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens: (B, T) → logits (B, T, V) via one lax.scan over time."""
    B, T = tokens.shape
    x = params["embedding"][tokens]  # (B, T, ninp)
    x = jnp.transpose(x, (1, 0, 2))  # (T, B, ninp)
    for layer in params["layers"]:
        W_ih, W_hh = layer["w_ih"], layer["w_hh"]
        b = layer["b_ih"] + layer["b_hh"]
        H = W_hh.shape[1]

        def cell(carry, x_t):
            h, c = carry
            gates = x_t @ W_ih.T + h @ W_hh.T + b
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = (jax.nn.sigmoid(i), jax.nn.sigmoid(f),
                       jax.nn.sigmoid(o))
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
        _, x = jax.lax.scan(cell, init, x)
    logits = x @ _decoder_w(params).T + params["decoder_b"]
    return jnp.transpose(logits, (1, 0, 2))  # (B, T, V)


@jax.jit
def _sequence_nll(params: Dict, tokens: jnp.ndarray,
                  n_valid: jnp.ndarray) -> jnp.ndarray:
    """Summed next-token cross-entropy over the first `n_valid` tokens
    of a zero-padded vector: predicts tokens[1:] from tokens[:-1]
    (lstm_utils.py:105-127 semantics). Padding to power-of-two buckets
    (evaluate below) caps the distinct compiled lengths — rescoring a
    test set of 2..40-word hypotheses costs ~5 compiles instead of one
    per length (remote compiles are 20-60 s on this image)."""
    logits = lstm_forward(params, tokens[:-1])
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, tokens[1:][:, None], axis=-1)[:, 0]
    mask = jnp.arange(ll.shape[0]) < (n_valid - 1)
    return -jnp.sum(jnp.where(mask, ll, 0.0))


class LM:
    """Drop-in for lstm_utils.LM: evaluate(seq_str) → (total_ce, oov)."""

    def __init__(self, model_path: str):
        if model_path.endswith((".pt", ".th")):
            self.params, self.word2idx = _load_torch_lm(model_path)
        else:
            self.params, self.word2idx = _load_npz_lm(model_path)

    def seq_to_ids(self, seq: str) -> Tuple[np.ndarray, int]:
        words = seq.split() + ["<eos>"]
        oov_id = self.word2idx.get("<oov>", 0)
        ids, oov = [], 0
        for w in words:
            if w in self.word2idx:
                ids.append(self.word2idx[w])
            elif w.lower() in self.word2idx:
                # lm_train's corpus builder lowercases
                # (data/lm_loader.py words_from_text); hypotheses built
                # from uppercase label sets must not all fall to <oov>
                ids.append(self.word2idx[w.lower()])
            else:
                ids.append(oov_id)
                oov += 1
        return np.asarray(ids, np.int32), oov

    def evaluate(self, seq: str) -> Tuple[float, int]:
        ids, oov = self.seq_to_ids(seq)
        if len(ids) < 2:
            return 0.0, oov
        n = len(ids)
        bucket = max(8, 1 << (n - 1).bit_length())
        padded = np.zeros(bucket, np.int32)
        padded[:n] = ids
        return float(_sequence_nll(self.params, jnp.asarray(padded),
                                   jnp.int32(n))), oov


def _load_npz_lm(path: str):
    data = np.load(path, allow_pickle=True)
    meta = data["meta"].item()
    word2idx = meta["word2idx"]
    nlayers = meta["nlayers"]
    params = {
        "embedding": jnp.asarray(data["embedding"]),
        "decoder_w": (jnp.asarray(data["decoder_w"])
                      if "decoder_w" in data.files else None),
        "decoder_b": jnp.asarray(data["decoder_b"]),
        "layers": [
            {k: jnp.asarray(data[f"l{i}_{k}"])
             for k in ("w_ih", "w_hh", "b_ih", "b_hh")}
            for i in range(nlayers)
        ],
    }
    return params, word2idx


def _load_torch_lm(path: str):
    """Convert a reference torch LSTM-LM checkpoint in memory
    (lstm_utils.py:52-64 layout)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"]
    nlayers = ckpt["nlayers"]
    layers = []
    for i in range(nlayers):
        layers.append({
            "w_ih": jnp.asarray(sd[f"rnn.weight_ih_l{i}"].numpy()),
            "w_hh": jnp.asarray(sd[f"rnn.weight_hh_l{i}"].numpy()),
            "b_ih": jnp.asarray(sd[f"rnn.bias_ih_l{i}"].numpy()),
            "b_hh": jnp.asarray(sd[f"rnn.bias_hh_l{i}"].numpy()),
        })
    params = {
        "embedding": jnp.asarray(sd["encoder.weight"].numpy()),
        "decoder_w": jnp.asarray(sd["decoder.weight"].numpy()),
        "decoder_b": jnp.asarray(sd["decoder.bias"].numpy()),
        "layers": layers,
    }
    return params, ckpt["word2idx"]


def save_npz_lm(path: str, params: Dict, word2idx: Dict[str, int]) -> None:
    arrays = {
        "embedding": np.asarray(params["embedding"]),
        "decoder_b": np.asarray(params["decoder_b"]),
        "meta": np.array({"word2idx": dict(word2idx),
                          "nlayers": len(params["layers"])}, dtype=object),
    }
    if params.get("decoder_w") is not None:  # absent = tied (see
        arrays["decoder_w"] = np.asarray(params["decoder_w"])  # _decoder_w)
    for i, layer in enumerate(params["layers"]):
        for k, v in layer.items():
            arrays[f"l{i}_{k}"] = np.asarray(v)
    np.savez(path, **arrays)
