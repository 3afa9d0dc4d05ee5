"""LSTM LM: torch-oracle forward parity, npz roundtrip, training CLI
end-to-end, and rescoring score semantics."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from end2end_asr_tpu.models.lm import (LM, init_lstm_params, lstm_forward,
                                       lstm_forward_batch, save_npz_lm)


def test_lstm_forward_matches_torch():
    torch = pytest.importorskip("torch")
    ninp, nhid, nlayers, V, T = 8, 12, 2, 20, 9
    params = init_lstm_params(jax.random.PRNGKey(0), V, ninp, nhid, nlayers)
    params = jax.tree_util.tree_map(np.asarray, params)

    rnn = torch.nn.LSTM(ninp, nhid, nlayers)
    with torch.no_grad():
        for i, layer in enumerate(params["layers"]):
            getattr(rnn, f"weight_ih_l{i}").copy_(
                torch.tensor(layer["w_ih"]))
            getattr(rnn, f"weight_hh_l{i}").copy_(
                torch.tensor(layer["w_hh"]))
            getattr(rnn, f"bias_ih_l{i}").copy_(torch.tensor(layer["b_ih"]))
            getattr(rnn, f"bias_hh_l{i}").copy_(torch.tensor(layer["b_hh"]))

    tokens = np.random.RandomState(0).randint(0, V, size=T)
    emb = params["embedding"][tokens]  # (T, ninp)
    with torch.no_grad():
        out, _ = rnn(torch.tensor(emb).unsqueeze(1))
    ref_logits = (out.squeeze(1).numpy() @ params["decoder_w"].T
                  + params["decoder_b"])
    ours = np.asarray(jax.jit(lstm_forward)(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(tokens)))
    np.testing.assert_allclose(ours, ref_logits, rtol=1e-4, atol=1e-4)

    # batched path agrees with single-sequence path
    batched = np.asarray(jax.jit(lstm_forward_batch)(
        jax.tree_util.tree_map(jnp.asarray, params),
        jnp.asarray(tokens)[None]))
    np.testing.assert_allclose(batched[0], ours, rtol=1e-4, atol=1e-4)


def test_lm_train_cli_and_rescoring(tmp_path):
    # corpus: repetitive in-domain text
    txts = []
    for i, text in enumerate(["hello world"] * 6 + ["good morning"] * 6):
        p = tmp_path / f"t{i}.txt"
        p.write_text(text)
        txts.append(p)
    wav = tmp_path / "dummy.wav"
    from end2end_asr_tpu.data.audio import save_wav
    save_wav(str(wav), np.zeros(160, np.float32), 16000)
    manifest = tmp_path / "m.csv"
    manifest.write_text("\n".join(f"{wav},{t}" for t in txts) + "\n")

    lm_path = tmp_path / "lm.npz"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "lm_train.py"),
         "--train-manifest-list", str(manifest), "--lm-path", str(lm_path),
         "--ninp", "16", "--nhid", "16", "--nlayers", "1",
         "--batch-size", "2", "--bptt", "8", "--epochs", "30",
         "--lr", "0.01"],
        capture_output=True, text=True, env=env, timeout=400)
    assert r.returncode == 0, r.stderr[-1000:]
    assert lm_path.exists()

    lm = LM(str(lm_path))
    in_domain, oov_in = lm.evaluate("hello world")
    out_domain, _ = lm.evaluate("world hello")
    assert oov_in == 0
    assert in_domain < out_domain  # memorized bigram scores better

    # rescoring formula (lstm_utils.py:9-44)
    from end2end_asr_tpu.decoding.lm_rescoring import calculate_lm_score
    id2label = {0: "¶", 1: "§", 2: "¤"}
    for i, ch in enumerate("helo wrd"):
        id2label[3 + i] = ch
    ids = [1] + [3 + "helo wrd".index(c) for c in "hello"] + [2]
    score, num_words, oov = calculate_lm_score(ids, lm, id2label)
    assert num_words == 2  # "hello" → 1 word + 1
    empty_score, nw, ov = calculate_lm_score([1, 2], lm, id2label)
    assert (empty_score, nw, ov) == (-999.0, 0, 0)

    # LM-rescored beam search end-to-end over a (random) acoustic model
    import functools
    import jax
    import jax.numpy as jnp
    from end2end_asr_tpu.config import Config
    from end2end_asr_tpu.decoding.beam import BeamDecoder
    from end2end_asr_tpu.models.transformer import (dims_from_config,
                                                    init_transformer)
    cfg = Config(num_layers=1, num_heads=2, dim_model=32, dim_key=16,
                 dim_value=16, dim_inner=64, dim_emb=32, feat_extractor="",
                 dtype="float32", beam_width=3, lm_rescoring=True,
                 lm_weight=0.5, c_weight=0.1)
    params, _ = jax.jit(functools.partial(
        init_transformer, cfg=cfg, num_vocab=len(id2label)))(
            jax.random.PRNGKey(0))
    enc = jnp.asarray(np.random.RandomState(0).randn(2, 5, 32),
                      jnp.float32)
    dec = BeamDecoder(cfg, dims_from_config(cfg), id2label, lm=lm)
    hyps = dec.decode(params, enc)
    assert len(hyps) == 2


def test_tie_weights_stays_tied_through_training():
    """--tie-weights must behave like torch RNNModel(tie_weights=True):
    ONE parameter receives the summed embedding+decoder gradients. A
    copied decoder_w leaf unties after the first optimizer step."""
    import jax
    import jax.numpy as jnp

    from end2end_asr_tpu.models.lm import (_decoder_w, init_lstm_params,
                                           lstm_forward_batch)

    params = init_lstm_params(jax.random.PRNGKey(0), ntoken=12, ninp=16,
                              nhid=16, nlayers=1, tie_weights=True)
    assert params["decoder_w"] is None  # no separate leaf to diverge
    np.testing.assert_array_equal(np.asarray(_decoder_w(params)),
                                  np.asarray(params["embedding"]))

    tokens = jnp.asarray([[1, 2, 3, 4, 5]], jnp.int32)

    def nll(p):
        logits = lstm_forward_batch(p, tokens[:, :-1])
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = tokens[:, 1:]
        return -jnp.sum(jnp.take_along_axis(logp, tgt[:, :, None],
                                            axis=-1))

    grads = jax.grad(nll)(params)
    # the embedding grad carries BOTH the input-embedding rows and the
    # decoder contribution (dense over the vocab via the softmax)
    g = np.asarray(grads["embedding"])
    assert np.abs(g).sum() > 0 and np.abs(g[0]).sum() > 0  # decoder part
    # untied rows (e.g. id 7, unused as input) still get decoder grads
    assert np.abs(g[7]).sum() > 0

    import pytest
    with pytest.raises(ValueError, match="tie"):
        init_lstm_params(jax.random.PRNGKey(0), ntoken=12, ninp=16,
                         nhid=32, nlayers=1, tie_weights=True)


def test_tied_npz_roundtrip(tmp_path):
    """save_npz_lm/_load_npz_lm preserve tiedness (no decoder_w key)."""
    import jax

    from end2end_asr_tpu.models.lm import (LM, init_lstm_params,
                                           save_npz_lm)

    params = init_lstm_params(jax.random.PRNGKey(1), ntoken=8, ninp=8,
                              nhid=8, nlayers=1, tie_weights=True)
    p = str(tmp_path / "lm.npz")
    save_npz_lm(p, params, {"<oov>": 0, "<eos>": 1, "a": 2, "b": 3})
    lm = LM(p)
    assert lm.params["decoder_w"] is None
    ce, oov = lm.evaluate("a b a")
    assert np.isfinite(ce) and ce > 0 and oov == 0
