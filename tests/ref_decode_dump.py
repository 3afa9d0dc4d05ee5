"""Subprocess helper: run the REFERENCE torch Decoder's greedy_search and
beam_search (models/asr/transformer.py:316-517) on a small random decoder
and random encoder outputs, and dump state dict + inputs + decoded results
(ids, strings, n-best order, raw/final scores) for the decode-parity tests.

The reference is imported AS AN ORACLE — no reference code is copied into
the framework. Raw cumulative log-probs are recomputed with ONE
teacher-forced pass per returned hypothesis using the reference's own
modules (causal masking makes this identical to its per-step recompute).

Usage: python ref_decode_dump.py <out_base>   # writes out_base.npz/.json/_lm.pt
"""

import json
import math
import sys
import types

import numpy as np


def main():
    out_base = sys.argv[1]

    # argparse in utils/constant.py parses at import: feed it flags
    sys.argv = ["ref", "--tgt-max-len", "400", "--src-max-len", "400",
                "--dropout", "0.0"]

    # stub native/extension deps the oracle path doesn't exercise.
    # data.helper's language segmentation is stubbed as identity — exact
    # for the pure-non-Chinese vocab used below (the real helper returns
    # one segment, which lstm_utils re-joins back to the same string).
    lev = types.ModuleType("Levenshtein")
    lev.distance = lambda a, b: 0
    sys.modules["Levenshtein"] = lev
    helper = types.ModuleType("data.helper")
    helper.get_word_segments_per_language = lambda s: [s]
    helper.is_contain_chinese_word = lambda s: False
    helper.is_chinese_char = lambda c: False
    data_pkg = types.ModuleType("data")
    data_pkg.helper = helper
    sys.modules["data"] = data_pkg
    sys.modules["data.helper"] = helper

    sys.path.insert(0, "/root/reference")

    import torch
    import torch.nn.functional as F
    import models.asr.transformer as ref_transformer
    from models.asr.transformer import Decoder
    from models.common_layers import get_subsequent_mask as _gsm
    from utils import lstm_utils

    # torch>=2 requires boolean masks in masked_fill; the reference's
    # get_subsequent_mask returns uint8 (common_layers.py). Pure dtype
    # compat shim — 0/1 semantics unchanged.
    def get_subsequent_mask(seq):
        return _gsm(seq).bool()

    ref_transformer.get_subsequent_mask = get_subsequent_mask

    torch.manual_seed(11)
    B, T_SHORT, T_LONG = 2, 20, 310
    num_layers, heads, dm, dk, dv, di, de = 2, 2, 32, 16, 16, 64, 32
    V = 12
    # PAD/SOS/EOS + letters + a space at id 9 (so num_words varies and
    # c_weight ranking is exercised)
    chars = "¶§¤abcdef gh"
    id2label = {i: c for i, c in enumerate(chars)}
    assert len(id2label) == V

    decoder = Decoder(id2label, num_src_vocab=V, num_trg_vocab=V,
                      num_layers=num_layers, num_heads=heads, dim_emb=de,
                      dim_model=dm, dim_inner=di, dim_key=dk, dim_value=dv,
                      dropout=0.0, trg_max_length=400,
                      emb_trg_sharing=False)
    decoder.eval()

    rs = np.random.RandomState(3)
    enc_short = rs.randn(B, T_SHORT, dm).astype(np.float32)
    enc_long = rs.randn(1, T_LONG, dm).astype(np.float32)

    # ---- tiny word-LSTM LM in the reference's checkpoint format ----
    lm_words = ["<oov>", "<eos>", "a", "ab", "abc", "de", "def", "gh"]
    word2idx = {w: i for i, w in enumerate(lm_words)}
    lm_model = lstm_utils.RNNModel("LSTM", ntoken=len(lm_words), ninp=16,
                                   nhid=16, nlayers=1, dropout=0.0,
                                   tie_weights=False)
    lm_ckpt = {
        "word2idx": word2idx,
        "idx2word": {i: w for w, i in word2idx.items()},
        "ntoken": len(lm_words), "ninp": 16, "nhid": 16, "nlayers": 1,
        "dropout": 0.0, "tie_weights": False,
        "model_state_dict": lm_model.state_dict(),
    }
    torch.save(lm_ckpt, out_base + "_lm.pt")
    lm = lstm_utils.LM(out_base + "_lm.pt")

    def raw_score(enc_1, yseq, forced_last):
        """Cumulative log-softmax of yseq[1:] given yseq prefixes, with the
        reference beam's inference masks; the forced EOS (appended at
        i == T_enc-1 without log-prob, transformer.py:464-467) is skipped."""
        prefix = torch.tensor([yseq[:-1]], dtype=torch.long)
        non_pad_mask = torch.ones_like(prefix).float().unsqueeze(-1)
        self_attn_mask = get_subsequent_mask(prefix)
        with torch.no_grad():
            out = decoder.dropout(
                decoder.trg_embedding(prefix) * decoder.x_logit_scale
                + decoder.positional_encoding(prefix))
            for layer in decoder.layers:
                out, _, _ = layer(out, torch.tensor(enc_1),
                                  non_pad_mask=non_pad_mask,
                                  self_attn_mask=self_attn_mask,
                                  dec_enc_attn_mask=None)
            logp = F.log_softmax(decoder.output_linear(out[0]), dim=-1)
        upto = len(yseq) - 1
        total = 0.0
        for t in range(upto):
            if forced_last and t == upto - 1:
                continue
            total += float(logp[t, yseq[t + 1]])
        return total

    def final_score(raw, yseq, c_weight, lm_weight=None):
        chars_str = "".join(id2label[int(x)] for x in yseq)
        for sp in ("¶", "§", "¤"):
            chars_str = chars_str.replace(sp, "")
        seq_str = chars_str.replace("  ", " ")
        if lm_weight is not None:
            lm_score, num_words, oov = lstm_utils.calculate_lm_score(
                torch.tensor([yseq]), lm, id2label)
            lm_score -= oov * 2
            return (raw + lm_weight * float(lm_score)
                    + math.sqrt(num_words) * c_weight)
        num_words = len(seq_str.split())
        return raw + math.sqrt(num_words) * c_weight

    def one_beam(enc_1, W, nbest, c_weight, lm_weight):
        with torch.no_grad():
            if lm_weight is not None:
                return decoder.beam_search(
                    torch.tensor(enc_1), beam_width=W, nbest=nbest,
                    lm_rescoring=True, lm=lm, lm_weight=lm_weight,
                    c_weight=c_weight)
            return decoder.beam_search(
                torch.tensor(enc_1), beam_width=W, nbest=nbest,
                c_weight=c_weight)

    def run_beam(enc, name, W, nbest, c_weight, lm_weight=None):
        # the flat outputs are utterance-major with variable counts;
        # run per utterance to recover boundaries (beam_search loops per
        # utterance internally anyway, transformer.py:413).
        counts, raws, finals = [], [], []
        ids, strs = [], []
        T_enc = enc.shape[1]
        for b in range(enc.shape[0]):
            ids_b, strs_b = one_beam(enc[b:b + 1], W, nbest, c_weight,
                                     lm_weight)
            counts.append(len(ids_b))
            ids.extend(ids_b)
            strs.extend(strs_b)
            for y in ids_b:
                forced = len(y) == T_enc + 2
                r = raw_score(enc[b:b + 1], y, forced)
                raws.append(r)
                finals.append(final_score(r, y, c_weight, lm_weight))
        return {"enc": name, "W": W, "nbest": nbest, "c_weight": c_weight,
                "lm_weight": lm_weight, "counts": counts,
                "ids": [list(map(int, y)) for y in ids], "strings": strs,
                "raw": raws, "final": finals}

    results = {}
    with torch.no_grad():
        results["greedy_short"] = decoder.greedy_search(
            torch.tensor(enc_short))
        results["greedy_long"] = decoder.greedy_search(
            torch.tensor(enc_long))

    results["beams"] = [
        run_beam(enc_short, "short", W=2, nbest=3, c_weight=0.0),
        run_beam(enc_short, "short", W=4, nbest=5, c_weight=0.5),
        run_beam(enc_short, "short", W=8, nbest=5, c_weight=0.5),
        run_beam(enc_long, "long", W=2, nbest=3, c_weight=0.0),
        run_beam(enc_short, "short", W=4, nbest=3, c_weight=0.5,
                 lm_weight=0.3),
    ]

    # the reference's greedy lm_rescoring branch (transformer.py:357-373)
    # is broken code: log_softmax/topk over dim=1 (time) crashes on the
    # first step. Record the crash as oracle evidence.
    try:
        with torch.no_grad():
            decoder.greedy_search(torch.tensor(enc_short), beam_width=2,
                                  lm_rescoring=True, lm=lm)
        results["greedy_lm_error"] = None
    except Exception as e:  # noqa: BLE001
        results["greedy_lm_error"] = f"{type(e).__name__}: {e}"

    results["id2label"] = {str(k): v for k, v in id2label.items()}

    arrays = {"enc_short": enc_short, "enc_long": enc_long}
    for k, v in decoder.state_dict().items():
        arrays["sd." + k] = v.numpy()
    np.savez(out_base + ".npz", **arrays)
    with open(out_base + ".json", "w", encoding="utf-8") as f:
        json.dump(results, f, ensure_ascii=False)
    print("dumped", out_base, "| greedy_lm_error:",
          results["greedy_lm_error"])


if __name__ == "__main__":
    main()
