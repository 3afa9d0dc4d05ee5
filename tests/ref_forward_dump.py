"""Subprocess helper: run the REFERENCE torch model (imported from
/root/reference with dependency stubs) on random inputs and dump its
state_dict + inputs + outputs to an npz, for the converter parity test.

This imports the reference package to use AS AN ORACLE — no reference
code is copied into the framework.

Usage: python ref_forward_dump.py <out.npz> <feat_extractor>
"""

import sys
import types

import numpy as np


def main():
    out_path, feat = sys.argv[1], sys.argv[2]

    # argparse in utils/constant.py parses at import: feed it flags
    sys.argv = ["ref", "--tgt-max-len", "16", "--src-max-len", "64",
                "--feat_extractor", feat, "--dropout", "0.0"]

    # stub native/extension deps the oracle path doesn't exercise
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
    from models.asr.transformer import Transformer, Encoder, Decoder

    torch.manual_seed(7)
    B, F, T, U = 2, 161, 40, 7
    num_layers, heads, dm, dk, dv, di, de = 2, 2, 32, 16, 16, 64, 32
    if feat == "vgg_cnn":
        dim_input = (F // 2 // 2) * 128
    elif feat == "emb_cnn":
        h = int((F - 41) / 2 + 1)
        dim_input = int((h - 21) / 2 + 1) * 32
    else:
        dim_input = F
    V = 12
    id2label = {i: chr(ord("a") + i) for i in range(V)}

    encoder = Encoder(num_layers, num_heads=heads, dim_model=dm, dim_key=dk,
                      dim_value=dv, dim_input=dim_input, dim_inner=di,
                      dropout=0.0, src_max_length=64)
    decoder = Decoder(id2label, num_src_vocab=V, num_trg_vocab=V,
                      num_layers=num_layers, num_heads=heads, dim_emb=de,
                      dim_model=dm, dim_inner=di, dim_key=dk, dim_value=dv,
                      dropout=0.0, trg_max_length=16, emb_trg_sharing=False)
    model = Transformer(encoder, decoder, feat_extractor=feat)
    model.eval()

    rs = np.random.RandomState(0)
    spect = rs.randn(B, 1, F, T).astype(np.float32)
    lengths = torch.tensor([T, T - 10])
    # targets: SOS + chars + EOS, PAD-padded (ids: PAD 0, SOS 1, EOS 2)
    tgt = np.zeros((B, U), np.int64)
    tgt[0, :6] = [1, 5, 6, 7, 8, 2]
    tgt[1, :4] = [1, 9, 4, 2]

    with torch.no_grad():
        pred, gold, hyp_seq, gold_seq = model(
            torch.tensor(spect), lengths, torch.tensor(tgt))

    arrays = {
        "spect": spect,
        "lengths": np.array([T, T - 10]),
        "targets": tgt,
        "pred": pred.numpy(),
        "gold": gold.numpy(),
    }
    for k, v in model.state_dict().items():
        arrays["sd." + k] = v.numpy()
    np.savez(out_path, **arrays)
    print("dumped", out_path, "pred", pred.shape)


if __name__ == "__main__":
    main()
