"""Subprocess helper: run the REFERENCE torch TRAIN STEP (forward →
calculate_metrics loss → backward → clip_grad_norm_ → NoamOpt(Adam).step,
exactly trainer/asr/trainer.py:49-111) for N steps from a fixed init and
dump: the initial state_dict, per-step losses, the step-1 gradients, and
the final state_dict.

This imports the reference package AS AN ORACLE — no reference code is
copied into the framework. The JAX train step must reproduce all of it:
loss value, gradient flow, global-norm clipping, the Noam
model_size=dim_input quirk (utils/functions.py:101-107), and torch Adam
(0.9, 0.98, 1e-9) bias-corrected updates.

Usage: python ref_train_dump.py <out.npz> <feat_extractor> <loss_type>
"""

import sys
import types

import numpy as np

N_STEPS = 3
# warmup=1 puts the Noam rate on the decay branch immediately
# (rate ~ 0.08 * k_lr at step 1) so parameter updates are large enough
# that the final-weights comparison actually constrains the gradients.
WARMUP = 1
K_LR = 1.0
MIN_LR = 1e-9
MAX_NORM = 1.0  # small enough that global-norm clipping binds


def main():
    out_path, feat, loss_type = sys.argv[1], sys.argv[2], sys.argv[3]

    # argparse in utils/constant.py parses at import: feed it flags
    sys.argv = ["ref", "--tgt-max-len", "16", "--src-max-len", "64",
                "--feat_extractor", feat, "--dropout", "0.0", "--clip",
                "--max-norm", str(MAX_NORM), "--warmup", str(WARMUP),
                "--k-lr", str(K_LR), "--min-lr", str(MIN_LR),
                "--label-smoothing", "0.1", "--loss", loss_type]

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
    from utils.metrics import calculate_metrics
    from utils.optimizer import NoamOpt

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
    model.train()  # BN in batch-stats mode — the trainer's mode

    arrays = {}

    def snapshot(tag):
        for k, v in model.state_dict().items():
            arrays[f"{tag}." + k] = v.detach().numpy().copy()

    snapshot("sd0")

    rs = np.random.RandomState(0)
    spect = rs.randn(B, 1, F, T).astype(np.float32)
    lengths = torch.tensor([T, T - 10])
    tgt = np.zeros((B, U), np.int64)
    tgt[0, :6] = [1, 5, 6, 7, 8, 2]
    tgt[1, :4] = [1, 9, 4, 2]
    # reference collate semantics (utils/data_loader.py:182-214):
    # percentages = frames/maxT, tgt_lengths include SOS and EOS
    src_percentages = torch.tensor([1.0, (T - 10) / T], dtype=torch.float32)
    tgt_lengths = torch.tensor([6, 4])

    # trainer/asr/trainer.py:58-111 + utils/functions.py:101-107
    opt = NoamOpt(dim_input, K_LR, WARMUP,
                  torch.optim.Adam(model.parameters(), betas=(0.9, 0.98),
                                   eps=1e-9), min_lr=MIN_LR)
    losses, rates = [], []
    for step in range(N_STEPS):
        opt.zero_grad()
        pred, gold, hyp_seq, gold_seq = model(
            torch.tensor(spect), lengths, torch.tensor(tgt))
        seq_length = pred.size(1)
        sizes = src_percentages.mul(float(seq_length)).int()
        loss, _ = calculate_metrics(
            pred, gold, input_lengths=sizes, target_lengths=tgt_lengths,
            smoothing=0.1, loss_type=loss_type)
        loss.backward()
        # pre-clip grads, every step — the JAX side replays the optimizer
        # chain from these exact values (sign-descent chaos near g≈0 makes
        # end-to-end weight comparison ill-posed; identical-grad replay
        # pins clip+Adam+schedule without it)
        for name, p in model.named_parameters():
            g = p.grad
            arrays[f"g{step}." + name] = (
                np.zeros(p.shape, np.float32) if g is None
                else g.detach().numpy().copy())
        torch.nn.utils.clip_grad_norm_(model.parameters(), MAX_NORM)
        opt.step()
        losses.append(float(loss.item()))
        rates.append(float(opt._rate))
        snapshot(f"sd{step + 1}")

    arrays.update(
        spect=spect, lengths=np.array([T, T - 10]), targets=tgt,
        tgt_lengths=np.array([6, 4]), losses=np.array(losses, np.float64),
        rates=np.array(rates, np.float64))
    np.savez(out_path, **arrays)
    print("dumped", out_path, "losses", losses)


if __name__ == "__main__":
    main()
