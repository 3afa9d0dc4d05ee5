"""Configuration for the TPU-native ASR framework.

The reference keeps one argparse singleton parsed at *import time*
(``utils/constant.py:4-108``) whose namespace leaks into every module. Here
the same ~50 flags (same names, same defaults — drop-in CLI contract) are
parsed once by the entry points into a frozen :class:`Config` dataclass that
is threaded explicitly and serialized into checkpoints.

Special token ids/chars match ``utils/constant.py:102-108``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

PAD_TOKEN = 0
SOS_TOKEN = 1
EOS_TOKEN = 2

PAD_CHAR = "¶"  # ¶
SOS_CHAR = "§"  # §
EOS_CHAR = "¤"  # ¤


@dataclass(frozen=True)
class Config:
    """Frozen run configuration mirroring the reference CLI flag-for-flag.

    Field names are the argparse dests from ``utils/constant.py:6-94``;
    extra TPU-only knobs live at the bottom and default to values that
    reproduce reference behavior.
    """

    # model / run identity
    model: str = "TRFS"
    name: str = "model"

    # manifests
    train_manifest_list: Tuple[str, ...] = ()
    valid_manifest_list: Tuple[str, ...] = ()
    test_manifest_list: Tuple[str, ...] = ()
    lang_list: Tuple[str, ...] = ()

    # data
    sample_rate: int = 16000
    batch_size: int = 20
    num_workers: int = 4
    labels_path: str = "labels.json"
    label_smoothing: float = 0.0

    # features (reference: utils/data_loader.py:60-91)
    window_size: float = 0.02
    window_stride: float = 0.01
    window: str = "hamming"

    # training
    epochs: int = 1000
    cuda: bool = False  # kept for CLI parity; ignored (accelerator = TPU)
    device_ids: Optional[Tuple[int, ...]] = None
    lr: float = 3e-4
    save_every: int = 5
    save_folder: str = "models/"
    emb_trg_sharing: bool = False
    feat_extractor: str = "vgg_cnn"
    verbose: bool = False
    continue_from: str = ""

    # augmentation
    augment: bool = False
    noise_dir: Optional[str] = None
    noise_prob: float = 0.4
    noise_min: float = 0.0
    noise_max: float = 0.5

    # transformer dims (reference defaults utils/constant.py:52-62)
    num_layers: int = 3
    num_heads: int = 5
    dim_model: int = 512
    dim_key: int = 64
    dim_value: int = 64
    dim_input: int = 161
    dim_inner: int = 1024
    dim_emb: int = 512
    src_max_len: int = 4000
    tgt_max_len: int = 1000

    # Noam optimizer
    warmup: int = 4000
    min_lr: float = 1e-5
    k_lr: float = 1.0

    # SGD optimizer (CTC/annealing path)
    momentum: float = 0.9
    lr_anneal: float = 1.1
    # optimizer family: "noam" (Adam under the Noam schedule, the
    # reference's only reachable path, functions.py:101-114) or
    # "sgd_annealing" (nesterov SGD with lr /= lr_anneal per step — the
    # intended semantics of the reference's AnnealingOpt, whose step()
    # only anneals the LR and never applies the update,
    # utils/optimizer.py:34-45)
    opt: str = "noam"

    # decoder search
    beam_search: bool = False
    beam_width: int = 3
    beam_nbest: int = 5
    lm_rescoring: bool = False
    lm_path: str = "lm_model.pt"
    lm_weight: float = 0.1
    c_weight: float = 0.1
    prob_weight: float = 1.0

    # loss
    loss: str = "ce"
    clip: bool = False
    max_norm: float = 400.0
    dropout: float = 0.1

    # parallelism (reference: nn.DataParallel; here: device mesh)
    parallel: bool = False
    shuffle: bool = False

    # ---- TPU-native knobs (not in reference CLI) ----
    # Low-Rank Transformer (Winata et al., ICASSP 2020): factorize every
    # attention/FFN projection into rank-r pairs; 0 = full rank. Also
    # selectable via --model LRTRFS.
    rank: int = 0
    # jax.checkpoint the encoder/decoder layer blocks: trades ~30% extra
    # FLOPs for O(layers) less activation memory — enables bigger batches
    remat: bool = False
    # gradient accumulation: split each batch into K sequential
    # microbatches inside the jitted step (lax.scan) — peak activation
    # memory drops ~K x while grads/loss stay EXACTLY the full-batch
    # values (training/steps.py re-weights the CE masked-mean by token
    # counts). Composes with --remat for the biggest effective batches.
    grad_accum: int = 1
    # dispatch K optimizer steps as ONE device program (lax.scan over K
    # stacked same-bucket batches): identical numerics, 1/K the host
    # dispatch + metrics-pull overhead — for hosts/tunnels slower than
    # the chip (training/steps.py make_multi_train_step)
    steps_per_dispatch: int = 1
    # resume from the newest epoch checkpoint of this run automatically
    # (preemption recovery); --continue-from takes precedence
    auto_resume: bool = False
    # PRNG implementation for dropout streams: 'rbg' is ~7% faster per
    # train step on TPU than the default threefry; both are deterministic
    # per seed (streams differ between the two)
    rng_impl: str = "rbg"
    # compute host-side train CER/WER every Nth batch (the reference's
    # per-batch argmax→string loop is pure logging overhead, SURVEY §7)
    metrics_every: int = 1
    # SpecAugment (beyond the reference's tempo/gain/noise): on-device
    # frequency/time masking inside the train step
    spec_augment: bool = False
    freq_mask_width: int = 27
    n_freq_masks: int = 2
    time_mask_width: int = 100
    n_time_masks: int = 2
    seed: int = 123456  # reference seeds torch with 123456 (constant.py:96)
    dtype: str = "bfloat16"  # compute dtype for matmuls; params stay f32
    decode_max_len: int = 300  # reference hardcodes 300 (transformer.py:332,423)
    # Static bucket ladders replacing dynamic per-batch padding; values are
    # upper bounds, the last of each must cover src_max_len / tgt_max_len.
    src_buckets: Tuple[int, ...] = (200, 400, 800, 1600, 2400, 4000)
    tgt_buckets: Tuple[int, ...] = (50, 100, 200, 400, 1000)
    # Mesh axes for SPMD execution; data axis replaces --parallel/--device-ids.
    mesh_data: int = 0  # 0 = use all visible devices on the data axis
    # tensor parallelism: devices on the 'model' mesh axis (parallel/tp.py);
    # attention/FFN weights + Adam moments shard Megatron-style, XLA GSPMD
    # inserts the per-layer all-reduces. 1 = off (data parallelism only).
    mesh_model: int = 1
    # sequence parallelism (Megatron-SP style, parallel/sp.py): with
    # mesh_model > 1, additionally shard the encoder's time axis across
    # the 'model' axis in the LN/residual/dropout segments between the
    # head/inner-sharded matmuls. GSPMD converts the TP all-reduces into
    # reduce-scatter + all-gather (same comm volume, ~1/model_size the
    # activation memory in those segments). Numerics identical up to fp
    # reduction order. False = plain TP.
    seq_parallel: bool = False
    # pipeline parallelism (parallel/pp.py): devices on a 'pipe' mesh
    # axis; the encoder/decoder layer stacks split into mesh_pipe equal
    # stages and each batch flows through them as GPipe microbatches
    # (shard_map + ppermute, forward AND backward pipelined by
    # autodiff). Composes with mesh_data and mesh_model (TP inside each
    # stage). num_layers must divide evenly. 1 = off.
    mesh_pipe: int = 1
    # microbatches per batch for the pipeline schedule (0 = mesh_pipe);
    # more microbatches shrink the (S-1)/(M+S-1) bubble but each must
    # divide batch_size
    pipe_microbatches: int = 0
    # ZeRO-1 optimizer-state sharding (parallel/zero.py): Adam moments
    # (SGD momentum buffers) lay out sharded over the 'data' mesh axis —
    # 2/3 of the optimizer memory drops to 1/N per device at
    # data-parallel degree N; GSPMD partitions the update and
    # all-gathers the parameter delta. Composes with mesh_model and
    # mesh_pipe. Numerics identical up to XLA reduction scheduling.
    zero1: bool = False
    # ZeRO-3 / FSDP (parallel/zero.py stage 3): parameters ALSO lay out
    # sharded over 'data' (the Pallas-consumed conv frontend stays
    # replicated); GSPMD all-gathers each weight at its use sites and
    # reduce-scatters its gradient. Param+grad+optimizer memory all
    # scale down with data-parallel degree. Implies moment sharding.
    fsdp: bool = False
    # weight-only int8 post-training quantization at EVAL time
    # (test.py/transcribe.py; models/quantize.py): encoder/decoder dense
    # weights load as int8 + per-channel scales, 4× less decode-step
    # weight traffic. Training rejects it; checkpoints stay f32.
    quantize_int8: bool = False
    # Reference passes raw frame lengths to post-conv (T/4) tensors, which
    # makes encoder/cross-attn pad masks a no-op when a conv frontend is on
    # (transformer.py:78, SURVEY.md §7). True = reproduce; False = compute
    # properly subsampled lengths (recommended for new models).
    ref_compat_masks: bool = True
    use_pallas_features: bool = True  # fused on-device feature kernel
    # Host→device PCM wire dtype. "int16" halves the per-batch transfer
    # (the measured bottleneck of the trainer loop on the remote-TPU
    # tunnel: ~175 ms per 6 MB f32 batch, tools/probe_tunnel.py) and is
    # EXACT for WAV-sourced audio: int16 samples → f32/32768 on device is
    # bit-identical to host-side normalization, and augmented audio
    # quantizing back to int16 matches the reference's sox-tempfile WAV
    # round trip (utils/audio.py:22-45). "float32" = legacy wire.
    pcm_wire_dtype: str = "int16"
    # capture a jax.profiler trace of the first training epoch into this
    # directory (view with TensorBoard/xprof); empty = off
    trace_dir: str = ""
    # checkpoint serialization: "npz" (single-host .npz/.json pair) or
    # "orbax" (sharded multi-host-safe orbax.checkpoint directory)
    checkpoint_format: str = "npz"
    # progressive decoding: run greedy/beam with a KV cache of this many
    # steps first and re-run full-length only for utterances that never
    # finished (exact; 0 disables the short first pass)
    decode_stage_len: int = 64
    # Adam moment storage dtype: "bfloat16" halves the optimizer pass's
    # HBM traffic (update still computes f32). Default f32 = exact
    # torch.optim.Adam parity.
    adam_moments_dtype: str = "float32"
    # --lm-rescoring without --beam-search: the reference ignores the LM
    # (its evaluate() calls greedy_search with defaults,
    # transformer.py:117-118, and the per-step LM branch is unreachable
    # broken code). False = that parity. True = upgrade the intent to a
    # beam_width-wide LM-rescored beam search.
    lm_greedy_as_beam: bool = False

    # ------------------------------------------------------------------
    def __post_init__(self):
        # the ladders MUST cover src/tgt_max_len or long utterances are
        # silently truncated to the top rung (loader.pick_bucket falls
        # through to ladder[-1]); auto-extend instead of trusting the
        # comment above src_buckets. Runs for CLI, library construction
        # and replace() alike (dataclasses.replace re-runs this).
        if self.src_buckets and self.src_max_len > self.src_buckets[-1]:
            object.__setattr__(
                self, "src_buckets",
                tuple(self.src_buckets) + (self.src_max_len,))
        if self.tgt_buckets and self.tgt_max_len > self.tgt_buckets[-1]:
            object.__setattr__(
                self, "tgt_buckets",
                tuple(self.tgt_buckets) + (self.tgt_max_len,))

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict:
        d = dataclasses.asdict(self)
        return d

    @classmethod
    def from_dict(cls, d: Dict) -> "Config":
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in d.items():
            if k not in fields:
                continue
            if isinstance(v, list):
                v = tuple(v)
            kw[k] = v
        return cls(**kw)

    # Conv-frontend output feature dim, matching the arithmetic in
    # utils/functions.py:116-133 of the reference.
    def conv_dim_input(self) -> int:
        n_freq = int(math.floor((self.sample_rate * self.window_size) / 2) + 1)
        if self.feat_extractor == "emb_cnn":
            h = int(math.floor(n_freq - 41) / 2 + 1)
            h = int(math.floor(h - 21) / 2 + 1)
            return h * 32
        if self.feat_extractor == "vgg_cnn":
            return int(math.floor(int(math.floor(n_freq) / 2) / 2)) * 128
        return self.dim_input

    @property
    def n_fft(self) -> int:
        return int(self.sample_rate * self.window_size)

    @property
    def hop_length(self) -> int:
        return int(self.sample_rate * self.window_stride)

    @property
    def n_freq(self) -> int:
        return self.n_fft // 2 + 1


def build_parser() -> argparse.ArgumentParser:
    """Argparse parser with the exact flags of ``utils/constant.py:4-94``."""
    p = argparse.ArgumentParser(description="ASR training (TPU-native)")
    p.add_argument("--model", default="TRFS", type=str, help="TRFS:transformer")
    p.add_argument("--name", default="model", help="Name of the model for saving")

    p.add_argument("--train-manifest-list", nargs="+", type=str, default=[])
    p.add_argument("--valid-manifest-list", nargs="+", type=str, default=[])
    p.add_argument("--test-manifest-list", nargs="+", type=str, default=[])
    p.add_argument("--lang-list", nargs="+", type=str, default=[])

    p.add_argument("--sample-rate", default=16000, type=int)
    p.add_argument("--batch-size", default=20, type=int)
    p.add_argument("--num-workers", default=4, type=int)
    p.add_argument("--labels-path", default="labels.json")
    p.add_argument("--label-smoothing", default=0.0, type=float)
    p.add_argument("--window-size", default=0.02, type=float)
    p.add_argument("--window-stride", default=0.01, type=float)
    p.add_argument("--window", default="hamming")
    p.add_argument("--epochs", default=1000, type=int)
    p.add_argument("--cuda", dest="cuda", action="store_true")
    p.add_argument("--device-ids", default=None, nargs="+", type=int)
    p.add_argument("--lr", "--learning-rate", default=3e-4, type=float)
    p.add_argument("--save-every", default=5, type=int)
    p.add_argument("--save-folder", default="models/")
    p.add_argument("--emb_trg_sharing", action="store_true")
    p.add_argument("--feat_extractor", default="vgg_cnn", type=str)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--continue-from", default="")
    p.add_argument("--augment", dest="augment", action="store_true")
    p.add_argument("--noise-dir", default=None)
    p.add_argument("--noise-prob", default=0.4, type=float)
    p.add_argument("--noise-min", default=0.0, type=float)
    p.add_argument("--noise-max", default=0.5, type=float)

    p.add_argument("--num-layers", default=3, type=int)
    p.add_argument("--num-heads", default=5, type=int)
    p.add_argument("--dim-model", default=512, type=int)
    p.add_argument("--dim-key", default=64, type=int)
    p.add_argument("--dim-value", default=64, type=int)
    p.add_argument("--dim-input", default=161, type=int)
    p.add_argument("--dim-inner", default=1024, type=int)
    p.add_argument("--dim-emb", default=512, type=int)
    p.add_argument("--src-max-len", default=4000, type=int)
    p.add_argument("--tgt-max-len", default=1000, type=int)

    p.add_argument("--warmup", default=4000, type=int)
    p.add_argument("--min-lr", default=1e-5, type=float)
    p.add_argument("--k-lr", default=1, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--lr-anneal", default=1.1, type=float)

    p.add_argument("--beam-search", action="store_true")
    p.add_argument("--beam-width", default=3, type=int)
    p.add_argument("--beam-nbest", default=5, type=int)
    p.add_argument("--lm-rescoring", action="store_true")
    p.add_argument("--lm-path", type=str, default="lm_model.pt")
    p.add_argument("--lm-weight", default=0.1, type=float)
    p.add_argument("--c-weight", default=0.1, type=float)
    p.add_argument("--prob-weight", default=1.0, type=float)

    p.add_argument("--loss", type=str, default="ce")
    p.add_argument("--opt", type=str, default="noam",
                   choices=["noam", "sgd_annealing"],
                   help="optimizer: Noam-scheduled Adam (reference "
                        "default) or annealing nesterov SGD "
                        "(utils/optimizer.py:34-45 intended semantics)")
    p.add_argument("--clip", action="store_true")
    p.add_argument("--max-norm", default=400, type=float)
    p.add_argument("--dropout", default=0.1, type=float)
    p.add_argument("--parallel", action="store_true")
    p.add_argument("--shuffle", action="store_true")

    # TPU-native extras
    p.add_argument("--rank", default=0, type=int,
                   help="low-rank factorization rank (LRTRFS); 0 = full")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize transformer layers in backward")
    p.add_argument("--grad-accum", default=1, type=int,
                   help="accumulate gradients over K microbatches per "
                        "step (exact full-batch numerics, ~K x less "
                        "activation memory)")
    p.add_argument("--src-buckets", nargs="+", type=int, default=None,
                   help="static frame-bucket ladder (ascending); "
                        "default (200,400,800,1600,2400,4000), "
                        "auto-extended to cover --src-max-len")
    p.add_argument("--tgt-buckets", nargs="+", type=int, default=None,
                   help="static target-length bucket ladder")
    p.add_argument("--steps-per-dispatch", default=1, type=int,
                   help="run K optimizer steps per device dispatch "
                        "(exact numerics; amortizes host/tunnel "
                        "dispatch overhead)")
    p.add_argument("--metrics-every", default=1, type=int,
                   help="host-side train CER/WER every Nth batch")
    p.add_argument("--spec-augment", action="store_true",
                   help="SpecAugment freq/time masking on device")
    p.add_argument("--freq-mask-width", default=27, type=int)
    p.add_argument("--n-freq-masks", default=2, type=int)
    p.add_argument("--time-mask-width", default=100, type=int)
    p.add_argument("--n-time-masks", default=2, type=int)
    p.add_argument("--rng-impl", default="rbg",
                   choices=["rbg", "threefry2x32"],
                   help="PRNG for dropout (rbg is faster on TPU)")
    p.add_argument("--auto-resume", action="store_true",
                   help="resume from the newest epoch checkpoint of this "
                        "run (preemption recovery)")
    p.add_argument("--seed", default=123456, type=int)
    p.add_argument("--dtype", default="bfloat16", type=str)
    p.add_argument("--decode-max-len", default=300, type=int)
    p.add_argument("--mesh-data", default=0, type=int,
                   help="devices on the data-parallel mesh axis (0 = all)")
    p.add_argument("--mesh-model", default=1, type=int,
                   help="devices on the tensor-parallel 'model' mesh axis "
                        "(attention/FFN weights shard Megatron-style; "
                        "1 = data parallelism only)")
    p.add_argument("--mesh-pipe", default=1, type=int,
                   help="devices on the pipeline 'pipe' mesh axis: the "
                        "encoder/decoder layer stacks split into this "
                        "many GPipe stages (parallel/pp.py; 1 = off)")
    p.add_argument("--pipe-microbatches", default=0, type=int,
                   help="microbatches per batch for --mesh-pipe "
                        "(0 = stage count; more shrinks the bubble)")
    p.add_argument("--seq-parallel", action="store_true",
                   help="with --mesh-model N: also shard the encoder "
                        "time axis across the 'model' axis between the "
                        "TP matmuls (Megatron-SP; reduce-scatter + "
                        "all-gather replace the all-reduces)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard Adam moments over the 'data' "
                        "mesh axis (parallel/zero.py; optimizer memory "
                        "scales down with data-parallel degree)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3/FSDP: additionally shard the parameters "
                        "over 'data' (GSPMD all-gathers weights at use, "
                        "reduce-scatters grads); implies --zero1")
    p.add_argument("--quantize-int8", action="store_true",
                   help="eval-only: weight-only int8 PTQ of the "
                        "encoder/decoder dense weights on load "
                        "(models/quantize.py). 4x smaller serving "
                        "weights at pinned transcript parity; SPEED is "
                        "length-dependent on this 39M-param model — "
                        "long greedy loops ~11%% faster, beam ~0, short "
                        "(<~64-step) non-progressive greedy up to ~25%% "
                        "SLOWER from dequant overhead (measured table: "
                        "BENCH_NOTES.md round 4)")
    p.add_argument("--no-ref-compat-masks", dest="ref_compat_masks",
                   action="store_false",
                   help="use properly subsampled encoder pad masks instead "
                        "of the reference's raw-length (no-op) masks")
    p.add_argument("--no-pallas-features", dest="use_pallas_features",
                   action="store_false")
    p.add_argument("--pcm-wire-dtype", default="int16",
                   choices=["int16", "float32"],
                   help="host→device PCM transfer dtype (int16 halves "
                        "the per-batch copy; exact for WAV audio)")
    p.add_argument("--trace-dir", default="", type=str,
                   help="capture a jax.profiler trace of the first epoch "
                        "into this directory")
    p.add_argument("--adam-moments-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="Adam moment storage (bfloat16 = less HBM "
                        "traffic, slight numeric shift)")
    p.add_argument("--lm-greedy-as-beam", action="store_true",
                   help="upgrade --lm-rescoring without --beam-search to "
                        "a beam_width-wide LM-rescored beam (the "
                        "reference ignores the LM on that path)")
    p.add_argument("--decode-stage-len", default=64, type=int,
                   help="progressive decoding: short-KV-cache first pass "
                        "length (exact; 0 disables)")
    p.add_argument("--checkpoint-format", default="npz",
                   choices=["npz", "orbax"],
                   help="checkpoint serialization: npz pair (default) or "
                        "an orbax.checkpoint directory (multi-host-safe "
                        "sharded save/restore)")
    return p


def config_from_args(argv: Optional[List[str]] = None) -> Config:
    ns = build_parser().parse_args(argv)
    d = vars(ns)
    for k in ("train_manifest_list", "valid_manifest_list",
              "test_manifest_list", "lang_list"):
        d[k] = tuple(d.get(k) or ())
    if d.get("device_ids") is not None:
        d["device_ids"] = tuple(d["device_ids"])
    for k in ("src_buckets", "tgt_buckets"):
        if d.get(k) is None:
            d.pop(k, None)  # keep the dataclass default ladder
        else:
            d[k] = tuple(d[k])
    return Config.from_dict(d)


# Fields that define the parameter shapes / feature geometry of a saved
# model: on --continue-from these always come from the CHECKPOINT (the
# reference rebuilds the model from ckpt args, functions.py:72-78);
# explicitly-passed CLI values for anything else override the checkpoint
# (a resume like `--continue-from ep5 --grad-accum 4` must be honored).
ARCH_FIELDS = frozenset({
    "num_layers", "num_heads", "dim_model", "dim_key", "dim_value",
    "dim_inner", "dim_emb", "dim_input", "feat_extractor", "model",
    "rank", "emb_trg_sharing", "sample_rate", "window_size",
    "window_stride", "window", "src_max_len", "tgt_max_len",
    "src_buckets", "tgt_buckets", "labels_path",
})


def explicit_cli_overrides(argv: Optional[List[str]] = None) -> Dict:
    """The subset of config fields the user EXPLICITLY passed on this
    command line (defaults suppressed). Drives the resume semantics:
    checkpoint args win unless a flag was actually typed."""
    import argparse as _argparse
    p = build_parser()
    for action in p._actions:
        action.default = _argparse.SUPPRESS
        action.required = False
    d = vars(p.parse_args(argv))
    for k in ("train_manifest_list", "valid_manifest_list",
              "test_manifest_list", "lang_list", "device_ids"):
        if d.get(k) is not None and k in d:
            d[k] = tuple(d[k])
    return d


# ---------------------------------------------------------------------------
# Vocabulary
# ---------------------------------------------------------------------------

def build_vocab(labels: str) -> Tuple[Dict[str, int], Dict[int, str]]:
    """Build label2id/id2label with PAD/SOS/EOS prepended and duplicate
    labels skipped, matching ``train.py:44-57``."""
    labels = PAD_CHAR + SOS_CHAR + EOS_CHAR + labels
    label2id: Dict[str, int] = {}
    id2label: Dict[int, str] = {}
    count = 0
    for ch in labels:
        if ch not in label2id:
            label2id[ch] = count
            id2label[count] = ch
            count += 1
    return label2id, id2label


def resolve_labels_path(labels_path: str) -> str:
    """Resolve a labels path, falling back to the vendored files.

    The reference ships its label inventories in-tree
    (``data/labels/labels.json``, ``data/labels/aishell_labels.json``)
    and defaults ``--labels-path`` to a bare ``labels.json``
    (``utils/constant.py:19``). We vendor the same files under
    ``data/labels/`` at the repo root; when the given path does not
    exist, try that directory so the CLI default works with no
    dataprep pre-step.
    """
    if os.path.exists(labels_path):
        return labels_path
    vendored = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "labels",
        os.path.basename(labels_path))
    if os.path.exists(vendored):
        return vendored
    return labels_path


def load_vocab(labels_path: str) -> Tuple[Dict[str, int], Dict[int, str]]:
    with open(resolve_labels_path(labels_path), encoding="utf-8") as f:
        labels = str("".join(json.load(f)))
    return build_vocab(labels)
