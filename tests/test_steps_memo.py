"""Jitted-step memo (training/steps.py _JIT_CACHE) keying regression:
traces baked for an installed parallelism mesh must NOT be reused after
a different mesh is installed — even if the old mesh was GC'd and the
new one reuses its memory address (ADVICE r4: the old key used
id(mesh), which a fresh Mesh at a recycled address could collide with;
the key is now a monotonically increasing install generation).

No jit compilation happens here: _memo is exercised with a counting
build() so the test is fast.
"""

import gc

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.models.transformer import dims_from_config
from end2end_asr_tpu.parallel import pp, sp, zero
from end2end_asr_tpu.parallel.mesh import make_mesh
from end2end_asr_tpu.parallel.tp import make_mesh_2d
from end2end_asr_tpu.training.steps import _memo

CFG = Config(num_layers=2, num_heads=4, dim_model=64, dim_key=16,
             dim_value=16, dim_inner=128, dim_emb=64, feat_extractor="",
             dim_input=161, dtype="float32", dropout=0.0,
             src_max_len=64, tgt_max_len=16)


def _counting_build(log):
    def build():
        obj = object()
        log.append(obj)
        return obj
    return build


def test_sp_memo_reuses_within_one_install_and_retraces_after():
    cfg = CFG.replace(seq_parallel=True)
    dims = dims_from_config(cfg)
    log = []
    build = _counting_build(log)
    try:
        mesh_a = make_mesh_2d(2, n_data=4)
        sp.install(mesh_a)
        f1 = _memo("t", cfg, dims, False, build)
        assert _memo("t", cfg, dims, False, build) is f1  # reuse
        assert len(log) == 1

        # GC mesh A, then install an identically-shaped mesh B — with
        # id()-keying a recycled address would silently reuse f1
        del mesh_a
        gc.collect()
        mesh_b = make_mesh_2d(2, n_data=4)
        sp.install(mesh_b)
        f2 = _memo("t", cfg, dims, False, build)
        assert f2 is not f1
        assert len(log) == 2
    finally:
        sp.install(None)


def test_pp_and_zero_memo_key_on_install_generation():
    dims = dims_from_config(CFG)

    cfg_pp = CFG.replace(mesh_pipe=2)
    log = []
    build = _counting_build(log)
    try:
        pp.install(pp.make_mesh_pipe(2, n_data=4), 2)
        f1 = _memo("t", cfg_pp, dims, False, build)
        assert _memo("t", cfg_pp, dims, False, build) is f1
        pp.install(pp.make_mesh_pipe(2, n_data=4), 2)
        assert _memo("t", cfg_pp, dims, False, build) is not f1
    finally:
        pp.install(None)

    cfg_z = CFG.replace(zero1=True)
    log2 = []
    build2 = _counting_build(log2)
    try:
        zero.install(make_mesh(8), stage=1)
        g1 = _memo("t", cfg_z, dims, False, build2)
        assert _memo("t", cfg_z, dims, False, build2) is g1
        zero.install(make_mesh(8), stage=1)
        assert _memo("t", cfg_z, dims, False, build2) is not g1
    finally:
        zero.install(None)


def test_memo_generation_is_monotonic():
    g0 = sp._GEN
    sp.install(None)
    sp.install(None)
    assert sp._GEN == g0 + 2
