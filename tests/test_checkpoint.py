"""Checkpoint semantics: optimizer-step (Noam LR) continuity across
save/load, config roundtrip, converter smoke via shape-compatible
state dict."""

import jax
import jax.numpy as jnp
import numpy as np

from end2end_asr_tpu.config import Config
from end2end_asr_tpu.training.checkpoint import (flatten_tree,
                                                 load_checkpoint,
                                                 save_checkpoint,
                                                 unflatten_tree)
from end2end_asr_tpu.training.optimizer import (NoamConfig,
                                                adam_noam_update,
                                                init_adam_state, noam_rate)


def test_flatten_unflatten_roundtrip():
    tree = {"a": {"b": jnp.ones((2, 3)), "c": [jnp.zeros(4), jnp.ones(5)]},
            "d": jnp.arange(3)}
    flat = flatten_tree(tree)
    back = unflatten_tree(flat)
    assert np.allclose(back["a"]["c"][1], 1.0)
    assert back["d"].shape == (3,)
    assert isinstance(back["a"]["c"], list)


def test_noam_step_continuity_across_checkpoint(tmp_path):
    cfg = Config(name="t", save_folder=str(tmp_path))
    params = {"w": jnp.ones((4, 4))}
    opt = init_adam_state(params)
    noam = NoamConfig(model_size=161, factor=1.0, warmup=100, min_lr=1e-6)

    lrs = []
    for _ in range(5):
        params, opt, lr = adam_noam_update(
            params, {"w": jnp.ones((4, 4)) * 0.1}, opt, noam)
        lrs.append(float(lr))

    base = str(tmp_path / "ckpt")
    save_checkpoint(base, cfg, epoch=3, params=params, opt_state=opt,
                    model_state={}, label2id={"a": 0}, id2label={0: "a"},
                    metrics={"valid_loss": 1.0})
    cfg2, epoch, p2, o2, s2, l2i, i2l, m2 = load_checkpoint(base)
    assert epoch == 3
    assert int(o2["step"]) == 5
    assert m2["valid_loss"] == 1.0
    assert l2i == {"a": 0} and i2l == {0: "a"}

    # the 6th step after resume continues the schedule exactly
    _, o3, lr6 = adam_noam_update(p2, {"w": jnp.ones((4, 4)) * 0.1},
                                  o2, noam)
    expected = float(noam_rate(jnp.asarray(6), noam))
    assert abs(float(lr6) - expected) < 1e-12


def test_config_tuple_roundtrip(tmp_path):
    cfg = Config(train_manifest_list=("a.csv", "b.csv"),
                 src_buckets=(100, 200), src_max_len=200)
    cfg2 = Config.from_dict(cfg.to_dict())
    assert cfg2.train_manifest_list == ("a.csv", "b.csv")
    assert cfg2.src_buckets == (100, 200)
    assert cfg2 == cfg
    # a ladder that does NOT cover src_max_len auto-extends (the silent
    # long-utterance truncation guard in Config.__post_init__)
    cfg3 = Config(src_buckets=(100, 200))  # default src_max_len 4000
    assert cfg3.src_buckets == (100, 200, 4000)
    assert Config.from_dict(cfg3.to_dict()) == cfg3


def test_orbax_format_roundtrip_and_autodetect(tmp_path):
    """--checkpoint-format orbax: same logical contents, auto-detected by
    load_checkpoint, visible to find_latest_checkpoint (auto-resume)."""
    from end2end_asr_tpu.training.checkpoint import find_latest_checkpoint

    cfg = Config(name="t", save_folder=str(tmp_path),
                 checkpoint_format="orbax")
    params = {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
              "layers": [{"u": jnp.ones((2, 2))}, {"u": jnp.zeros((2, 2))}]}
    opt = init_adam_state(params)
    d = tmp_path / "t"
    d.mkdir()
    base = str(d / "epoch_2")
    save_checkpoint(base, cfg, epoch=2, params=params, opt_state=opt,
                    model_state={"bn": {"mean": jnp.ones(3)}},
                    label2id={"a": 0}, id2label={0: "a"},
                    metrics={"valid_loss": 2.5}, fmt="orbax")
    assert (d / "epoch_2.orbax").is_dir()
    assert not (d / "epoch_2.npz").exists()

    cfg2, epoch, p2, o2, s2, l2i, i2l, m2 = load_checkpoint(base)
    assert epoch == 2 and m2["valid_loss"] == 2.5
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(np.asarray(p2["layers"][0]["u"]), 1.0)
    assert int(o2["step"]) == 0
    np.testing.assert_array_equal(np.asarray(s2["bn"]["mean"]), 1.0)
    assert cfg2.checkpoint_format == "orbax"

    assert find_latest_checkpoint(str(tmp_path), "t") == base


def test_npz_roundtrip_bf16_moments(tmp_path):
    """--adam-moments-dtype bfloat16 checkpoints must survive the npz
    round trip: np.savez writes ml_dtypes.bfloat16 as raw '|V2' voids,
    so the codec stores uint16 bit patterns + a bf16_keys sidecar."""
    import jax.numpy as jnp
    import ml_dtypes

    from end2end_asr_tpu.config import Config
    from end2end_asr_tpu.training.checkpoint import (load_checkpoint,
                                                     save_checkpoint)

    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    opt = {"step": np.int32(3),
           "mu": {"w": jnp.asarray([[1.5, -2.25, 0.125]] * 2,
                                   jnp.bfloat16)},
           "nu": {"w": jnp.asarray([[0.5, 4.0, 1e-3]] * 2,
                                   jnp.bfloat16)}}
    base = str(tmp_path / "ck")
    save_checkpoint(base, Config(), 1, params, opt, {}, {"a": 3},
                    {3: "a"})
    _, _, p2, o2, _, _, _, _ = load_checkpoint(base)
    assert o2["mu"]["w"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(opt["mu"]["w"]).view(np.uint16),
        o2["mu"]["w"].view(np.uint16))
    np.testing.assert_array_equal(
        np.asarray(opt["nu"]["w"]).view(np.uint16),
        o2["nu"]["w"].view(np.uint16))
    np.testing.assert_array_equal(p2["w"], params["w"])


def test_load_accepts_orbax_suffix(tmp_path):
    """--continue-from may name the on-disk .orbax artifact directly."""
    from end2end_asr_tpu.config import Config
    from end2end_asr_tpu.training.checkpoint import (load_checkpoint,
                                                     save_checkpoint)

    params = {"w": np.ones((2, 2), np.float32)}
    base = str(tmp_path / "ck")
    save_checkpoint(base, Config(), 2, params, None, {}, {"a": 3},
                    {3: "a"}, fmt="orbax")
    _, epoch, p2, _, _, _, _, _ = load_checkpoint(base + ".orbax")
    assert epoch == 2
    np.testing.assert_array_equal(np.asarray(p2["w"]), params["w"])
