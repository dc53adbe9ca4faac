"""Reference LoRA checkpoint interchange (convert/lora_import.py): both
on-disk formats convert into the canonical stacked tree and merge to the
exact torch LoRALinear semantics y = x@(W + alpha/r * B@A).T."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dualforce_tpu.config import tiny_test_config  # noqa: E402
from dualforce_tpu.convert.lora_import import (  # noqa: E402
    convert_lora_state_dict,
    load_reference_lora,
)
from dualforce_tpu.engine.lora import merge_pipeline_lora  # noqa: E402
from dualforce_tpu.models.factory import init_pipeline_params  # noqa: E402

RANK, ALPHA = 4, 8.0


def _fake_accelerate_sd(cfg, rng):
    """Accelerate-format keys ({module}.{path}.lora_A.weight, A [r, in])."""
    sd = {}
    vdim = cfg.video_dit.dim
    adim = cfg.audio_dit.dim
    for i in range(cfg.video_dit.num_layers):
        A = rng.normal(size=(RANK, vdim)).astype(np.float32)
        B = rng.normal(size=(vdim, RANK)).astype(np.float32)
        sd[f"video_dit.blocks.{i}.self_attn.q.lora_A.weight"] = torch.tensor(A)
        sd[f"video_dit.blocks.{i}.self_attn.q.lora_B.weight"] = torch.tensor(B)
    # PEFT-style ".default." naming on another projection
    A = rng.normal(size=(RANK, adim)).astype(np.float32)
    B = rng.normal(size=(adim, RANK)).astype(np.float32)
    sd["audio_dit.blocks.0.cross_attn.o.lora_A.default.weight"] = torch.tensor(A)
    sd["audio_dit.blocks.0.cross_attn.o.lora_B.default.weight"] = torch.tensor(B)
    # bridge conditioner (k: in=audio_dim for a2v)
    A = rng.normal(size=(RANK, adim)).astype(np.float32)
    B = rng.normal(size=(vdim, RANK)).astype(np.float32)
    sd["dual_tower_bridge.audio_to_video_conditioners.0.inner.k.lora_A.weight"] = torch.tensor(A)
    sd["dual_tower_bridge.audio_to_video_conditioners.0.inner.k.lora_B.weight"] = torch.tensor(B)
    # a non-LoRA key must be ignored
    sd["video_dit.blocks.0.self_attn.q.weight"] = torch.zeros(vdim, vdim)
    return sd


def test_accelerate_format_roundtrip(tmp_path):
    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    sd = _fake_accelerate_sd(cfg, rng)
    d = tmp_path / "lora_ckpt"
    d.mkdir()
    torch.save(sd, d / "lora_weights.pt")
    torch.save({"rank": RANK, "alpha": ALPHA, "target_modules": []},
               d / "lora_config.pt")

    lora, meta = load_reference_lora(str(d), cfg)
    assert meta["alpha"] == ALPHA and meta["rank"] == RANK
    assert "blocks/self_attn/q/kernel" in lora["video_dit"]
    assert "a2v/inner/k/kernel" in lora["bridge"]

    params = init_pipeline_params(jax.random.PRNGKey(0), cfg, with_vaes=False,
                                  with_text=False, two_video_towers=False)
    merged = merge_pipeline_lora(params, lora, alpha=ALPHA)

    # torch LoRALinear semantics: y = x @ (W + alpha/r * B@A).T
    i = 1
    A = sd[f"video_dit.blocks.{i}.self_attn.q.lora_A.weight"].numpy()
    B = sd[f"video_dit.blocks.{i}.self_attn.q.lora_B.weight"].numpy()
    base = np.asarray(params["video_dit"]["blocks"]["self_attn"]["q"]["kernel"][i])
    want = base + (ALPHA / RANK) * (B @ A).T
    got = np.asarray(merged["video_dit"]["blocks"]["self_attn"]["q"]["kernel"][i])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # untouched layers stay identical (zero factors)
    got0 = np.asarray(merged["audio_dit"]["blocks"]["self_attn"]["q"]["kernel"])
    np.testing.assert_array_equal(
        got0, np.asarray(params["audio_dit"]["blocks"]["self_attn"]["q"]["kernel"]))
    # bridge merge applied at stacked position 0
    Ab = sd["dual_tower_bridge.audio_to_video_conditioners.0.inner.k.lora_A.weight"].numpy()
    Bb = sd["dual_tower_bridge.audio_to_video_conditioners.0.inner.k.lora_B.weight"].numpy()
    baseb = np.asarray(params["bridge"]["a2v"]["inner"]["k"]["kernel"][0])
    wantb = baseb + (ALPHA / RANK) * (Bb @ Ab).T
    gotb = np.asarray(merged["bridge"]["a2v"]["inner"]["k"]["kernel"][0])
    np.testing.assert_allclose(gotb, wantb, rtol=1e-5, atol=1e-5)


def test_low_resource_format_keys():
    """Buffer-style keys (no .weight suffix) parse identically."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(1)
    vdim = cfg.video_dit.dim
    A = rng.normal(size=(RANK, vdim)).astype(np.float32)
    B = rng.normal(size=(vdim, RANK)).astype(np.float32)
    sd = {
        "video_dit.blocks.0.self_attn.v.lora_A": A,
        "video_dit.blocks.0.self_attn.v.lora_B": B,
        "video_dit.blocks.0.self_attn.v.weight": np.zeros((vdim, vdim)),
    }
    lora, skipped = convert_lora_state_dict(sd, cfg)
    assert "blocks/self_attn/v/kernel" in lora["video_dit"]
    a = lora["video_dit"]["blocks/self_attn/v/kernel"]["a"]
    b = lora["video_dit"]["blocks/self_attn/v/kernel"]["b"]
    assert a.shape == (cfg.video_dit.num_layers, vdim, RANK)
    np.testing.assert_allclose(a[0], A.T)
    np.testing.assert_allclose(b[0], B.T)
    assert sd_key_in(skipped["non_lora"], "self_attn.v.weight")


def sd_key_in(lst, frag):
    return any(frag in k for k in lst)


def test_class_name_rank_in_config(tmp_path):
    """The reference's non-FSDP save_lora_weights (lora_utils.py:248) stores
    a module CLASS-NAME string under config["rank"]; loading must not crash —
    rank comes from the factor shapes."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(2)
    sd = _fake_accelerate_sd(cfg, rng)
    d = tmp_path / "lora_ckpt"
    d.mkdir()
    torch.save(sd, d / "lora_weights.pt")
    torch.save({"rank": "WanModel", "alpha": ALPHA}, d / "lora_config.pt")

    lora, meta = load_reference_lora(str(d), cfg)
    assert meta["rank"] == RANK  # inferred from the factors
    assert "blocks/self_attn/q/kernel" in lora["video_dit"]


def _random_lora_tree(cfg, rng):
    """A realistically-shaped trained tree (nonzero a AND b everywhere)."""
    from dualforce_tpu.engine.lora import init_pipeline_lora

    params = init_pipeline_params(jax.random.PRNGKey(0), cfg, with_vaes=False,
                                  with_text=False, two_video_towers=False)
    lora = init_pipeline_lora(jax.random.PRNGKey(1), params, rank=RANK)
    return jax.tree.map(
        lambda x: jnp.asarray(rng.normal(size=x.shape).astype(np.float32)),
        lora)


def test_lora_export_roundtrip_accelerate(tmp_path):
    """train here -> save_reference_lora -> load_reference_lora == bit-equal
    tree (VERDICT r2 missing #4; lora_utils.py:259-308 format)."""
    from dualforce_tpu.convert.lora_export import save_reference_lora

    cfg = tiny_test_config()
    lora = _random_lora_tree(cfg, np.random.default_rng(4))
    d = tmp_path / "exported"
    save_reference_lora(jax.tree.map(np.asarray, lora), cfg, str(d),
                        alpha=ALPHA, rank=RANK)
    assert (d / "lora_weights.pt").exists() and (d / "lora_config.pt").exists()

    back, meta = load_reference_lora(str(d), cfg)
    assert meta["alpha"] == ALPHA and meta["rank"] == RANK
    for mod, tree in lora.items():
        for path, ab in tree.items():
            np.testing.assert_array_equal(
                np.asarray(ab["a"]), back[mod][path]["a"],
                err_msg=f"{mod}:{path} a")
            np.testing.assert_array_equal(
                np.asarray(ab["b"]), back[mod][path]["b"],
                err_msg=f"{mod}:{path} b")


def test_lora_export_roundtrip_low_resource(tmp_path):
    """Low-resource buffer-style export re-imports bit-equal."""
    from dualforce_tpu.convert.lora_export import save_reference_lora

    cfg = tiny_test_config()
    lora = _random_lora_tree(cfg, np.random.default_rng(5))
    pt = tmp_path / "lora_lr.pt"
    save_reference_lora(jax.tree.map(np.asarray, lora), cfg, str(pt),
                        alpha=ALPHA, rank=RANK, style="low_resource")
    back, _ = load_reference_lora(str(pt), cfg)
    for mod, tree in lora.items():
        for path, ab in tree.items():
            np.testing.assert_array_equal(np.asarray(ab["a"]),
                                          back[mod][path]["a"])
            np.testing.assert_array_equal(np.asarray(ab["b"]),
                                          back[mod][path]["b"])


def test_lora_export_drops_zero_layers(tmp_path):
    """Zero-filled (untrained) stacked positions are not written — matches
    the reference saving only targeted layers."""
    from dualforce_tpu.convert.lora_export import export_lora_state_dict

    cfg = tiny_test_config()
    L = cfg.video_dit.num_layers
    vdim = cfg.video_dit.dim
    a = np.zeros((L, vdim, RANK), np.float32)
    b = np.zeros((L, RANK, vdim), np.float32)
    a[0] = 1.0  # only layer 0 trained
    sd = export_lora_state_dict(
        {"video_dit": {"blocks/self_attn/q/kernel": {"a": a, "b": b}}}, cfg)
    assert "video_dit.blocks.0.self_attn.q.lora_A.weight" in sd
    assert not any(".blocks.1." in k for k in sd)
    # torch layout: A [r, in]
    assert sd["video_dit.blocks.0.self_attn.q.lora_A.weight"].shape == (RANK, vdim)


def test_partial_layer_missing_factor_is_skipped():
    """A layer with only one factor (truncated save) is recorded under
    skipped, not a KeyError — and other complete layers still convert."""
    cfg = tiny_test_config()
    rng = np.random.default_rng(3)
    vdim = cfg.video_dit.dim
    sd = {}
    A0 = rng.normal(size=(RANK, vdim)).astype(np.float32)
    B0 = rng.normal(size=(vdim, RANK)).astype(np.float32)
    sd["video_dit.blocks.0.self_attn.q.lora_A"] = A0
    sd["video_dit.blocks.0.self_attn.q.lora_B"] = B0
    # layer 1: lora_A only
    sd["video_dit.blocks.1.self_attn.q.lora_A"] = A0
    lora, skipped = convert_lora_state_dict(sd, cfg)
    ab = lora["video_dit"]["blocks/self_attn/q/kernel"]
    np.testing.assert_allclose(ab["a"][0], A0.T)
    np.testing.assert_array_equal(ab["a"][1], 0)  # merge-neutral
    assert sd_key_in(skipped["unmapped"], "layer 1")
