"""Tests for gMLP, patchify helpers, named schedules, external tokenizer
bridge, and the ddpm/masked glue not covered elsewhere."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from world_modelz_tpu.cli.masked_denoise import patchify, unpatchify
from world_modelz_tpu.diffusion.schedules import named_schedule
from world_modelz_tpu.models.gmlp import GMLP, SpatialGatingUnit
from world_modelz_tpu.ops.vq import vq_decode_masked, vq_init


def test_patchify_roundtrip(rng):
    x = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
    p = patchify(x, 4)
    assert p.shape == (2, 16, 48)
    back = unpatchify(p, 4, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_named_schedules():
    r = jnp.linspace(0, 1, 11)
    for name in ("linear", "cos1", "cos2", "cos05", "cos3", "cos2_inv",
                 "cos3_inv"):
        out = np.asarray(named_schedule(name)(r))
        assert out.shape == r.shape
        assert np.all(np.isfinite(out))
    np.testing.assert_allclose(
        np.asarray(named_schedule("linear")(r)), np.asarray(r)
    )
    # cos-family: decreasing in r; inv variants increasing
    c = np.asarray(named_schedule("cos2")(r))
    assert np.all(np.diff(c) <= 1e-6)
    ci = np.asarray(named_schedule("cos2_inv")(r))
    assert np.all(np.diff(ci) >= -1e-6)
    with pytest.raises(ValueError, match="unknown schedule"):
        named_schedule("bogus")


def test_spatial_gating_unit_near_identity_at_init():
    """SGU init (tiny token-mix weights, unit bias) ~= gate-norm passthrough
    (gmlp.py:81-83 rationale)."""
    sgu = SpatialGatingUnit(seq_len=8)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 16))
    params = sgu.init(key, x)
    out = sgu.apply(params, x)
    res, gate = np.split(np.asarray(x), 2, axis=-1)
    # gate ~ LayerNorm(gate) * ~0 + 1  ->  out ~ res
    np.testing.assert_allclose(np.asarray(out), res, atol=0.05)


def test_gmlp_shapes_and_vq_projection():
    model = GMLP(
        num_tokens_in=17, num_tokens_out=16, dim=32, depth=2, seq_len=8,
        vq_embedding_dim=12, attn_dim=8,
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (2, 8), 0, 17)
    emb = jax.random.normal(key, (2, 8, 12))
    params = model.init(key, tokens, emb)
    logits = model.apply(params, tokens, emb)
    assert logits.shape == (2, 8, 16)


def test_gmlp_layer_drop_rng():
    model = GMLP(
        num_tokens_in=8, num_tokens_out=8, dim=16, depth=3, seq_len=4,
        prob_survival=0.5,
    )
    key = jax.random.PRNGKey(0)
    tokens = jnp.zeros((1, 4), jnp.int32)
    params = model.init(key, tokens)
    out1 = model.apply(
        params, tokens, train=True, rngs={"layer_drop": jax.random.PRNGKey(1)}
    )
    out2 = model.apply(
        params, tokens, train=True, rngs={"layer_drop": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # eval mode: deterministic, no rng needed
    e1 = model.apply(params, tokens)
    e2 = model.apply(params, tokens)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_vq_decode_masked_zeros():
    state = vq_init(
        jax.random.PRNGKey(0), num_latents=1, num_embeddings=8,
        embedding_dim=4,
    )
    idx = jnp.asarray([[0], [8], [3]])  # 8 == mask token
    out = np.asarray(vq_decode_masked(state, idx, mask_token=8))
    np.testing.assert_array_equal(out[1], np.zeros((1, 4)))
    assert np.abs(out[0]).sum() > 0


def test_native_tokenizer_bridge():
    import jax

    from world_modelz_tpu.models import VQAutoEncoder
    from world_modelz_tpu.models.external import (
        FrameTokenizer,
        NativeTokenizer,
    )

    tok = VQAutoEncoder(
        embedding_dim=8, num_embeddings=32, downscale_steps=2,
        hidden_planes=16,
    )
    key = jax.random.PRNGKey(0)
    state = tok.init(key, jnp.zeros((1, 16, 16, 3)))
    bridge = NativeTokenizer(tok, state)
    assert isinstance(bridge, FrameTokenizer)

    imgs = np.random.default_rng(0).uniform(0, 1, (2, 16, 16, 3)).astype(
        np.float32
    )
    z = bridge.encode(imgs)
    assert z.shape == (2, 4, 4) and z.dtype == np.int32
    back = bridge.decode(z)
    assert back.shape == (2, 16, 16, 3)


def test_make_tokenizer_bad_spec():
    from world_modelz_tpu.models.external import make_tokenizer

    with pytest.raises(ValueError, match="unknown tokenizer spec"):
        make_tokenizer("bogus:path")


def test_taming_adapter_plumbing(monkeypatch, tmp_path):
    """Drive TamingGumbelVQAdapter end-to-end against a faked `taming`
    GumbelVQ so the tensor plumbing (NHWC<->NCHW permutes, [-1,1]<->[0,1]
    range adapters, encode-tuple indexing, get_codebook_entry shape spec —
    sparse_diffusion_sber.py:23-60,162-164) is exercised without the
    optional packages or a checkpoint."""
    import sys
    import types

    torch = pytest.importorskip("torch")

    N_EMBED, ZCH = 16, 4
    seen = {}

    class FakeQuantize:
        def get_codebook_entry(self, flat, shape):
            b, h, w, c = shape
            assert c == ZCH
            seen["codebook_shape"] = shape
            # embed index i as constant plane i/N_EMBED in NCHW
            z = flat.reshape(b, h, w, 1).repeat(1, 1, 1, c)
            return (z.float() / N_EMBED).permute(0, 3, 1, 2)

    class FakeGumbelVQ:
        def __init__(self, **params):
            seen["init_params"] = params
            self.quantize = FakeQuantize()

        def load_state_dict(self, sd, strict=False):
            seen["loaded"] = True

        def eval(self):
            return self

        def encode(self, x):
            # reference contract: encode(x)[2][2] are the token indices
            seen["encode_input"] = x
            b, c, h, w = x.shape
            f = 4
            idx = torch.arange(b * (h // f) * (w // f)) % N_EMBED
            return None, None, (None, None, idx)

        def decode(self, z):
            # emit [-1, 1] NCHW; channel-3 output like a real VQGAN
            b, c, h, w = z.shape
            return z[:, :3] * 2.0 - 1.0

    taming = types.ModuleType("taming")
    taming_models = types.ModuleType("taming.models")
    taming_vqgan = types.ModuleType("taming.models.vqgan")
    taming_vqgan.GumbelVQ = FakeGumbelVQ
    omegaconf = types.ModuleType("omegaconf")

    class FakeConf:
        """Attribute/dict hybrid like an OmegaConf node."""

        def __init__(self, d):
            self._d = d

        def __getattr__(self, k):
            v = self._d[k]
            return FakeConf(v) if isinstance(v, dict) else v

        def keys(self):
            return self._d.keys()

        def __getitem__(self, k):
            return self._d[k]

    omegaconf.OmegaConf = types.SimpleNamespace(
        load=lambda path: FakeConf(
            {
                "model": {
                    "params": {
                        "n_embed": N_EMBED,
                        "ddconfig": {"z_channels": ZCH},
                    }
                }
            }
        )
    )
    monkeypatch.setitem(sys.modules, "taming", taming)
    monkeypatch.setitem(sys.modules, "taming.models", taming_models)
    monkeypatch.setitem(sys.modules, "taming.models.vqgan", taming_vqgan)
    monkeypatch.setitem(sys.modules, "omegaconf", omegaconf)

    ckpt = tmp_path / "fake.ckpt"
    torch.save({"state_dict": {}}, str(ckpt))

    from world_modelz_tpu.models.external import (
        FrameTokenizer,
        TamingGumbelVQAdapter,
    )

    tok = TamingGumbelVQAdapter("fake_config.yaml", str(ckpt))
    assert isinstance(tok, FrameTokenizer)
    assert tok.num_embeddings == N_EMBED
    assert seen["loaded"]

    imgs = np.random.default_rng(0).uniform(0, 1, (2, 16, 16, 3)).astype(
        np.float32
    )
    z = tok.encode(imgs)
    # NHWC [0,1] input must reach the torch model as NCHW [-1,1]
    assert tuple(seen["encode_input"].shape) == (2, 3, 16, 16)
    assert float(seen["encode_input"].min()) < -0.5
    assert z.shape == (2, 4, 4)
    assert z.max() < N_EMBED

    out = tok.decode(z)
    assert seen["codebook_shape"] == (2, 4, 4, ZCH)
    # the fake decoder doesn't upsample; shape checks the NCHW->NHWC permute
    assert out.shape == (2, 4, 4, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_ledger_tables_in_docs_are_current():
    """README/ROADMAP perf tables are generated from the ledger; a ledger
    refresh without `ledger_report.py --update` must fail loudly (round-2
    review: three in-repo copies of the same number disagreed)."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ledger_report", os.path.join(root, "benchmarks", "ledger_report.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    table = mod.render()
    want = mod.BEGIN + "\n" + table + "\n" + mod.END
    for doc in ("README.md", os.path.join("docs", "ROADMAP.md")):
        with open(os.path.join(root, doc)) as f:
            assert want in f.read(), f"{doc}: stale ledger table"


def test_gumbelvq_vendored_fallback_end_to_end(tmp_path):
    """VERDICT r2 #10: without the optional `taming`/`omegaconf` packages
    the adapter falls back to the vendored minimal GumbelVQ — config-built,
    random weights — so encode/decode run for REAL (shapes, dtypes, ranges,
    determinism); only pretrained weights remain unexercised."""
    pytest.importorskip("torch")

    cfg = tmp_path / "gumbel.yaml"
    cfg.write_text(
        """
model:
  params:
    embed_dim: 8
    n_embed: 32
    kl_weight: 1.0e-08
    ddconfig:
      in_channels: 3
      out_ch: 3
      ch: 16
      ch_mult: [1, 2, 4]
      z_channels: 6
      resolution: 32
"""
    )
    from world_modelz_tpu.models.external import (
        FrameTokenizer,
        TamingGumbelVQAdapter,
    )

    tok = TamingGumbelVQAdapter(str(cfg), "")  # no checkpoint: random init
    assert tok.vendored  # env has no taming package
    assert isinstance(tok, FrameTokenizer)
    assert tok.num_embeddings == 32

    imgs = np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)).astype(
        np.float32
    )
    z = tok.encode(imgs)
    assert z.shape == (2, 8, 8)  # two stride-2 stages (len(ch_mult) - 1)
    assert z.dtype.kind in "iu" and z.min() >= 0 and z.max() < 32
    np.testing.assert_array_equal(z, tok.encode(imgs))  # eval is det.

    out = tok.decode(z)
    assert out.shape == (2, 32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    np.testing.assert_array_equal(out, tok.decode(z))

    # checkpoint load path: shape-matching entries are adopted
    import torch

    sd = {
        k: torch.zeros_like(v) for k, v in tok._model.state_dict().items()
    }
    torch.save({"state_dict": sd}, tmp_path / "ck.pt")
    tok2 = TamingGumbelVQAdapter(str(cfg), str(tmp_path / "ck.pt"))
    for v in tok2._model.state_dict().values():
        assert float(v.abs().sum()) == 0.0


def test_summarize_quality_two_extractor_table(tmp_path):
    """`scripts/summarize_quality.py --prefix2` renders both extractors'
    FVD for the same checkpoints side by side (VERDICT r3 #7: trend
    tables with two discriminating extractors)."""
    import importlib.util
    import json as _json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "summarize_quality",
        os.path.join(root, "scripts", "summarize_quality.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    for step, (a, b) in {1000: (2.0, 5.0), 2000: (1.0, 3.0)}.items():
        for prefix, fvd in (("m", a), ("mtok", b)):
            rec = {"fvd": fvd, "fvd_ci95": [fvd - 0.1, fvd + 0.1],
                   "clips": 64}
            (tmp_path / f"{prefix}_{step}_fvd.json").write_text(
                _json.dumps(rec)
            )

    out = tmp_path / "README.md"
    mod.main([
        "--dir", str(tmp_path), "--prefix", "m", "--prefix2", "mtok",
        "--fvd2_label", "tokenizer", "--out", str(out),
    ])
    text = out.read_text()
    assert "FVD (tokenizer) [95% CI] |" in text
    # both steps present, each row carries both extractors' scores
    assert "| 1k |" in text and "| 2k |" in text
    row_2k = [ln for ln in text.splitlines() if ln.startswith("| 2k |")][0]
    assert "1.000" in row_2k and "3.000" in row_2k
    # header and rows keep a consistent column count
    header = [ln for ln in text.splitlines() if "Checkpoint" in ln][0]
    assert header.count("|") == row_2k.count("|")


def test_relay_latency_artifact_reconciles_with_ledger():
    """The relay-probe artifact (VERDICT r4 #5) must tell one story with
    the perf ledger: its differenced device ms/step is the same compiled
    m3 train step as `train_step/m3_b64_g8`, so the two must agree within
    measurement noise, and the fitted roundtrip must dominate the trivial
    dispatch floor (the probe model t(k) = roundtrip + k*t_device only
    makes sense if the intercept is at least the floor any dispatch pays)."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "artifacts", "relay_latency.json")
    if not os.path.exists(path):
        pytest.skip("relay_latency.json not collected yet")
    with open(path) as f:
        probe = json.load(f)
    with open(os.path.join(root, "artifacts", "perf_ledger.json")) as f:
        ledger = json.load(f)
    twin = [e for e in ledger["entries"]
            if e["name"].startswith("train_step/m3_b64_g8/")][0]

    dev_diff = probe["device_ms_per_step_differenced"]
    dev_fit = probe["device_ms_per_step_fit"]
    # two probe methodologies agree with each other and the ledger twin
    assert abs(dev_diff - dev_fit) / dev_diff < 0.10
    assert abs(dev_diff - twin["ms"]) / twin["ms"] < 0.15
    # the roundtrip intercept is anchored by the trivial-dispatch floor
    assert probe["relay_roundtrip_ms_fit"] >= 0.5 * probe["trivial_dispatch_ms"]
    # single-dispatch times are monotone in chain length
    singles = {int(k): v for k, v in probe["single_dispatch_ms"].items()}
    ks = sorted(singles)
    assert all(singles[a] < singles[b] for a, b in zip(ks, ks[1:]))
