"""Import reference (PyTorch) VqAutoEncoder checkpoints into this framework.

Migration path for users of the reference repo: a tokenizer trained with
the reference `train_vqae.py` (minecraft/train_vqae.py:20-55 — the
`VqAutoEncoder` whose checkpoint dict carries `model_state_dict` and the
argparse `opt`, :216-223) converts into a `TokenizerState` usable by every
trainer/CLI here (`load_tokenizer` contract). The conv/BN/VQ stacks are
structurally 1:1 (models/conv.py mirrors autoencoder.py:18-152; ops/vq.py
mirrors vq/vq.py:5-111), so the mapping is a pure rename + layout
transpose:

- torch `Conv2d.weight` (O, I, kh, kw)  ->  flax `kernel` (kh, kw, I, O)
- torch BatchNorm weight/bias           ->  flax params scale/bias
- torch BatchNorm running_mean/var      ->  flax batch_stats mean/var
- `vq.embedding` / `vq.cluster_size`    ->  `VQState.codebook/cluster_size`
  ((K, D) checkpoints are lifted to the (1, K, D) multi-latent layout)

Note: our decoder applies the skip's 1x1 projection at LOW resolution
(an exact commute with the bilinear upsample, models/conv.py:297-306), so
the reference's `conv_residual` weights transfer verbatim.

Tensors are accepted as torch tensors or numpy arrays; the module itself
never imports torch (the CLI does, to unpickle the checkpoint).
"""

from __future__ import annotations

from typing import Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor without importing torch
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv(sd: Mapping, key: str) -> dict:
    out = {"kernel": _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _bn(sd: Mapping, key: str) -> Tuple[dict, dict]:
    params = {
        "scale": _np(sd[f"{key}.weight"]),
        "bias": _np(sd[f"{key}.bias"]),
    }
    stats = {
        "mean": _np(sd[f"{key}.running_mean"]),
        "var": _np(sd[f"{key}.running_var"]),
    }
    return params, stats


def _residual(sd: Mapping, base: str) -> Tuple[dict, dict]:
    """One encoder Residual block (autoencoder.py:18-42):
    _block = [conv3x3, BN, act, conv1x1, BN] (+ downsample [conv, BN])."""
    p, s = {}, {}
    p["Conv_0"] = _conv(sd, f"{base}._block.0")
    p["BatchNorm_0"], s["BatchNorm_0"] = _bn(sd, f"{base}._block.1")
    p["Conv_1"] = _conv(sd, f"{base}._block.3")
    p["BatchNorm_1"], s["BatchNorm_1"] = _bn(sd, f"{base}._block.4")
    if f"{base}.downsample.0.weight" in sd:
        p["Conv_2"] = _conv(sd, f"{base}.downsample.0")
        p["BatchNorm_2"], s["BatchNorm_2"] = _bn(sd, f"{base}.downsample.1")
    return p, s


def tokenizer_trees_from_torch(sd: Mapping) -> Tuple[dict, dict, dict]:
    """reference `VqAutoEncoder.state_dict()` -> (params, batch_stats, vq).

    Returns plain nested dicts; `tokenizer_state_from_torch` wraps them in
    the framework's `TokenizerState`.
    """
    # ---- encoder: _conv_1 stem + _residual_stack._stack.{i} ------------
    enc_p = {"Conv_0": _conv(sd, "encoder._conv_1")}
    stack_p, stack_s = {}, {}
    i = 0
    while f"encoder._residual_stack._stack.{i}._block.0.weight" in sd:
        p, s = _residual(sd, f"encoder._residual_stack._stack.{i}")
        stack_p[f"Residual_{i}"], stack_s[f"Residual_{i}"] = p, s
        i += 1
    if i == 0:
        raise KeyError(
            "no encoder._residual_stack.* keys — is this a VqAutoEncoder "
            "state_dict (strip any 'model_state_dict' wrapper first)?"
        )
    enc_p["ResidualStack_0"] = stack_p
    enc_s = {"ResidualStack_0": stack_s}

    # ---- decoder: decoder_stack = [stem, UpscaleResidual..., out] ------
    dec_p, dec_s = {"Conv_0": _conv(sd, "decoder.decoder_stack.0")}, {}
    i, j = 1, 0
    while f"decoder.decoder_stack.{i}.conv1.weight" in sd:
        base = f"decoder.decoder_stack.{i}"
        p, s = {}, {}
        p["BatchNorm_0"], s["BatchNorm_0"] = _bn(sd, f"{base}.bn1")
        p["Conv_0"] = _conv(sd, f"{base}.conv1")
        p["BatchNorm_1"], s["BatchNorm_1"] = _bn(sd, f"{base}.bn2")
        p["Conv_1"] = _conv(sd, f"{base}.conv2")
        if f"{base}.conv_residual.weight" in sd:
            p["Conv_2"] = _conv(sd, f"{base}.conv_residual")
        dec_p[f"UpscaleResidual_{j}"], dec_s[f"UpscaleResidual_{j}"] = p, s
        i, j = i + 1, j + 1
    dec_p["Conv_1"] = _conv(sd, f"decoder.decoder_stack.{i}")

    # ---- VQ buffers ----------------------------------------------------
    codebook = _np(sd["vq.embedding"])
    if codebook.ndim == 2:  # single-latent checkpoints
        codebook = codebook[None]
    cluster = _np(sd["vq.cluster_size"])
    if cluster.ndim == 1:
        cluster = cluster[None]

    def _opt(name: str) -> np.ndarray:
        # activation/error stats are non-persistent reference buffers
        # (vq/vq.py:18-19) — absent from most checkpoints
        if name in sd:
            v = _np(sd[name])
            return v[None] if v.ndim == 1 else v
        return np.zeros_like(cluster)

    vq = {
        "codebook": codebook,
        "cluster_size": cluster,
        "activation_count": _opt("vq.activation_count"),
        "accumulated_error": _opt("vq.accumulated_error"),
    }
    return {"encoder": enc_p, "decoder": dec_p}, \
        {"encoder": enc_s, "decoder": dec_s}, vq


def _linear(sd: Mapping, key: str) -> dict:
    """torch nn.Linear (out, in) -> flax nn.Dense kernel (in, out)."""
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _layernorm(sd: Mapping, key: str) -> dict:
    return {
        "scale": _np(sd[f"{key}.weight"]),
        "bias": _np(sd[f"{key}.bias"]),
    }


def video_params_from_torch(sd: Mapping) -> dict:
    """reference `VqVideoDiffusionModel.state_dict()` -> flax params.

    The reference model (minecraft/main2.py:26-37 wrapping
    local_3d_attention.py:121-163) is a pre-norm stack of
    PreNorm(Local3dAttention) / PreNorm(FeedForward) pairs under
    `transformer.layers.{i}.{0,1}` plus embedding/position tables and the
    last-frame `logit_proj` head; our module mirrors it 1:1
    (models/video.py, models/attention.py), so the mapping is renames +
    Linear transposes. Works for both `model_state_dict` and
    `ema_model_state_dict` (identical layouts).

    Imported forwards match the reference to ~1e-4 (golden-tested); the
    one systematic difference is the GELU variant — flax's tanh
    approximation vs torch's exact erf.
    """
    emb = lambda key: {"embedding": _np(sd[f"{key}.weight"])}
    tr = {
        "embedding": emb("transformer.embedding"),
        "pos_emb_s": emb("transformer.pos_emb_s"),
        "pos_emb_h": emb("transformer.pos_emb_h"),
        "pos_emb_w": emb("transformer.pos_emb_w"),
    }
    i = 0
    while f"transformer.layers.{i}.0.norm.weight" in sd:
        base = f"transformer.layers.{i}"
        tr[f"attn_norm_{i}"] = _layernorm(sd, f"{base}.0.norm")
        attn = {
            "to_q": _linear(sd, f"{base}.0.fn.to_q"),
            "to_k": _linear(sd, f"{base}.0.fn.to_k"),
            "to_v": _linear(sd, f"{base}.0.fn.to_v"),
        }
        if f"{base}.0.fn.to_out.0.weight" in sd:  # project_out only
            attn["to_out"] = _linear(sd, f"{base}.0.fn.to_out.0")
        tr[f"attn_{i}"] = attn
        tr[f"ff_norm_{i}"] = _layernorm(sd, f"{base}.1.norm")
        tr[f"ff_{i}"] = {
            "Dense_0": _linear(sd, f"{base}.1.fn.net.0"),
            "Dense_1": _linear(sd, f"{base}.1.fn.net.3"),
        }
        i += 1
    if i == 0:
        raise KeyError(
            "no transformer.layers.* keys — is this a VqVideoDiffusionModel "
            "state_dict (strip any 'model_state_dict' wrapper first)?"
        )
    return {"transformer": tr, "logit_proj": _linear(sd, "logit_proj")}


def sparse_params_from_torch(sd: Mapping) -> dict:
    """reference `VqSparseDiffusionModel.state_dict()` -> flax params.

    The reference (minecraft/sparse_diffusion.py:75-111 over
    minecraft/transformer.py:34-80) is factorized position tables + token
    embedding + a fused-QKV pre-norm dense transformer + logit head; our
    module mirrors it (models/video.py VqSparseDiffusionModel over
    models/attention.py DenseTransformer — same q/k/v chunk order and
    heads-major head split), so the mapping is renames + transposes.
    """
    emb = lambda key: {"embedding": _np(sd[f"{key}.weight"])}
    out = {
        "embedding": emb("embedding"),
        "pos_emb_s": emb("pos_emb_s"),
        "pos_emb_h": emb("pos_emb_h"),
        "pos_emb_w": emb("pos_emb_w"),
        "logit_proj": _linear(sd, "logit_proj"),
    }
    tr = {}
    i = 0
    while f"transformer.layers.{i}.0.norm.weight" in sd:
        base = f"transformer.layers.{i}"
        tr[f"LayerNorm_{2 * i}"] = _layernorm(sd, f"{base}.0.norm")
        attn = {"to_qkv": _linear(sd, f"{base}.0.fn.to_qkv")}
        if f"{base}.0.fn.to_out.0.weight" in sd:  # project_out only
            attn["to_out"] = _linear(sd, f"{base}.0.fn.to_out.0")
        tr[f"DenseAttention_{i}"] = attn
        tr[f"LayerNorm_{2 * i + 1}"] = _layernorm(sd, f"{base}.1.norm")
        tr[f"FeedForward_{i}"] = {
            "Dense_0": _linear(sd, f"{base}.1.fn.net.0"),
            "Dense_1": _linear(sd, f"{base}.1.fn.net.3"),
        }
        i += 1
    if i == 0:
        raise KeyError(
            "no transformer.layers.* keys — is this a VqSparseDiffusionModel "
            "state_dict (strip any 'model_state_dict' wrapper first)?"
        )
    out["transformer"] = tr
    return out


def tokenizer_state_from_torch(sd: Mapping):
    """reference state_dict -> `TokenizerState` (jnp arrays)."""
    import jax.numpy as jnp

    from world_modelz_tpu.models import TokenizerState
    from world_modelz_tpu.ops.vq import VQState

    params, stats, vq = tokenizer_trees_from_torch(sd)
    to_j = lambda tree: __import__("jax").tree_util.tree_map(
        jnp.asarray, tree
    )
    return TokenizerState(
        params=to_j(params),
        batch_stats=to_j(stats),
        vq=VQState(**{k: jnp.asarray(v) for k, v in vq.items()}),
    )
