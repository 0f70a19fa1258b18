"""Export framework weights INTO reference (PyTorch) state_dicts.

Inverse of `utils/torch_import.py` (whose torch->JAX mapping is
golden-tested to exact token indices / ~1e-4 logits). This direction
enables the literal BASELINE.md north-star check: push OUR trained
weights into the reference `VqVideoDiffusionModel` + `VqAutoEncoder`
(vq-video-diffusion/main.py:25-48, minecraft/train_vqae.py:20-55), run
the reference's own `evaluate_model` sampler
(vq-video-diffusion/main.py:51-124) on CPU, and score
reference-generated vs framework-generated rollouts with the same
calibrated FVD (benchmarks/fvd_two_framework.py).

Layout inverses:
- flax Conv `kernel` (kh, kw, I, O)  ->  torch `Conv2d.weight` (O, I, kh, kw)
- flax Dense `kernel` (in, out)      ->  torch `Linear.weight` (out, in)
- flax scale/bias + batch_stats      ->  torch BN weight/bias/running_*
  (+ a zero `num_batches_tracked`, required by strict load_state_dict)
- `VQState.codebook` (L, K, D)       ->  `vq.embedding` (L, K, D) — the
  layout both reference dirs register (vq/vq.py:15-16)

Returns plain numpy dicts; the callers wrap them in torch tensors (this
module never imports torch).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(a) -> np.ndarray:
    return np.asarray(a, np.float32)


def _conv_out(sd: Dict, key: str, p) -> None:
    sd[f"{key}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{key}.bias"] = _np(p["bias"])


def _bn_out(sd: Dict, key: str, p, s) -> None:
    sd[f"{key}.weight"] = _np(p["scale"])
    sd[f"{key}.bias"] = _np(p["bias"])
    sd[f"{key}.running_mean"] = _np(s["mean"])
    sd[f"{key}.running_var"] = _np(s["var"])
    # persistent torch buffer; strict load_state_dict requires it
    sd[f"{key}.num_batches_tracked"] = np.asarray(0, np.int64)


def _linear_out(sd: Dict, key: str, p) -> None:
    sd[f"{key}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        sd[f"{key}.bias"] = _np(p["bias"])


def _layernorm_out(sd: Dict, key: str, p) -> None:
    sd[f"{key}.weight"] = _np(p["scale"])
    sd[f"{key}.bias"] = _np(p["bias"])


def video_state_dict_from_params(params) -> Dict[str, np.ndarray]:
    """flax `VqVideoDiffusionModel` params -> reference state_dict
    (inverse of torch_import.video_params_from_torch)."""
    tr = params["transformer"]
    sd: Dict[str, np.ndarray] = {}
    for name in ("embedding", "pos_emb_s", "pos_emb_h", "pos_emb_w"):
        sd[f"transformer.{name}.weight"] = _np(tr[name]["embedding"])
    i = 0
    while f"attn_norm_{i}" in tr:
        base = f"transformer.layers.{i}"
        _layernorm_out(sd, f"{base}.0.norm", tr[f"attn_norm_{i}"])
        attn = tr[f"attn_{i}"]
        for proj in ("to_q", "to_k", "to_v"):
            _linear_out(sd, f"{base}.0.fn.{proj}", attn[proj])
        if "to_out" in attn:
            _linear_out(sd, f"{base}.0.fn.to_out.0", attn["to_out"])
        _layernorm_out(sd, f"{base}.1.norm", tr[f"ff_norm_{i}"])
        _linear_out(sd, f"{base}.1.fn.net.0", tr[f"ff_{i}"]["Dense_0"])
        _linear_out(sd, f"{base}.1.fn.net.3", tr[f"ff_{i}"]["Dense_1"])
        i += 1
    if i == 0:
        raise KeyError("no attn_norm_* layers in params['transformer']")
    _linear_out(sd, "logit_proj", params["logit_proj"])
    return sd


def _residual_out(sd: Dict, base: str, p, s) -> None:
    _conv_out(sd, f"{base}._block.0", p["Conv_0"])
    _bn_out(sd, f"{base}._block.1", p["BatchNorm_0"], s["BatchNorm_0"])
    _conv_out(sd, f"{base}._block.3", p["Conv_1"])
    _bn_out(sd, f"{base}._block.4", p["BatchNorm_1"], s["BatchNorm_1"])
    if "Conv_2" in p:
        _conv_out(sd, f"{base}.downsample.0", p["Conv_2"])
        _bn_out(sd, f"{base}.downsample.1", p["BatchNorm_2"],
                s["BatchNorm_2"])


def tokenizer_state_dict_from_state(state) -> Dict[str, np.ndarray]:
    """framework `TokenizerState` -> reference `VqAutoEncoder` state_dict
    (inverse of torch_import.tokenizer_trees_from_torch).

    The reference VQ's activation/error stats are non-persistent buffers
    (vq/vq.py:18-19) and are omitted — strict load_state_dict neither
    needs nor accepts them."""
    params, stats = state.params, state.batch_stats
    sd: Dict[str, np.ndarray] = {}

    enc_p, enc_s = params["encoder"], stats["encoder"]
    _conv_out(sd, "encoder._conv_1", enc_p["Conv_0"])
    stack_p = enc_p["ResidualStack_0"]
    stack_s = enc_s["ResidualStack_0"]
    i = 0
    while f"Residual_{i}" in stack_p:
        _residual_out(
            sd, f"encoder._residual_stack._stack.{i}",
            stack_p[f"Residual_{i}"], stack_s[f"Residual_{i}"],
        )
        i += 1

    dec_p, dec_s = params["decoder"], stats["decoder"]
    _conv_out(sd, "decoder.decoder_stack.0", dec_p["Conv_0"])
    j = 0
    while f"UpscaleResidual_{j}" in dec_p:
        base = f"decoder.decoder_stack.{j + 1}"
        p, s = dec_p[f"UpscaleResidual_{j}"], dec_s[f"UpscaleResidual_{j}"]
        _bn_out(sd, f"{base}.bn1", p["BatchNorm_0"], s["BatchNorm_0"])
        _conv_out(sd, f"{base}.conv1", p["Conv_0"])
        _bn_out(sd, f"{base}.bn2", p["BatchNorm_1"], s["BatchNorm_1"])
        _conv_out(sd, f"{base}.conv2", p["Conv_1"])
        if "Conv_2" in p:
            _conv_out(sd, f"{base}.conv_residual", p["Conv_2"])
        j += 1
    _conv_out(sd, f"decoder.decoder_stack.{j + 1}", dec_p["Conv_1"])

    # both reference dirs register (num_latents, K, D) buffers
    # (vq/vq.py:15-16, vq-video-diffusion/vq.py:16) — keep the layout
    sd["vq.embedding"] = _np(state.vq.codebook)
    sd["vq.cluster_size"] = _np(state.vq.cluster_size)
    return sd
