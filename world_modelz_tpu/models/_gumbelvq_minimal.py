"""Minimal torch GumbelVQ — interface-compatible stand-in for `taming`.

The reference's Sber variant loads a pretrained taming-transformers
`GumbelVQ` VQGAN (minecraft/sparse_diffusion_sber.py:23-49) and uses exactly
three entry points: `model.encode(x)[2][2]` flat token indices,
`model.quantize.get_codebook_entry(indices, (b, h, w, c))`, and
`model.decode(z)` (:162-164, :452-453). This environment has no `taming`
package and no egress to fetch one, so `TamingGumbelVQAdapter` falls back to
this minimal, independently written implementation of the published
architecture (conv encoder/decoder + Gumbel-softmax codebook): the adapter's
full code path — config parsing, construction, checkpoint load, NHWC/range
marshalling, encode/decode — runs for real, and only pretrained *weights*
remain unexercised. With a real taming checkpoint whose config matches, the
state dict loads into the same parameter names where shapes agree
(`strict=False`), but bit-parity with taming is NOT claimed — use the real
package for that.

This is NOT a copy of taming-transformers code; it implements the minimal
contract above from the architecture description.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def build(ddconfig: Dict[str, Any], n_embed: int, embed_dim: int, **_unused):
    """Construct the minimal GumbelVQ from a taming-style config mapping.

    Accepts (and ignores) the extra taming config keys (kl_weight,
    temperature scheduling, loss config, ...) so real config yamls parse.
    """
    import torch
    from torch import nn

    ch = int(ddconfig.get("ch", 64))
    ch_mult = tuple(ddconfig.get("ch_mult", (1, 2, 4)))
    z_channels = int(ddconfig["z_channels"])
    in_channels = int(ddconfig.get("in_channels", 3))
    out_ch = int(ddconfig.get("out_ch", 3))

    def norm(c):
        return nn.GroupNorm(num_groups=min(8, c), num_channels=c)

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            layers = [nn.Conv2d(in_channels, ch * ch_mult[0], 3, padding=1)]
            prev = ch * ch_mult[0]
            for mult in ch_mult[1:]:
                cur = ch * mult
                layers += [
                    norm(prev),
                    nn.SiLU(),
                    nn.Conv2d(prev, cur, 4, stride=2, padding=1),
                ]
                prev = cur
            layers += [norm(prev), nn.SiLU(), nn.Conv2d(prev, z_channels, 1)]
            self.net = nn.Sequential(*layers)

        def forward(self, x):
            return self.net(x)

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            mults = tuple(reversed(ch_mult))
            prev = ch * mults[0]
            layers = [nn.Conv2d(z_channels, prev, 3, padding=1)]
            for mult in mults[1:]:
                cur = ch * mult
                layers += [
                    norm(prev),
                    nn.SiLU(),
                    nn.ConvTranspose2d(prev, cur, 4, stride=2, padding=1),
                ]
                prev = cur
            layers += [
                norm(prev),
                nn.SiLU(),
                nn.Conv2d(prev, out_ch, 3, padding=1),
                nn.Tanh(),  # decode() contract: [-1, 1] images
            ]
            self.net = nn.Sequential(*layers)

        def forward(self, z):
            return self.net(z)

    class GumbelQuantize(nn.Module):
        """proj -> (hard argmax at eval) -> embedding lookup."""

        def __init__(self):
            super().__init__()
            self.proj = nn.Conv2d(z_channels, n_embed, 1)
            self.embed = nn.Embedding(n_embed, embed_dim)

        def forward(self, h):
            import torch

            logits = self.proj(h)  # (B, K, h, w)
            if self.training:
                soft = torch.nn.functional.gumbel_softmax(
                    logits, tau=1.0, dim=1, hard=True
                )
                z_q = torch.einsum("bkhw,kd->bdhw", soft, self.embed.weight)
                indices = soft.argmax(dim=1)
            else:
                indices = logits.argmax(dim=1)  # (B, h, w)
                z_q = self.embed(indices).permute(0, 3, 1, 2)
            diff = torch.zeros((), device=h.device)
            return z_q, diff, (None, None, indices.reshape(-1))

        def get_codebook_entry(self, indices, shape):
            # taming shape spec: (B, H, W, C) — sparse_diffusion_sber.py:162
            b, h, w, _c = shape
            z_q = self.embed(indices.reshape(b, h, w))
            return z_q.permute(0, 3, 1, 2).contiguous()

    class MinimalGumbelVQ(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.decoder = Decoder()
            self.quantize = GumbelQuantize()
            self.post_quant_conv = nn.Conv2d(embed_dim, z_channels, 1)

        def encode(self, x):
            h = self.encoder(x)
            return self.quantize(h)

        def decode(self, z_q):
            return self.decoder(self.post_quant_conv(z_q))

        def load_state_dict(self, sd, strict=False):
            """Best-effort load: keep entries whose name+shape match."""
            own = super().state_dict()
            kept = {
                k: v
                for k, v in sd.items()
                if k in own and tuple(v.shape) == tuple(own[k].shape)
            }
            return super().load_state_dict(kept, strict=False)

    return MinimalGumbelVQ()


class AttrDict(dict):
    """yaml mapping with attribute access — omegaconf-free config loads."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return AttrDict(v) if isinstance(v, dict) else v


def load_config(path: str) -> AttrDict:
    import yaml

    with open(path) as f:
        return AttrDict(yaml.safe_load(f))
