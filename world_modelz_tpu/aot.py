"""AOT-exported serving artifacts (jax.export).

Packages the rollout service's two device programs — the seed-clip
ENCODER (pixels -> token context) and the ROLLOUT (k-step iterative
unmask + decode, serve.py:161-183) — as serialized StableHLO, one pair
per ladder batch size, next to one copy of the weights and a metadata
JSON:

    artifact/
      meta.json             frames/iterations/topk/shapes/sizes/platforms
      weights.npz           params + tokenizer state, path-flattened
      encode_b{N}.bin       jax.export blobs (weights passed as args, so
      rollout_b{N}.bin      the programs stay small and weights single-copy)

A serving process `AOTPrograms.load()`s the directory and serves WITHOUT
the model code, flax rehydration, or the training checkpoint — the
deployment artifact is decoupled from the training codebase and pinned
to the exact traced computation. The reference has no serving story at
all (its eval re-runs main2.py per clip, minecraft/main2.py:59-131);
this is the TPU-production counterpart.

Determinism: the exported rollout takes the RAW PRNG key data as a
uint32 operand, so a live `RolloutService` and an AOT one driven by the
same seed produce identical clips (tested bit-for-bit on CPU).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_META = "meta.json"
_WEIGHTS = "weights.npz"
# npz key separator; parameter path components never contain it
_SEP = "//"


def _register_serializations() -> None:
    """Teach jax.export to (de)serialize this package's pytree nodes.

    TokenizerState and VQState (flax structs with no static fields —
    auxdata is the empty tuple) ride inside every tokenizer state."""
    from jax import export as jexport

    from world_modelz_tpu.models.tokenizer import TokenizerState
    from world_modelz_tpu.ops.vq import VQState

    for cls in (TokenizerState, VQState):
        try:
            jexport.register_pytree_node_serialization(
                cls,
                serialized_name=f"{cls.__module__}.{cls.__qualname__}",
                serialize_auxdata=lambda aux: b"",
                deserialize_auxdata=lambda b: (),
            )
        except ValueError:
            pass  # already registered in this process


_register_serializations()


def _to_plain(tree: Any) -> Any:
    """Mappings -> plain dicts so export-time and load-time pytree
    structures agree (orbax restores dicts; flax inits FrozenDicts)."""
    if isinstance(tree, Mapping):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for path, leaf in flat.items():
        node = root
        parts = path.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return root


def ladder(batch_size: int) -> List[int]:
    """Power-of-two compiled-size ladder up to batch_size (serve.py)."""
    sizes, s = [], 1
    while s < batch_size:
        sizes.append(s)
        s *= 2
    sizes.append(batch_size)
    return sorted(set(sizes))


def export_service(
    out_dir: str,
    tok: Any,
    tok_state: Any,
    model: Any,
    params: Any,
    *,
    num_frames: int,
    num_iterations: int = 30,
    sample_topk: int = -1,
    batch_size: int = 8,
    seed_frames: int,
    image_size: int,
    channels: int,
    platforms: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Trace + serialize the service programs for every ladder size.

    `platforms` defaults to ('tpu', 'cpu') — one artifact serves both the
    production chip and CPU smoke tests. Tracing is backend-free; no
    device compile happens here.
    """
    from jax import export as jexport

    from world_modelz_tpu.diffusion import rollout_frames
    from world_modelz_tpu.serve import rolled_context

    from world_modelz_tpu.models.tokenizer import TokenizerState

    params = _to_plain(params)
    # canonical tokenizer state: typed structs (the encode/decode code
    # reads attributes) around plain-dict fields, so the export-time and
    # load-time pytree structures agree exactly
    tok_state = TokenizerState(
        params=_to_plain(tok_state.params),
        batch_stats=_to_plain(tok_state.batch_stats),
        vq=tok_state.vq,
    )
    platforms = tuple(platforms or ("tpu", "cpu"))
    k = tok.num_embeddings
    th, tw = tok.token_grid_shape((image_size, image_size))

    def encode_program(tok_state, seeds):
        b, s, h, w, c = seeds.shape
        tokens = tok.encode(tok_state, seeds.reshape(b * s, h, w, c))
        return tokens.reshape(b, s, *tokens.shape[1:])

    def rollout_program(params, tok_state, tokens, key_data):
        key = jax.random.wrap_key_data(key_data)
        b = tokens.shape[0]
        gen = rollout_frames(
            key,
            lambda z: model.apply({"params": params}, z),
            tokens,
            num_frames=num_frames,
            num_classes=k,
            mask_token=k,
            num_iterations=num_iterations,
            sample_topk=sample_topk,
        )
        t = gen.shape[1]
        decoded = tok.decode(tok_state, gen.reshape(b * t, *gen.shape[2:]))
        return (
            decoded.reshape(b, t, *decoded.shape[1:]),
            rolled_context(tokens, gen),
        )

    os.makedirs(out_dir, exist_ok=True)
    shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype),
        (params, tok_state),
    )
    p_spec, ts_spec = shapes
    key_spec = jax.ShapeDtypeStruct(
        jax.random.key_data(jax.random.PRNGKey(0)).shape, jnp.uint32
    )

    sizes = ladder(batch_size)
    for b in sizes:
        seeds_spec = jax.ShapeDtypeStruct(
            (b, seed_frames, image_size, image_size, channels), jnp.float32
        )
        tokens_spec = jax.ShapeDtypeStruct(
            (b, seed_frames, th, tw), jnp.int32
        )
        enc = jexport.export(
            jax.jit(encode_program), platforms=platforms
        )(ts_spec, seeds_spec)
        rol = jexport.export(
            jax.jit(rollout_program), platforms=platforms
        )(p_spec, ts_spec, tokens_spec, key_spec)
        with open(os.path.join(out_dir, f"encode_b{b}.bin"), "wb") as f:
            f.write(enc.serialize())
        with open(os.path.join(out_dir, f"rollout_b{b}.bin"), "wb") as f:
            f.write(rol.serialize())

    np.savez(
        os.path.join(out_dir, _WEIGHTS),
        **_flatten(
            {
                "params": params,
                "tok": {
                    "params": tok_state.params,
                    "batch_stats": tok_state.batch_stats,
                    "vq": {
                        "codebook": tok_state.vq.codebook,
                        "cluster_size": tok_state.vq.cluster_size,
                        "activation_count": tok_state.vq.activation_count,
                        "accumulated_error": tok_state.vq.accumulated_error,
                    },
                },
            }
        ),
    )
    meta = {
        "format": 1,
        "num_frames": num_frames,
        "num_iterations": num_iterations,
        "sample_topk": sample_topk,
        "sizes": sizes,
        "seed_frames": seed_frames,
        "image_size": image_size,
        "channels": channels,
        "token_hw": [th, tw],
        "num_embeddings": k,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class AOTPrograms:
    """A loaded serving artifact: per-size encode/rollout callables.

    No model code runs behind these — each call dispatches a deserialized
    StableHLO program (compiled once per process by the backend; pair
    with the persistent compilation cache to skip even that on restart).
    """

    def __init__(self, meta: Dict[str, Any], weights: Any, programs):
        self.meta = meta
        self.sizes: List[int] = list(meta["sizes"])
        self._params = weights["params"]
        self._tok_state = weights["tok_state"]
        self._programs = programs  # {("encode"|"rollout", size): Exported}

    @classmethod
    def load(cls, path: str) -> "AOTPrograms":
        from jax import export as jexport

        with open(os.path.join(path, _META)) as f:
            meta = json.load(f)
        if meta.get("format") != 1:
            raise ValueError(f"unknown artifact format {meta.get('format')}")
        from world_modelz_tpu.models.tokenizer import TokenizerState
        from world_modelz_tpu.ops.vq import VQState

        npz = np.load(os.path.join(path, _WEIGHTS))
        flat = _unflatten({k: npz[k] for k in npz.files})
        weights = {
            "params": flat["params"],
            "tok_state": TokenizerState(
                params=flat["tok"]["params"],
                batch_stats=flat["tok"].get("batch_stats", {}),
                vq=VQState(**flat["tok"]["vq"]),
            ),
        }
        programs = {}
        for b in meta["sizes"]:
            for kind in ("encode", "rollout"):
                with open(os.path.join(path, f"{kind}_b{b}.bin"), "rb") as f:
                    programs[(kind, b)] = jexport.deserialize(
                        bytearray(f.read())
                    )
        return cls(meta, weights, programs)

    def encode(self, seeds: jnp.ndarray) -> jnp.ndarray:
        b = seeds.shape[0]
        if b not in self.sizes:
            raise ValueError(f"batch {b} not in exported ladder {self.sizes}")
        return self._programs[("encode", b)].call(self._tok_state, seeds)

    def rollout(self, tokens: jnp.ndarray, key) -> tuple:
        b = tokens.shape[0]
        if b not in self.sizes:
            raise ValueError(f"batch {b} not in exported ladder {self.sizes}")
        return self._programs[("rollout", b)].call(
            self._params, self._tok_state, tokens, jax.random.key_data(key)
        )
