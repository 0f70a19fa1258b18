"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests use the standard JAX trick of forcing N host
platform devices (SURVEY.md §4 implication (d)); no TPU is needed for the
suite.

Note: this environment registers a remote TPU backend via sitecustomize at
interpreter startup and pins ``jax_platforms``; plain ``JAX_PLATFORMS=cpu``
env overrides are ineffective. We must (a) set the host-device-count XLA flag
before the CPU client is instantiated and (b) re-pin the platform through
``jax.config`` after jax import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) >= 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Two-tier test lanes (VERDICT r2 #8): the full `-m "not slow"` lane takes
# ~10 min on this 1-core host; `-m fast` must stay under 3 min. Tests listed
# here (plus everything marked `slow`) are excluded from the fast lane; all
# other tests get the `fast` marker automatically.
# ---------------------------------------------------------------------------

_HEAVY = {
    "test_graft_entry_multichip",
    "test_graft_entry_single",
    "test_unet_forward_backward",
    "test_model_seq_parallel_forward_and_grad_parity",
    "test_sparse_model_pipelined_matches_flax",
    "test_som_autoencoder_roundtrip",
    "test_som_adapt_organizes_colors",
    "test_local3d_transformer_forward_backward",
    "test_native_tokenizer_bridge",
    "test_tiny_extractor_deterministic",
    "test_tokenizer_pallas_vq_backend_matches_xla",
    "test_pipeline_gradients_match_sequential",
    "test_local3d_kernel_gradients_multihead_asymmetric",
    "test_moe_gradients_flow",
    "test_moe_model_matches_reference_impl_incl_grads",
    "test_moe_model_expert_sharded_step",
    "test_local3d_dispatch_tiles_large_grids",
    "test_loss_aware_sampler_biases_toward_lossy_buckets",
    "test_serve_batches_and_resolves",
    "test_serve_concurrent_submitters",
    "test_serve_single_request_uses_small_program",
    "test_local3d_kernel_bf16_path",
    "test_fvd_discriminates",
    "test_encode_decode_roundtrip_identity_on_tokens",
    "test_vmem_guard_and_auto_fallback",
    "test_local3d_tiled_kernel_gradients_match_xla",
    "test_gmlp_shapes_and_vq_projection",
    "test_moe_expert_sharded_matches_unsharded",
    "test_video_diffusion_model_last_frame_logits",
    "test_vq_forward_and_ema_parity",
    "test_vq1_single_codebook",
    "test_local3d_kernel_gradients_match_xla",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _HEAVY:
            item.add_marker(pytest.mark.heavy)
        elif "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
