"""CLI smoke tests: each trainer runs a few steps end-to-end on CPU and
produces its artifacts. Marked slow (several minutes total)."""

import dataclasses
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tokenizer_ckpt(tmp_path_factory):
    from world_modelz_tpu.cli.train_vqae import TrainVqaeConfig, train

    out = str(tmp_path_factory.mktemp("tok"))
    cfg = TrainVqaeConfig(
        batch_size=8, image_size=32, max_steps=12, downscale_steps=2,
        embedding_dim=8, hidden_planes=16, num_embeddings=32,
        checkpoint_interval=12, vq_reuse_interval=6, log_interval=6,
        output_dir=out, name="t",
    )
    _state, info = train(cfg)
    return info["checkpoint"]


def test_train_vqae_and_rehydrate(tokenizer_ckpt):
    import jax
    import jax.numpy as jnp

    from world_modelz_tpu.cli.train_vqae import load_tokenizer

    tok, state, config = load_tokenizer(tokenizer_ckpt)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    z = tok.encode(state, x)
    assert z.shape == (2, 8, 8)
    assert bool(jnp.isfinite(tok.decode(state, z)).all())
    assert config["num_embeddings"] == 32


def test_video_diffusion_cli(tokenizer_ckpt, tmp_path):
    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        train,
    )

    out = str(tmp_path)
    cfg = VideoDiffusionConfig(
        dataset="synthetic", decoder_model=tokenizer_ckpt,
        batch_size=8, n_past=2, image_size=32, max_steps=6, warmup=2,
        dim=16, extents=(1, 1, 1), depth=1, mlp_dim=16, dim_head=8,
        heads=2, eval_interval=6, eval_timesteps=1, eval_batch_size=2,
        num_eval_iterations=2, checkpoint_interval=6, log_interval=3,
        buffer_size=150, output_dir=out, name="vd",
    )
    train(cfg)
    files = os.listdir(out)
    assert any(f.startswith("step_") for f in files)
    assert any(f.endswith("_base.png") for f in files)
    assert any(f.endswith("_base.gif") for f in files)


def test_video_diffusion_cli_fused_dispatch(tokenizer_ckpt, tmp_path):
    """--steps_per_dispatch > 1: k optimizer steps fused into one compiled
    program. Dispatch boundaries must still land exactly on the log/
    checkpoint/eval step multiples (max_steps=7 with k=3 forces uneven
    dispatch lengths), and resume from a mid-run checkpoint works."""
    import json

    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        train,
    )

    out = str(tmp_path)
    cfg = VideoDiffusionConfig(
        dataset="synthetic", decoder_model=tokenizer_ckpt,
        batch_size=8, n_past=2, image_size=32, max_steps=7, warmup=2,
        steps_per_dispatch=3,
        dim=16, extents=(1, 1, 1), depth=1, mlp_dim=16, dim_head=8,
        heads=2, eval_interval=0, checkpoint_interval=4, log_interval=2,
        histogram_interval=0, buffer_size=150, output_dir=out, name="vdk",
    )
    train(cfg)
    assert os.path.isdir(os.path.join(out, "step_0000004"))
    steps = [
        json.loads(ln)["step"]
        for ln in open(os.path.join(out, "vdk_metrics.jsonl"))
        if "loss" in json.loads(ln)
    ]
    # log points at exact multiples of log_interval (plus the warmup point)
    assert steps == [1, 2, 4, 6]

    cfg2 = dataclasses.replace(
        cfg, checkpoint=os.path.join(out, "step_0000004"), max_steps=10
    )
    train(cfg2)
    assert os.path.isdir(os.path.join(out, "step_0000008"))


def test_video_diffusion_cli_sequence_parallel(tokenizer_ckpt, tmp_path):
    """Training with --n_seq 2: frame axis sharded over the mesh's 'seq'
    axis through the halo-exchange attention (parallel/sequence.py)."""
    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        train,
    )

    out = str(tmp_path)
    cfg = VideoDiffusionConfig(
        dataset="synthetic", decoder_model=tokenizer_ckpt,
        batch_size=8, n_past=3, n_seq=2, image_size=32, max_steps=6,
        warmup=2, dim=16, extents=(1, 1, 1), depth=1, mlp_dim=16,
        dim_head=8, heads=2, eval_interval=6, eval_timesteps=1,
        eval_batch_size=2, num_eval_iterations=2, checkpoint_interval=6,
        log_interval=3, histogram_interval=0, buffer_size=150,
        output_dir=out, name="vds",
    )
    train(cfg)
    files = os.listdir(out)
    assert any(f.startswith("step_") for f in files)
    assert any(f.endswith("_base.png") for f in files)


def test_video_diffusion_cli_fsdp(tokenizer_ckpt, tmp_path):
    """Training with --fsdp: params/EMA/optimizer moments sharded over
    'data' (parallel/fsdp.py), full loop incl. checkpoint + resume
    restore path."""
    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        train,
    )

    out = str(tmp_path)
    cfg = VideoDiffusionConfig(
        dataset="synthetic", decoder_model=tokenizer_ckpt,
        batch_size=8, n_past=3, fsdp=True, image_size=32, max_steps=6,
        warmup=2, dim=64, extents=(1, 1, 1), depth=1, mlp_dim=64,
        dim_head=8, heads=2, eval_interval=6, eval_timesteps=1,
        eval_batch_size=2, num_eval_iterations=2, checkpoint_interval=6,
        log_interval=3, histogram_interval=0, buffer_size=150,
        output_dir=out, name="vdf",
    )
    train(cfg)
    files = os.listdir(out)
    assert any(f.startswith("step_") for f in files)


def test_sparse_diffusion_cli(tokenizer_ckpt, tmp_path):
    from world_modelz_tpu.cli.sparse_diffusion import (
        SparseDiffusionConfig,
        train,
    )

    out = str(tmp_path)
    cfg = SparseDiffusionConfig(
        decoder_model=tokenizer_ckpt, batch_size=2, eval_batch_size=1,
        max_steps=4, warmup=2, S=4, H=8, W=8, image_size=32,
        num_context=16, dim=16, mlp_dim=16, heads=2, depth=1,
        eval_interval=4, num_eval_iterations=2, checkpoint_interval=0,
        buffer_size=120, max_segment_length=60, log_interval=2,
        output_dir=out, name="sd",
    )
    train(cfg)
    assert any(
        f.endswith("_base.png") for f in os.listdir(out)
    )


def test_sparse_diffusion_cli_grain_pipeline(tokenizer_ckpt, tmp_path):
    """--data_pipeline grain over the trajectory source: deterministic
    record stream (data/trajectory.py TrajectoryClipDataset) with the
    consumed position sidecar'd into each checkpoint and restored."""
    from world_modelz_tpu.cli.sparse_diffusion import (
        SparseDiffusionConfig,
        train,
    )

    out = str(tmp_path)
    cfg = SparseDiffusionConfig(
        decoder_model=tokenizer_ckpt, data_pipeline="grain",
        batch_size=2, eval_batch_size=1,
        max_steps=4, warmup=2, S=4, H=8, W=8, image_size=32,
        num_context=16, dim=16, mlp_dim=16, heads=2, depth=1,
        eval_interval=0, checkpoint_interval=4, log_interval=2,
        output_dir=out, name="sdg",
    )
    train(cfg)
    ckpt = os.path.join(out, "step_0000004")
    assert os.path.exists(os.path.join(ckpt, "grain_state.json"))

    cfg2 = dataclasses.replace(cfg, checkpoint=ckpt, max_steps=8)
    train(cfg2)
    assert os.path.isdir(os.path.join(out, "step_0000008"))


def test_video_diffusion_cli_grain_trajectory(tokenizer_ckpt, tmp_path):
    """The video trainer's --data_pipeline grain over a trajectory source
    (synthetic): uint8 record stream through the standard clip_fn path."""
    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        train,
    )

    out = str(tmp_path)
    cfg = VideoDiffusionConfig(
        dataset="synthetic", data_pipeline="grain",
        decoder_model=tokenizer_ckpt,
        batch_size=8, n_past=2, image_size=32, max_steps=4, warmup=2,
        dim=16, extents=(1, 1, 1), depth=1, mlp_dim=16, dim_head=8,
        heads=2, eval_interval=4, eval_timesteps=1, eval_batch_size=2,
        num_eval_iterations=2, checkpoint_interval=4, log_interval=2,
        histogram_interval=0, output_dir=out, name="vdgt",
    )
    train(cfg)
    files = os.listdir(out)
    assert any(f.startswith("step_") for f in files)
    assert os.path.exists(
        os.path.join(out, "step_0000004", "grain_state.json")
    )


def test_sparse_diffusion_cli_fused_dispatch(tokenizer_ckpt, tmp_path):
    """--steps_per_dispatch: fused k-step programs must respect the
    change_batch_interval boundary (batch refresh at steps == 1 mod cbi)
    and the checkpoint/log multiples; uneven max_steps exercises the
    shorter tail program."""
    import json

    from world_modelz_tpu.cli.sparse_diffusion import (
        SparseDiffusionConfig,
        train,
    )

    out = str(tmp_path)
    cfg = SparseDiffusionConfig(
        decoder_model=tokenizer_ckpt, batch_size=2, eval_batch_size=1,
        max_steps=7, warmup=2, S=4, H=8, W=8, image_size=32,
        num_context=16, dim=16, mlp_dim=16, heads=2, depth=1,
        steps_per_dispatch=4, change_batch_interval=3,
        eval_interval=0, checkpoint_interval=6, histogram_interval=0,
        buffer_size=120, max_segment_length=60, log_interval=2,
        output_dir=out, name="sdk",
    )
    train(cfg)
    assert os.path.isdir(os.path.join(out, "step_0000006"))
    steps = [
        json.loads(ln)["step"]
        for ln in open(os.path.join(out, "sdk_metrics.jsonl"))
        if "loss" in json.loads(ln)
    ]
    assert steps == [1, 2, 4, 6]


def test_sparse_diffusion_cli_pipelined(tokenizer_ckpt, tmp_path):
    """--n_pipe 2: the transformer depth streams over a 2-stage pipeline
    (('pipe','data','model') mesh) inside the jitted train step."""
    from world_modelz_tpu.cli.sparse_diffusion import (
        SparseDiffusionConfig,
        train,
    )

    out = str(tmp_path)
    cfg = SparseDiffusionConfig(
        decoder_model=tokenizer_ckpt, batch_size=4, eval_batch_size=1,
        max_steps=3, warmup=2, S=4, H=8, W=8, image_size=32,
        num_context=16, dim=16, mlp_dim=16, heads=2, depth=2,
        n_pipe=2, n_micro=2,
        eval_interval=0, checkpoint_interval=3, buffer_size=120,
        max_segment_length=60, log_interval=1, output_dir=out, name="sdp",
    )
    train(cfg)
    assert os.path.isdir(os.path.join(out, "step_0000003"))


def test_sparse_diffusion_cli_moe(tokenizer_ckpt, tmp_path):
    """--moe_experts 2: every FFN is an expert-parallel MoE; the aux
    load-balance loss joins the objective and training still converges
    sanely for a few steps (VERDICT r2 #5: MoE as a trainer feature)."""
    from world_modelz_tpu.cli.sparse_diffusion import (
        SparseDiffusionConfig,
        train,
    )

    out = str(tmp_path)
    cfg = SparseDiffusionConfig(
        decoder_model=tokenizer_ckpt, batch_size=2, eval_batch_size=1,
        max_steps=3, warmup=2, S=4, H=8, W=8, image_size=32,
        num_context=16, dim=16, mlp_dim=16, heads=2, depth=1,
        moe_experts=2, moe_capacity_factor=2.0,
        eval_interval=0, checkpoint_interval=3, buffer_size=120,
        max_segment_length=60, log_interval=1, output_dir=out, name="sdm",
    )
    train(cfg)
    assert os.path.isdir(os.path.join(out, "step_0000003"))


def test_sample_frames_and_make_gif(tmp_path):
    from world_modelz_tpu.cli.make_gif import MakeGifConfig, run as run_gif
    from world_modelz_tpu.cli.sample_frames import (
        SampleFramesConfig,
        run as run_etl,
    )

    out = str(tmp_path / "frames")
    manifest = run_etl(
        SampleFramesConfig(
            output_dir=out, max_trajectories=1, skip_frames_min=20,
            skip_frames_max=30,
        )
    )
    assert len(manifest) > 3
    assert all(os.path.isfile(f) for f in manifest[:3])

    gif = run_gif(
        MakeGifConfig(
            pattern=os.path.join(os.path.dirname(manifest[0]), "*.png"),
            output=str(tmp_path / "out.gif"),
        )
    )
    assert os.path.getsize(gif) > 0


def test_masked_denoise_cli(tmp_path):
    from world_modelz_tpu.cli.masked_denoise import (
        MaskedDenoiseConfig,
        train,
    )

    cfg = MaskedDenoiseConfig(
        batch_size=4, image_size=32, level=3, d_model=32, depth=1,
        codebook_size=16, vq_steps=5, max_steps=5, eval_interval=5,
        eval_batch_size=2, num_eval_iterations=2, checkpoint_interval=0,
        log_interval=5, output_dir=str(tmp_path), name="md",
    )
    train(cfg)
    assert any(
        f.endswith(".png") for f in os.listdir(tmp_path)
    )


def test_video_diffusion_resume(tokenizer_ckpt, tmp_path):
    """Checkpoint/resume restores step counter and all state trees
    (the reference restarted at step 1, SURVEY.md §5)."""
    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        train,
    )

    base = dict(
        dataset="synthetic", decoder_model=tokenizer_ckpt,
        batch_size=8, n_past=2, image_size=32, warmup=2,
        dim=16, extents=(1, 1, 1), depth=1, mlp_dim=16, dim_head=8,
        heads=2, ema_decay=0.99, eval_interval=0, checkpoint_interval=3,
        log_interval=3, buffer_size=150, output_dir=str(tmp_path), name="r",
    )
    train(VideoDiffusionConfig(**base, max_steps=3))
    assert os.path.isdir(tmp_path / "step_0000003")
    train(
        VideoDiffusionConfig(
            **base, max_steps=6,
            checkpoint=str(tmp_path / "step_0000003"),
        )
    )
    assert os.path.isdir(tmp_path / "step_0000006")


def test_tokenizer_resume(tmp_path):
    from world_modelz_tpu.cli.train_vqae import TrainVqaeConfig, train

    base = dict(
        batch_size=8, image_size=32, downscale_steps=2, embedding_dim=8,
        hidden_planes=16, num_embeddings=32, checkpoint_interval=3,
        vq_reuse_interval=0, log_interval=3, output_dir=str(tmp_path),
        name="r",
    )
    train(TrainVqaeConfig(**base, max_steps=3))
    train(
        TrainVqaeConfig(
            **base, max_steps=6,
            checkpoint=str(tmp_path / "step_0000003"),
        )
    )
    assert os.path.isdir(tmp_path / "step_0000006")


def test_som_pipeline_stages(tmp_path):
    """Stages couple through embedded-config checkpoints end-to-end."""
    import numpy as np

    from world_modelz_tpu.cli.som_pipeline import (
        CreateDatasetConfig,
        FinetuneAeConfig,
        TrainAeConfig,
        TrainSomConfig,
        create_diffusion_dataset,
        finetune_ae,
        load_som_ae,
        train_ae,
        train_som,
    )

    out1 = str(tmp_path / "s1")
    _, ckpt1 = train_ae(
        TrainAeConfig(
            batch_size=8, image_size=32, max_steps=4, downscale_steps=2,
            embedding_dim=8, hidden_planes=16, checkpoint_interval=0,
            log_interval=2, output_dir=out1, name="s1",
        )
    )
    out2 = str(tmp_path / "s2")
    _, ckpt2 = train_som(
        TrainSomConfig(
            ae_checkpoint=ckpt1, batch_size=8, image_size=32,
            som_width=8, som_height=8, sigma_begin=4.0, sigma_end=0.5,
            max_steps=3, checkpoint_interval=3, log_interval=1,
            adapt_batch_size=64, output_dir=out2, name="s2",
        )
    )
    out3 = str(tmp_path / "s3")
    _, ckpt3 = finetune_ae(
        FinetuneAeConfig(
            som_checkpoint=ckpt2, batch_size=8, image_size=32,
            max_steps=3, checkpoint_interval=0, log_interval=1,
            som_adapt_batch=32, output_dir=out3, name="s3",
        )
    )
    data = create_diffusion_dataset(
        CreateDatasetConfig(
            checkpoint=ckpt3, batch_size=8, image_size=32,
            max_examples=16, dataset_fn=str(tmp_path / "latents.npz"),
        )
    )
    assert data.shape == (16, 8, 8, 2)
    assert np.abs(data).max() <= 1.0

    # rehydration contract
    ae, state, config = load_som_ae(ckpt3)
    assert state.som.width == 8 and ae.embedding_dim == 8


def test_som_masked_quality_scorers(tmp_path):
    """The SOM-DDPM Fréchet scorer and the masked-denoise PSNR/SSIM scorer
    (benchmarks/quality_som_masked.py, VERDICT r4 #7) run end-to-end on
    tiny trained checkpoints and emit finite, sane numbers. Guards the
    unattended round-collection stage that produces
    artifacts/round5/som_masked_quality.json."""
    from benchmarks.quality_som_masked import score_masked, score_som
    from world_modelz_tpu.cli.masked_denoise import (
        MaskedDenoiseConfig,
        train as train_masked,
    )
    from world_modelz_tpu.cli.som_pipeline import (
        CreateDatasetConfig,
        FinetuneAeConfig,
        TrainAeConfig,
        TrainDiffusionConfig,
        TrainSomConfig,
        create_diffusion_dataset,
        finetune_ae,
        train_ae,
        train_diffusion,
        train_som,
    )

    _, ckpt1 = train_ae(TrainAeConfig(
        batch_size=8, image_size=32, max_steps=4, downscale_steps=2,
        embedding_dim=8, hidden_planes=16, checkpoint_interval=0,
        log_interval=2, output_dir=str(tmp_path / "s1"), name="s1"))
    _, ckpt2 = train_som(TrainSomConfig(
        ae_checkpoint=ckpt1, batch_size=8, image_size=32,
        som_width=8, som_height=8, sigma_begin=4.0, sigma_end=0.5,
        max_steps=3, checkpoint_interval=3, log_interval=1,
        adapt_batch_size=64, output_dir=str(tmp_path / "s2"), name="s2"))
    _, ckpt3 = finetune_ae(FinetuneAeConfig(
        som_checkpoint=ckpt2, batch_size=8, image_size=32,
        max_steps=3, checkpoint_interval=3, log_interval=1,
        som_adapt_batch=32, output_dir=str(tmp_path / "s3"), name="s3"))
    data_fn = str(tmp_path / "latents.npz")
    create_diffusion_dataset(CreateDatasetConfig(
        checkpoint=ckpt3, batch_size=8, image_size=32,
        max_examples=16, dataset_fn=data_fn))
    # GroupNorm(32) in the UNet needs model_channels >= 32.
    train_diffusion(TrainDiffusionConfig(
        input_dataset=data_fn, decoder_model=ckpt3, batch_size=8,
        model_channels=32, num_res_blocks=1, max_steps=3, warmup=1,
        eval_interval=0, eval_timesteps=4, eval_batch_size=2,
        checkpoint_interval=3, log_interval=1,
        output_dir=str(tmp_path / "diff"), name="diff"))

    som = score_som(str(tmp_path / "diff" / "step_0000003"), n=4, seed=0)
    assert som["samples"] == 4
    assert np.isfinite(som["frechet_gen_vs_train"]["fid"])
    assert np.isfinite(som["noise_floor_train_vs_train"]["fid"])

    train_masked(MaskedDenoiseConfig(
        batch_size=4, image_size=32, level=3, d_model=32, depth=1,
        codebook_size=16, vq_steps=5, max_steps=5, eval_interval=0,
        eval_batch_size=2, num_eval_iterations=2, checkpoint_interval=5,
        log_interval=5, output_dir=str(tmp_path / "md"), name="md"))
    mk = score_masked(str(tmp_path / "md" / "step_0000005"), n=4, seed=0,
                      iters=3)
    assert np.isfinite(mk["vq_roundtrip_ceiling_psnr"])
    for row in mk["reconstruction"].values():
        assert np.isfinite(row["psnr_vs_original"])
        assert np.isfinite(row["ssim_vs_original"])
        # token prediction cannot beat emitting the exact tokens
        assert row["psnr_vs_original"] <= mk["vq_roundtrip_ceiling_psnr"] + 0.5


def test_rollout_cli(tokenizer_ckpt, tmp_path):
    from world_modelz_tpu.cli.rollout import RolloutConfig, run
    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        train,
    )

    out = str(tmp_path / "vd")
    train(
        VideoDiffusionConfig(
            dataset="synthetic", decoder_model=tokenizer_ckpt,
            batch_size=8, n_past=2, image_size=32, max_steps=3, warmup=1,
            dim=16, extents=(1, 1, 1), depth=1, mlp_dim=16, dim_head=8,
            heads=2, eval_interval=0, checkpoint_interval=3, log_interval=3,
            buffer_size=150, output_dir=out, name="vd",
        )
    )
    frames = run(
        RolloutConfig(
            checkpoint=f"{out}/step_0000003", batch_size=2, num_frames=2,
            num_eval_iterations=2, output_dir=str(tmp_path / "ro"),
            name="ro", fvd=True, fvd_clips=4, fvd_batch_size=2,
            gt_metrics=True,
        )
    )
    assert frames.shape[:2] == (2, 2)
    assert os.path.isfile(tmp_path / "ro" / "ro.gif")
    import json

    with open(tmp_path / "ro" / "ro_fvd.json") as f:
        rec = json.load(f)
    assert rec["clips"] == 4 and np.isfinite(rec["fvd"])

    with open(tmp_path / "ro" / "ro_gt_metrics.json") as f:
        gt = json.load(f)
    assert len(gt["per_horizon"]) == 2
    assert np.isfinite(gt["mean_psnr"]) and np.isfinite(gt["mean_ssim"])
    # the tokenizer roundtrip heuristically bounds token-space prediction
    # quality; encode argmins in LATENT space so this is not a strict pixel
    # PSNR bound — allow slack so a near-untrained stack can't flake it
    for row in gt["per_horizon"]:
        assert np.isfinite(row["tokenizer_ceiling_psnr"])
        assert row["tokenizer_ceiling_psnr"] >= row["psnr"] - 3.0


def test_video_diffusion_cli_grain_pipeline(tmp_path):
    """--data_pipeline grain: deterministic Grain input stream, with the
    iterator position checkpointed alongside the model and restored on
    resume."""
    from world_modelz_tpu.cli.train_vqae import TrainVqaeConfig
    from world_modelz_tpu.cli.train_vqae import train as tok_train
    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        train,
    )

    tok_out = str(tmp_path / "tok")
    tok_train(TrainVqaeConfig(
        dataset="moving_mnist", image_size=32, in_channels=1,
        batch_size=8, max_steps=30,
        downscale_steps=2, embedding_dim=8, hidden_planes=16,
        num_embeddings=32, checkpoint_interval=30, output_dir=tok_out,
        name="tok",
    ))
    out = str(tmp_path / "vd")
    cfg = VideoDiffusionConfig(
        dataset="moving_mnist", data_pipeline="grain",
        decoder_model=os.path.join(tok_out, "step_0000030"),
        batch_size=8, n_past=2, image_size=32, max_steps=4, warmup=2,
        dim=16, extents=(1, 1, 1), depth=1, mlp_dim=16, dim_head=8,
        heads=2, eval_interval=0, checkpoint_interval=4, log_interval=2,
        output_dir=out, name="vdg",
    )
    train(cfg)
    ckpt = os.path.join(out, "step_0000004")
    assert os.path.exists(os.path.join(ckpt, "grain_state.json"))

    # resume: the input pipeline picks up from the saved position
    cfg2 = dataclasses.replace(cfg, checkpoint=ckpt, max_steps=8)
    train(cfg2)
    assert os.path.isdir(os.path.join(out, "step_0000008"))


def test_video_diffusion_cli_device_composite(tmp_path):
    """--device_composite: sprite trajectories cross host->device and the
    jitted step composites frames (data/device_composite.py). Exercises
    the dict-batch format through the fused k-step dispatch, eval rollout
    and checkpointing."""
    from world_modelz_tpu.cli.train_vqae import TrainVqaeConfig
    from world_modelz_tpu.cli.train_vqae import train as train_vqae
    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        train,
    )

    tok_out = str(tmp_path / "tok1ch")
    _state, info = train_vqae(TrainVqaeConfig(
        dataset="moving_mnist", in_channels=1,
        batch_size=8, image_size=32, max_steps=12, downscale_steps=2,
        embedding_dim=8, hidden_planes=16, num_embeddings=32,
        checkpoint_interval=12, vq_reuse_interval=6, log_interval=6,
        output_dir=tok_out, name="t1",
    ))
    tokenizer_ckpt = info["checkpoint"]

    out = str(tmp_path)
    cfg = VideoDiffusionConfig(
        dataset="moving_mnist", device_composite=True,
        decoder_model=tokenizer_ckpt,
        batch_size=8, n_past=2, image_size=32, digit_size=12,
        max_steps=6, warmup=2, steps_per_dispatch=2,
        dim=16, extents=(1, 1, 1), depth=1, mlp_dim=16, dim_head=8,
        heads=2, eval_interval=6, eval_timesteps=1, eval_batch_size=2,
        num_eval_iterations=2, checkpoint_interval=6, log_interval=3,
        output_dir=out, name="vdc",
    )
    train(cfg)
    files = os.listdir(out)
    assert any(f.startswith("step_") for f in files)
    assert any(f.endswith("_base.png") for f in files)

    # regression: rollout must consume composite-config checkpoints (its
    # clip fns must yield pixels, and uint8 sources must be normalized —
    # both broke silently when introduced)
    from world_modelz_tpu.cli.rollout import RolloutConfig, run

    run(RolloutConfig(
        checkpoint=os.path.join(out, "step_0000006"), batch_size=2,
        num_frames=2, num_eval_iterations=2, gt_metrics=True,
        output_dir=os.path.join(out, "ro"), name="ro",
    ))
    assert os.path.isfile(os.path.join(out, "ro", "ro_gt_metrics.json"))


def test_video_diffusion_device_composite_rejects_grain(tokenizer_ckpt):
    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        train,
    )

    cfg = VideoDiffusionConfig(
        dataset="moving_mnist", device_composite=True,
        data_pipeline="grain", decoder_model=tokenizer_ckpt,
    )
    with pytest.raises(ValueError, match="device_composite"):
        train(cfg)


def test_train_vqae_grain_pipeline_resume(tmp_path):
    """--data_pipeline grain on the tokenizer trainer: deterministic
    record stream whose position rides checkpoints as a sidecar and
    restores on resume."""
    import json

    from world_modelz_tpu.cli.train_vqae import TrainVqaeConfig, train

    out = str(tmp_path)
    cfg = TrainVqaeConfig(
        dataset="moving_mnist", data_pipeline="grain", in_channels=1,
        batch_size=8, image_size=32, max_steps=6, downscale_steps=2,
        embedding_dim=8, hidden_planes=16, num_embeddings=32,
        checkpoint_interval=3, vq_reuse_interval=0, log_interval=3,
        output_dir=out, name="tg",
    )
    train(cfg)
    sidecar = os.path.join(out, "step_0000003", "grain_state.json")
    assert os.path.isfile(sidecar)
    json.loads(open(sidecar, "rb").read())  # grain state is JSON bytes

    cfg2 = dataclasses.replace(
        cfg, checkpoint=os.path.join(out, "step_0000003"), max_steps=9
    )
    train(cfg2)
    assert os.path.isdir(os.path.join(out, "step_0000009"))
