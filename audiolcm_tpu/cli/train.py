"""Training CLI — `python main.py --base <cfg> -t` parity.

Behavior parity: `main.py:555-845`: multi-YAML merge (left to right) +
`--key value` dotlist overrides, model selection from `model.target`,
LR scaling by devices*batch, logdir layout, resume from logdir/checkpoint.

Dispatch by reference target string:
  ldm.models.diffusion.lcm_audio.LCM_audio        -> LCM distillation
  ldm.models.diffusion.ddpm_audio.LatentDiffusion_audio -> teacher LDM
  ldm.models.autoencoder1d.AutoencoderKL          -> VAE GAN

Each branch builds its jitted step over the data mesh and drives the
generic Trainer loop with orbax checkpoints.
"""

from __future__ import annotations

import argparse
import datetime
import os
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp


def parse_args(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="*", default=[])
    p.add_argument("-t", "--train", action="store_true")
    p.add_argument("-r", "--resume", type=str, default="")
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("--max_epochs", type=int, default=100)
    # logger backend dispatch, main.py:634-658 (TB default, wandb option)
    p.add_argument("--logger", type=str, default="tensorboard",
                   choices=["tensorboard", "wandb"])
    p.add_argument("--scale_lr", action="store_true", default=True)
    args, unknown = p.parse_known_args(argv)
    return args, unknown


def merge_configs(paths: List[str], overrides: List[str]) -> dict:
    """OmegaConf-style left-to-right merge + `--a.b.c value` dotlist."""
    from audiolcm_tpu.config import load_yaml

    def deep_merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep_merge(dst[k], v)
            else:
                dst[k] = v
        return dst

    cfg: dict = {}
    for path in paths:
        deep_merge(cfg, load_yaml(path))
    i = 0
    while i < len(overrides):
        key = overrides[i]
        if key.startswith("--") and i + 1 < len(overrides):
            node = cfg
            parts = key[2:].split(".")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            import yaml as _yaml

            node[parts[-1]] = _yaml.safe_load(overrides[i + 1])
            i += 2
        else:
            i += 1
    return cfg


def _make_logdir(root: str, name: str, base_paths: List[str]) -> str:
    now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
    cfg_name = name or (
        os.path.splitext(os.path.basename(base_paths[0]))[0] if base_paths else "run"
    )
    logdir = os.path.join(root, f"{now}_{cfg_name}")
    os.makedirs(os.path.join(logdir, "checkpoints"), exist_ok=True)
    return logdir


def _build_loader(cfg: dict, batch_size: int, split: str = "train"):
    """Loader factory (DataModuleFromConfig parity, `main.py:180-303`).

    `spec_dir_path` -> single-pool bucketed loader; `main_spec_dir_path` +
    `other_spec_dir_path` (teacher.yaml two-pool schema,
    `joinaudiodataset_struct_sample_anylen.py:97-222`) -> main-pool batches
    interleaved with random other-pool batches whose struct captions are
    synthesized as `<cap& all>`. Validation interleaves too: the reference's
    `_val_dataloader` builds the same DDPIndexBatchSampler over
    (100-row main val carve-out, FULL other pool) — only the main pool has
    a val split (`main.py:248-265`,
    `joinaudiodataset_struct_sample_anylen.py:41-46`).
    """
    from audiolcm_tpu.data.datasets import (
        BucketedBatchLoader,
        SpecDataset,
        TwoPoolBatchLoader,
    )

    data_params = cfg.get("data", {}).get("params", {})
    mel_num = data_params.get("mel_num", 80)
    spec_dir = data_params.get("spec_dir_path") or data_params.get("main_spec_dir_path")
    if spec_dir is None:
        raise ValueError(
            "data.params.spec_dir_path (or main_spec_dir_path) is required for training"
        )
    make = lambda d, split_=split, **kw: BucketedBatchLoader(
        SpecDataset(split_, d, mel_num=mel_num, **kw),
        batch_size,
        num_replicas=jax.process_count(),
        rank=jax.process_index(),
        shuffle=(split == "train"),
    )
    loader = make(spec_dir)
    other_dir = data_params.get("other_spec_dir_path")
    if other_dir:
        loader = TwoPoolBatchLoader(
            loader, make(other_dir, split_="all", synthesize_struct=True)
        )
    return loader


def _make_val_fn(step_fn, val_loader, num_batches: int = 5):
    """validation_step parity: the same losses on val batches with fixed rng
    (`ddpm.py:358-365`); state/optimizer updates are discarded."""

    def val_fn(state, epoch):
        vals: dict = {}
        for i, batch in zip(range(num_batches), val_loader):
            _, metrics = step_fn(state, batch, jax.random.PRNGKey(1234 + i))
            for k, v in metrics.items():
                try:
                    vals.setdefault(k.replace("train/", "val/"), []).append(float(v))
                except (TypeError, ValueError):
                    pass
        return {k: float(np.mean(v)) for k, v in vals.items()}

    return val_fn


def main(argv: Optional[List[str]] = None) -> None:
    from audiolcm_tpu import config as cfg_mod
    from audiolcm_tpu.train.checkpoints import CheckpointManager
    from audiolcm_tpu.train.loop import Trainer, scale_learning_rate

    args, unknown = parse_args(argv)
    cfg = merge_configs(args.base, unknown)
    target = cfg["model"]["target"]
    logdir = _make_logdir(args.logdir, args.name, args.base)
    ndev = jax.device_count()
    batch_size = cfg.get("data", {}).get("params", {}).get("batch_size", 8)

    if "autoencoder1d.AutoencoderKL" in target:
        run_vae_training(cfg, args, logdir, ndev, batch_size)
    elif "lcm_audio.LCM_audio" in target:
        run_lcm_training(cfg, args, logdir, ndev, batch_size)
    elif "ddpm_audio.LatentDiffusion_audio" in target:
        run_teacher_training(cfg, args, logdir, ndev, batch_size)
    else:
        raise ValueError(f"unknown model target {target}")


def run_vae_training(cfg, args, logdir, ndev, batch_size):
    from audiolcm_tpu import config as cfg_mod
    from audiolcm_tpu.data.datasets import collate_tile
    from audiolcm_tpu.models.discriminators import NLayerDiscriminator2D
    from audiolcm_tpu.models.vae1d import AutoencoderKL1D, DiagonalGaussian
    from audiolcm_tpu.train.checkpoints import CheckpointManager
    from audiolcm_tpu.train.loop import Trainer, scale_learning_rate
    from audiolcm_tpu.train.vae_gan import (
        VAEGANConfig,
        init_vae_gan_state,
        make_vae_gan_steps,
    )

    vae = cfg_mod.build_from_target(cfg["model"])
    lossconfig = cfg["model"]["params"].get("lossconfig", {})
    loss_params = lossconfig.get("params", {})
    loss_target = lossconfig.get("target", "losses_audio.contperceptual.x")
    # module segment of e.g. ldm.modules.losses_audio.contperceptual_multiw.LPAPSWithDiscriminator
    loss_module = next(
        (seg for seg in loss_target.split(".") if "perceptual" in seg), "")
    variant = {"contperceptual_multiw": "multiw", "contperceptual_dis": "dis",
               "contperceptual_mask": "mask", "vqperceptual": "vq"}.get(loss_module)
    if variant is not None:
        return run_vae_variant_training(
            cfg, args, logdir, ndev, batch_size, vae, variant, loss_params)
    if loss_module != "contperceptual":
        raise ValueError(
            f"unknown lossconfig.target {loss_target!r}; expected one of "
            "contperceptual[_multiw|_dis|_mask] or vqperceptual")
    gan_cfg = VAEGANConfig(
        disc_start=loss_params.get("disc_start", 80001),
        kl_weight=loss_params.get("kl_weight", 1e-6),
        disc_weight=loss_params.get("disc_weight", 0.5),
        disc_factor=loss_params.get("disc_factor", 2.0),
        r1_weight=loss_params.get("r1_reg_weight", 3.0),
        disc_loss=loss_params.get("disc_loss", "mse"),
        learning_rate=scale_learning_rate(
            cfg["model"].get("base_learning_rate", 4.5e-6), batch_size, ndev
        ),
    )
    disc = NLayerDiscriminator2D(
        ndf=loss_params.get("disc_hidden_size", 64),
        n_layers=loss_params.get("disc_num_layers", 3),
    )

    rng = jax.random.PRNGKey(args.seed)
    mel_num = cfg.get("data", {}).get("params", {}).get("mel_num", 80)
    spec_len = cfg.get("data", {}).get("params", {}).get("spec_len", 624)
    mel0 = jnp.zeros((1, spec_len, mel_num))
    ae_params = vae.init(rng, mel0, rng)["params"]
    disc_vars = disc.init(rng, jnp.zeros((1, mel_num, spec_len, 1)))

    def vae_apply(params, x, r):
        moments = vae.apply({"params": params}, x, method=AutoencoderKL1D.encode_moments)
        post = DiagonalGaussian(moments)
        return vae.apply({"params": params}, post.sample(r),
                         method=AutoencoderKL1D.decode), post

    def disc_apply(params, stats, x, train):
        if train:
            logits, updates = disc.apply(
                {"params": params, "batch_stats": stats}, x, True, mutable=["batch_stats"]
            )
            return logits, updates["batch_stats"]
        return disc.apply({"params": params, "batch_stats": stats}, x, False), stats

    gen_step, disc_step = make_vae_gan_steps(vae_apply, disc_apply, gan_cfg)
    gen_step, disc_step = jax.jit(gen_step), jax.jit(disc_step)
    state = init_vae_gan_state(ae_params, disc_vars["params"],
                               disc_vars["batch_stats"], gan_cfg)

    # alternating optimizer steps (autoencoder1d.py:79-99)
    def step_fn(state, batch, rng):
        mel = jnp.asarray(batch["mel"].transpose(0, 2, 1))
        state, gm = gen_step(state, mel, rng)
        state, dm = disc_step(state, mel, rng)
        return state, {**gm, **dm}

    loader = _build_tile_loader(cfg, batch_size, spec_len)
    val_loader = _build_tile_loader(cfg, batch_size, spec_len, split="valid")
    ckpt = CheckpointManager(os.path.join(logdir, "checkpoints"),
                             monitor=None, max_to_keep=3)
    trainer = Trainer(
        step_fn, state, logdir, checkpoints=ckpt,
        val_fn=_make_val_fn(step_fn, val_loader(0)),
        logger=getattr(args, "logger", "tensorboard"),
    )
    # AudioLogger parity (main.py:452-530): every sample_every steps render
    # a fixed val batch's inputs + current reconstructions as .npy and TB
    # mel figures
    trainer.sample_logger = _make_vae_sample_logger(
        trainer, val_loader(0), vae_apply, logdir
    )
    trainer.fit(loader, num_epochs=args.max_epochs,
                rng=jax.random.PRNGKey(args.seed))


def _make_vae_sample_logger(trainer, val_iterable, vae_apply, logdir,
                            max_items: int = 4):
    """(state, step) callback logging inputs once and reconstructions of a
    fixed val batch at each trigger."""
    from audiolcm_tpu.train.logging import AudioSampleLogger

    batch = next(iter(val_iterable), None)
    if batch is None:
        return None
    fixed = jnp.asarray(batch["mel"].transpose(0, 2, 1))[:max_items]
    recon_jit = jax.jit(lambda p, x: vae_apply(p, x, jax.random.PRNGKey(0))[0])
    audio_log = AudioSampleLogger(logdir, tb=trainer.tb, max_items=max_items)
    logged_inputs = [False]

    def sample_logger(state, step):
        if not logged_inputs[0]:
            audio_log(np.asarray(fixed), step, split="inputs")
            logged_inputs[0] = True
        audio_log(np.asarray(recon_jit(state.ae_params, fixed)), step,
                  split="reconstructions")

    return sample_logger


def run_vae_variant_training(cfg, args, logdir, ndev, batch_size, vae,
                             variant, loss_params):
    """VAE GAN with an alternative loss from `lossconfig.target`
    (contperceptual_{multiw,dis,mask}.py / vqperceptual.py)."""
    from audiolcm_tpu.models.discriminators import NLayerDiscriminator2D
    from audiolcm_tpu.models.multi_window_disc import (
        MultiWindowDiscriminatorWrapper,
    )
    from audiolcm_tpu.models.vae1d import AutoencoderKL1D, DiagonalGaussian
    from audiolcm_tpu.train.checkpoints import CheckpointManager
    from audiolcm_tpu.train.loop import Trainer, scale_learning_rate
    from audiolcm_tpu.train.vae_losses_extra import (
        VariantConfig,
        init_variant_state,
        make_variant_gan_steps,
    )

    vcfg = VariantConfig(
        variant=variant,
        disc_start=loss_params.get("disc_start", 80001),
        kl_weight=loss_params.get("kl_weight", 1.0),
        codebook_weight=loss_params.get("codebook_weight", 1.0),
        disc_weight=loss_params.get("disc_weight", 1.0),
        disc_factor=loss_params.get("disc_factor", 1.0),
        disc_loss=loss_params.get("disc_loss", "hinge"),
        pad_value=loss_params.get("pad_value", -1.0),
        learning_rate=scale_learning_rate(
            cfg["model"].get("base_learning_rate", 4.5e-6), batch_size, ndev),
    )
    mel_num = cfg.get("data", {}).get("params", {}).get("mel_num", 80)
    spec_len = cfg.get("data", {}).get("params", {}).get("spec_len", 624)
    rng = jax.random.PRNGKey(args.seed)
    ae_params = vae.init(rng, jnp.zeros((1, spec_len, mel_num)), rng)["params"]

    disc_params = {}
    patch_apply = multi_apply = None
    if variant in ("dis", "mask", "vq"):
        patch = NLayerDiscriminator2D(
            ndf=loss_params.get("disc_hidden_size", 64),
            n_layers=loss_params.get("disc_num_layers", 3))
        patch_vars = patch.init(rng, jnp.zeros((1, mel_num, spec_len, 1)))
        disc_params["patch"] = patch_vars["params"]
        stats = patch_vars["batch_stats"]

        def patch_apply(p, x):
            # eval-mode stats inside the loss (running stats advance on the
            # disc step only in the full BN pipeline; LSGAN variants in the
            # reference freeze too little to matter for parity here)
            return patch.apply({"params": p, "batch_stats": stats}, x, False)

    if variant in ("multiw", "dis"):
        multi = MultiWindowDiscriminatorWrapper(
            time_lengths=tuple(loss_params.get(
                "time_lengths", [16, 32, 64] if variant == "multiw"
                else [32, 64, 128])),
            freq_length=mel_num,
            norm_type="in" if variant == "dis" else "bn",
            reduction="stack",
        )
        multi_vars = multi.init(
            {"params": rng, "windows": rng}, jnp.zeros((1, spec_len, mel_num)),
            train=False)
        disc_params["multi"] = multi_vars["params"]
        m_stats = multi_vars.get("batch_stats", None)

        def multi_apply(p, x, r):
            vs = {"params": p}
            if m_stats is not None:
                vs["batch_stats"] = m_stats
            return multi.apply(vs, x, train=False, rngs={"windows": r})["y"]

    def vae_apply(params, x, r):
        moments = vae.apply({"params": params}, x,
                            method=AutoencoderKL1D.encode_moments)
        post = DiagonalGaussian(moments)
        return vae.apply({"params": params}, post.sample(r),
                         method=AutoencoderKL1D.decode), post

    gen_step, disc_step = make_variant_gan_steps(
        vae_apply, vcfg,
        patch_disc_apply=patch_apply,
        multi_disc_apply=multi_apply,
        last_layer_get=lambda p: p["decoder"]["conv_out"]["kernel"],
        last_layer_set=lambda p, v: _set_in(p, ("decoder", "conv_out", "kernel"), v),
    )
    gen_step, disc_step = jax.jit(gen_step), jax.jit(disc_step)
    state = init_variant_state(ae_params, disc_params, vcfg)

    def step_fn(state, batch, rng):
        mel = jnp.asarray(batch["mel"].transpose(0, 2, 1))
        state, gm = gen_step(state, mel, rng)
        state, dm = disc_step(state, mel, rng)
        return state, {**gm, **dm}

    loader = _build_tile_loader(cfg, batch_size, spec_len)
    val_loader = _build_tile_loader(cfg, batch_size, spec_len, split="valid")
    ckpt = CheckpointManager(os.path.join(logdir, "checkpoints"),
                             monitor=None, max_to_keep=3)
    trainer = Trainer(
        step_fn, state, logdir, checkpoints=ckpt,
        val_fn=_make_val_fn(step_fn, val_loader(0)),
        logger=getattr(args, "logger", "tensorboard"),
    )
    trainer.sample_logger = _make_vae_sample_logger(
        trainer, val_loader(0), vae_apply, logdir
    )
    trainer.fit(loader, num_epochs=args.max_epochs,
                rng=jax.random.PRNGKey(args.seed))


def _set_in(tree, path, value):
    import flax

    flat = flax.traverse_util.flatten_dict(tree)
    flat[path] = value
    return flax.traverse_util.unflatten_dict(flat)


def _build_tile_loader(cfg, batch_size, spec_len, split="train"):
    from audiolcm_tpu.data.datasets import SpecDataset, collate_tile

    data_params = cfg.get("data", {}).get("params", {})
    spec_dir = data_params["spec_dir_path"]
    ds = SpecDataset(split, spec_dir, mel_num=data_params.get("mel_num", 80))

    def loader(epoch):
        import numpy as np

        order = np.random.default_rng(epoch).permutation(len(ds))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            samples = [ds[j] for j in order[i : i + batch_size]]
            yield collate_tile(samples, target_len=spec_len)

    return loader


def _load_diffusion_ckpt_parts(cfg, ckpt_path):
    """Load and convert every sub-model of an LCM/teacher Lightning ckpt."""
    from audiolcm_tpu import config as cfg_mod
    from audiolcm_tpu.convert import (
        convert_bert,
        convert_dit,
        convert_t5_encoder,
        convert_vae,
    )
    from audiolcm_tpu.convert.load_torch import (
        load_state_dict,
        split_lcm_state_dict,
        strip_prefix,
    )

    sys_cfg = cfg_mod.parse_diffusion_config(cfg)
    if not ckpt_path or not os.path.exists(ckpt_path):
        # Reference parity: teacher.yaml ships with NO model.params.ckpt_path
        # (the DiT trains from scratch; only sub-configs name checkpoint
        # files), and DDPM.init_from_ckpt is strict=False everywhere
        # (ddpm.py:185-201). A missing/absent checkpoint therefore falls
        # through to fresh initialization instead of crashing, so the
        # shipped configs run from a clean clone.
        if ckpt_path:
            print(f"WARNING: checkpoint {ckpt_path!r} not found — "
                  "fresh-initializing every sub-model", flush=True)
        parts = {k: None for k in
                 ("teacher", "student", "target", "vae", "clap", "t5")}
        parts["scale_factor"] = 1.0
    else:
        sd = load_state_dict(ckpt_path)
        parts = split_lcm_state_dict(sd)
    vcfg = sys_cfg.vae.config
    conv_vae = lambda d: convert_vae(
        d, num_levels=len(vcfg.ch_mult), num_res_blocks=vcfg.num_res_blocks,
        down_layers=vcfg.down_layers, attn_layers=vcfg.attn_layers,
    )
    out = {"sys": sys_cfg, "scale_factor": parts["scale_factor"]}
    out["vae"] = conv_vae(parts["vae"]) if parts["vae"] else None
    for k in ("teacher", "student", "target"):
        out[k] = convert_dit(parts[k], depth=sys_cfg.unet.depth) if parts[k] else None
    clap_tower = sys_cfg.cond["clap_text"]
    t5_tower = sys_cfg.cond["t5"]
    if parts["clap"]:
        out["clap_text"] = {
            "bert": convert_bert(
                strip_prefix(parts["clap"], "base."),
                num_layers=clap_tower.config.num_layers,
            ),
            "projection": {
                "linear1": {"kernel": parts["clap"]["projection.linear1.weight"].T},
                "linear2": {"kernel": parts["clap"]["projection.linear2.weight"].T},
                "layer_norm": {
                    "scale": parts["clap"]["projection.layer_norm.weight"],
                    "bias": parts["clap"]["projection.layer_norm.bias"],
                },
            },
        }
    else:
        out["clap_text"] = None
    out["t5"] = (
        convert_t5_encoder(parts["t5"], num_layers=t5_tower.config.num_layers)
        if parts["t5"]
        else None
    )
    return _fill_missing_parts(out, sys_cfg)


def _fill_missing_parts(out, sys_cfg, seed=0):
    """Fresh-init any sub-model the checkpoint did not carry.

    Mirrors the reference's permissive loading (`ddpm.py:185-201`
    strict=False / ignore_keys; `teacher.yaml` has no model ckpt_path at
    all): absent sub-modules keep their __init__ values there, so here a
    missing piece gets a fresh flax init with a loud warning. The teacher
    DiT from scratch is the normal teacher-training path; an LCM
    distillation without a real teacher is smoke-test-only.
    """
    missing = [k for k in ("teacher", "vae", "clap_text", "t5")
               if out.get(k) is None]
    if not missing:
        return out
    print(f"WARNING: fresh-initializing sub-models {missing} "
          "(not present in the checkpoint)", flush=True)
    p = sys_cfg
    rngs = jax.random.split(jax.random.PRNGKey(seed), 4)
    if out.get("teacher") is None:
        # in_channels from the unet config (= the VAE's z_channels), NOT
        # mel_dim: the two agree in the shipped configs but tests shrink them
        # independently, and flax convs bake in_features from the init input.
        x = jnp.zeros((1, 32, p.unet.in_channels), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        ctx_tokens = 2 * 77  # CLAP half + T5 half (modules.py:582)
        ctx = jnp.zeros((1, ctx_tokens, p.unet.context_dim), jnp.float32)
        w = jnp.zeros((1, 256), jnp.float32) if p.use_lcm else None
        out["teacher"] = p.unet.init(rngs[0], x, t, ctx, w)["params"]
    if out.get("vae") is None:
        from audiolcm_tpu.models.vae1d import AutoencoderKL1D

        mel = jnp.zeros((1, 64, p.vae.config.in_channels), jnp.float32)
        out["vae"] = p.vae.init(rngs[1], mel,
                                method=AutoencoderKL1D.encode_moments)["params"]
    ids = jnp.zeros((1, 77), jnp.int32)
    if out.get("clap_text") is None:
        out["clap_text"] = p.cond["clap_text"].init(rngs[2], ids)["params"]
    if out.get("t5") is None:
        out["t5"] = p.cond["t5"].init(rngs[3], ids)["params"]
    return out


def _make_frozen_stages(sys_cfg, parts, bert_path, t5_path, max_length=77):
    """Host tokenization + jitted frozen text/VAE encoders shared by the
    teacher and distillation trainers."""
    from audiolcm_tpu.api import Tokenizers
    from audiolcm_tpu.models.vae1d import AutoencoderKL1D, DiagonalGaussian

    tokenizers = Tokenizers(bert_path, t5_path, max_length)
    clap_tower, t5_tower = sys_cfg.cond["clap_text"], sys_cfg.cond["t5"]
    clap_p = jax.tree.map(jnp.asarray, parts["clap_text"])
    t5_p = jax.tree.map(jnp.asarray, parts["t5"])
    vae_p = jax.tree.map(jnp.asarray, parts["vae"])
    vae = sys_cfg.vae

    @jax.jit
    def encode_context(clap_ids, t5_ids):
        z1 = clap_tower.apply({"params": clap_p}, clap_ids)
        z2 = t5_tower.apply({"params": t5_p}, t5_ids)
        return jnp.concatenate([z1, z2], axis=1)

    @jax.jit
    def encode_latent(mel_btc, rng, scale_factor):
        moments = vae.apply({"params": vae_p}, mel_btc,
                            method=AutoencoderKL1D.encode_moments)
        z = DiagonalGaussian(moments).sample(rng)
        return z * scale_factor

    def batch_to_device(batch, rng, scale_factor):
        clap_ids, t5_ids = tokenizers(batch["ori_caption"], batch["struct_caption"])
        context = encode_context(clap_ids, t5_ids)
        mel_btc = jnp.asarray(batch["mel"].transpose(0, 2, 1))
        z = encode_latent(mel_btc, rng, scale_factor)
        return z, context

    uncond_ids = tokenizers([""], [""])
    uncond_context = encode_context(*uncond_ids)
    return batch_to_device, uncond_context, encode_latent


def run_teacher_training(cfg, args, logdir, ndev, batch_size,
                         bert_path="bert-base-uncased", t5_path="t5-v1_1-large"):
    """Teacher LDM training (`configs/teacher.yaml` path)."""
    from audiolcm_tpu.diffusion.schedule import NoiseSchedule
    from audiolcm_tpu.train.checkpoints import CheckpointManager
    from audiolcm_tpu.train.loop import Trainer, scale_learning_rate
    from audiolcm_tpu.train.teacher import (
        TeacherConfig,
        init_teacher_state,
        make_teacher_step,
    )

    ckpt_path = args.resume or cfg["model"]["params"].get("ckpt_path")
    parts = _load_diffusion_ckpt_parts(cfg, ckpt_path)
    sys_cfg = parts["sys"]
    schedule = NoiseSchedule.linear(sys_cfg.timesteps, sys_cfg.linear_start,
                                    sys_cfg.linear_end)
    batch_to_device, _, _ = _make_frozen_stages(sys_cfg, parts, bert_path, t5_path)

    dit = sys_cfg.unet

    def dit_apply(p, x, t, ctx, w=None):
        return dit.apply({"params": p}, x, t, ctx, w)

    from audiolcm_tpu.train.lr_schedules import build_schedule

    lr = scale_learning_rate(sys_cfg.base_learning_rate, batch_size, ndev)
    tcfg = TeacherConfig(
        learning_rate=lr,
        lr_schedule=build_schedule(
            cfg["model"]["params"].get("scheduler_config"), lr),
    )
    step = jax.jit(make_teacher_step(dit_apply, schedule, tcfg))
    params = jax.tree.map(jnp.asarray, parts["teacher"])
    state = init_teacher_state(params, tcfg)
    scale_factor = parts["scale_factor"]

    def step_fn(state, batch, rng):
        r_enc, r_step = jax.random.split(rng)
        z, context = batch_to_device(batch, r_enc, scale_factor)
        return step(state, z, context, r_step)

    loader_obj = _build_loader(cfg, batch_size)
    val_loader = _build_loader(cfg, batch_size, split="valid")
    ckpt = CheckpointManager(os.path.join(logdir, "checkpoints"))
    Trainer(
        step_fn, state, logdir, checkpoints=ckpt,
        val_fn=_make_val_fn(step_fn, iter(val_loader)),
        logger=getattr(args, "logger", "tensorboard"),
    ).fit(
        lambda e: (loader_obj.set_epoch(e), iter(loader_obj))[1],
        num_epochs=args.max_epochs, rng=jax.random.PRNGKey(args.seed),
    )


def run_lcm_training(cfg, args, logdir, ndev, batch_size,
                     bert_path="bert-base-uncased", t5_path="t5-v1_1-large"):
    """LCM consistency distillation (`configs/audiolcm.yaml` path).

    Teacher weights come from model.params.ckpt_path (maa2.ckpt); student
    and target are initialized from the teacher (`lcm_audio.py:107-114`).
    scale_by_std: if the ckpt carries no scale_factor, it is computed as
    1/std of the first batch's latents (`lcm_audio.py:123-138`).
    """
    from audiolcm_tpu.diffusion.schedule import NoiseSchedule
    from audiolcm_tpu.train.checkpoints import CheckpointManager
    from audiolcm_tpu.train.lcm_distill import (
        Batch,
        LCMDistillConfig,
        init_train_state,
        make_lcm_distill_step,
    )
    from audiolcm_tpu.train.loop import Trainer, scale_learning_rate

    ckpt_path = args.resume or cfg["model"]["params"].get("ckpt_path")
    parts = _load_diffusion_ckpt_parts(cfg, ckpt_path)
    sys_cfg = parts["sys"]
    schedule = NoiseSchedule.linear(sys_cfg.timesteps, sys_cfg.linear_start,
                                    sys_cfg.linear_end)
    batch_to_device, uncond_context, _ = _make_frozen_stages(
        sys_cfg, parts, bert_path, t5_path
    )

    dit = sys_cfg.unet

    def dit_apply(p, x, t, ctx, w=None):
        return dit.apply({"params": p}, x, t, ctx, w)

    from audiolcm_tpu.train.lr_schedules import build_schedule

    lr = scale_learning_rate(sys_cfg.base_learning_rate, batch_size, ndev)
    dcfg = LCMDistillConfig(
        num_ddim_timesteps=sys_cfg.num_ddim_timesteps,
        w_min=sys_cfg.w_min, w_max=sys_cfg.w_max,
        learning_rate=lr,
        lr_schedule=build_schedule(
            cfg["model"]["params"].get("scheduler_config"), lr),
    )
    teacher = jax.tree.map(jnp.asarray, parts["teacher"])
    student_init = parts["student"] if parts["student"] else parts["teacher"]
    state = init_train_state(jax.tree.map(jnp.asarray, student_init), dcfg)
    if parts["target"]:
        state = state._replace(target=jax.tree.map(jnp.asarray, parts["target"]))
    step = jax.jit(make_lcm_distill_step(dit_apply, schedule, dcfg))

    scale_holder = {"scale": parts["scale_factor"]}

    def step_fn(state, batch, rng):
        r_enc, r_step = jax.random.split(rng)
        z, context = batch_to_device(batch, r_enc, 1.0)
        if sys_cfg.scale_by_std and scale_holder["scale"] == 1.0:
            scale_holder["scale"] = float(1.0 / jnp.std(z))  # first-batch std rescale
        z = z * scale_holder["scale"]
        return step(state, teacher, Batch(z=z, context=context), uncond_context, r_step)

    loader_obj = _build_loader(cfg, batch_size)
    val_loader = _build_loader(cfg, batch_size, split="valid")
    ckpt = CheckpointManager(os.path.join(logdir, "checkpoints"))
    Trainer(
        step_fn, state, logdir, checkpoints=ckpt,
        val_fn=_make_val_fn(step_fn, iter(val_loader)),
        logger=getattr(args, "logger", "tensorboard"),
    ).fit(
        lambda e: (loader_obj.set_epoch(e), iter(loader_obj))[1],
        num_epochs=args.max_epochs, rng=jax.random.PRNGKey(args.seed),
    )


if __name__ == "__main__":
    main()
