"""Configuration system.

Mirrors the reference's ml_collections tree (reference:
``configs/default_configs.py:6-89`` specialized by ``configs/res64.py`` /
``configs/res128.py``) so that dotted CLI overrides like
``--config.eval.ckpt_path=...`` keep working, while adding a ``tpu``
section for mesh/sharding/precision knobs that have no reference
equivalent.
"""

from __future__ import annotations

import ml_collections


def get_default_config() -> ml_collections.ConfigDict:
    """Base config tree. Key parity with reference default_configs.py:6-89."""
    config = ml_collections.ConfigDict()

    # training
    config.training = training = ml_collections.ConfigDict()
    config.training.batch_size = 64
    training.n_iters = 2400001
    training.snapshot_freq = 50000
    training.log_freq = 50
    training.eval_freq = 100
    training.snapshot_freq_for_preemption = 5000
    training.snapshot_sampling = True
    training.likelihood_weighting = False
    training.continuous = True
    training.reduce_mean = False
    training.iter_size = 1
    training.loss_type = 'l2'
    training.train_dir = "PLACEHOLDER"
    training.sde = 'vpsde'
    training.lip_scale = None

    # sampling
    config.sampling = sampling = ml_collections.ConfigDict()
    sampling.n_steps_each = 1
    sampling.noise_removal = True
    sampling.probability_flow = False
    sampling.snr = 0.075
    sampling.method = 'pc'
    sampling.predictor = 'ancestral_sampling'
    sampling.corrector = 'none'
    # >0: run the reverse loop as host-dispatched segments of this many
    # steps (keeps single device programs short for remote TPU workers)
    sampling.segment_steps = 0

    # evaluation
    config.eval = evaluate = ml_collections.ConfigDict()
    evaluate.begin_ckpt = 50
    evaluate.end_ckpt = 96
    evaluate.batch_size = 512
    evaluate.enable_sampling = True
    evaluate.num_samples = 50000
    evaluate.enable_loss = True
    evaluate.enable_bpd = False
    evaluate.bpd_dataset = 'test'
    evaluate.ckpt_path = "PLACEHOLDER"
    evaluate.partial_dmtet_path = "PLACEHOLDER"
    evaluate.tet_path = "PLACEHOLDER"
    evaluate.freeze_iters = 950
    evaluate.eval_dir = "PLACEHOLDER"

    # data
    config.data = data = ml_collections.ConfigDict()
    data.dataset = 'ShapeNet'
    data.image_size = 64
    data.random_flip = True
    data.uniform_dequantization = False
    data.centered = True
    data.num_channels = 4
    data.num_workers = 4
    data.normalize_sdf = True
    data.meta_path = "PLACEHOLDER"
    data.filter_meta_path = "PLACEHOLDER"
    data.extension = 'npy'  # 'pt' or 'npy'
    data.aug = True
    data.grid_mask_path = ""  # '' -> derived from the tet grid at runtime

    # model
    config.model = model = ml_collections.ConfigDict()
    model.name = 'ddpm_res64'
    model.sigma_max = 378
    model.sigma_min = 0.01
    model.num_scales = 1000
    model.beta_min = 0.1
    model.beta_max = 20.
    model.dropout = 0.1
    model.embedding_type = 'fourier'
    model.deform_scale = 1.0
    model.scale_by_sigma = False
    model.ema_rate = 0.9999
    model.normalization = 'GroupNorm'
    model.nonlinearity = 'swish'
    model.nf = 128
    model.ch_mult = (1, 1, 2, 4, 4)
    model.num_res_blocks_first = 2
    model.num_res_blocks = 3
    model.attn_resolutions = (16,)
    model.resamp_with_conv = True
    model.conditional = True

    # optimization
    config.optim = optim = ml_collections.ConfigDict()
    optim.weight_decay = 0
    optim.optimizer = 'Adam'
    optim.lr = 2e-4
    optim.beta1 = 0.9
    optim.eps = 1e-8
    optim.warmup = 5000
    optim.grad_clip = 1.

    config.seed = 42

    # rendering (reserved; parity with reference key)
    config.render = ml_collections.ConfigDict()

    # TPU-native knobs (no reference equivalent)
    config.tpu = tpu = ml_collections.ConfigDict()
    tpu.compute_dtype = 'bfloat16'   # conv/matmul compute dtype
    tpu.param_dtype = 'float32'
    tpu.mesh_data_axis = -1          # -1: all devices on the data axis
    tpu.allow_device_idle = False    # permit shrinking the mesh when the
    # batch does not divide the data axis (otherwise: hard error)
    tpu.mesh_spatial_axis = 1        # spatial (grid-D) sharding factor
    tpu.donate_sampler_state = True
    tpu.fused_groupnorm = False   # legacy standalone GN kernel (negative result)
    # fuse GN+SiLU+conv3 in one Pallas pass. The isolated kernel beats the
    # XLA chain 19-29% (ops/gn_silu_conv.py), but the measured FULL-model
    # step regressed (79.1 vs 73.4 ms: lost cross-op fusions around the
    # opaque pallas_call) — off until an in-model win is demonstrated.
    tpu.fused_gn_silu_conv = False
    # rematerialize each ResnetBlock in the TRAIN forward (jax.checkpoint):
    # trades one extra forward's FLOPs for O(depth) less activation HBM —
    # required to fit the reference's large train batches (configs/res64.py
    # batch 48) on one chip. Forward-only (sampling) paths are unaffected.
    tpu.remat_blocks = True
    tpu.tet_root = ""               # dir holding {R}_tets_cropped.npz; '' -> bundled default

    return config


def get_res64_config() -> ml_collections.ConfigDict:
    """res64 preset (reference configs/res64.py)."""
    config = get_default_config()
    config.training.continuous = False
    config.training.reduce_mean = True
    config.training.batch_size = 48
    config.training.snapshot_freq_for_preemption = 1000
    config.data.image_size = 64
    config.model.name = 'ddpm_res64'
    config.model.num_res_blocks = 3
    config.model.ch_mult = (1, 1, 2, 4, 4)
    config.model.dropout = 0.1
    config.optim.lr = 2e-5
    config.eval.batch_size = 4
    return config


def get_res128_config() -> ml_collections.ConfigDict:
    """res128 preset (reference configs/res128.py).

    The reference names the model 'ddpm_res128_v2' but registers only
    'ddpm_res128' (reference ddpm_res128.py:41) — a known bug. We register
    both names to the same architecture so either works.
    """
    config = get_default_config()
    config.training.continuous = False
    config.training.reduce_mean = True
    config.training.batch_size = 8
    config.training.iter_size = 4
    config.training.snapshot_freq_for_preemption = 1000
    config.data.image_size = 128
    config.data.num_workers = 8
    config.model.name = 'ddpm_res128'
    config.model.num_res_blocks = 2
    config.model.num_res_blocks_first = 2
    config.model.ch_mult = (1, 1, 2, 4, 4, 4)
    config.model.dropout = 0.1
    config.optim.lr = 7e-5 / config.training.iter_size * 2.0
    config.eval.batch_size = 7
    return config


_PRESETS = {
    'res64': get_res64_config,
    'res128': get_res128_config,
    'default': get_default_config,
}


def get_config(name: str = 'res64') -> ml_collections.ConfigDict:
    try:
        return _PRESETS[name]()
    except KeyError as e:
        raise ValueError(f"unknown config preset {name!r}; have {sorted(_PRESETS)}") from e
