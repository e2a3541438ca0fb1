"""Typed configuration tree for gens_tpu.

Replaces the reference's pyhocon HOCON files (/root/reference/confs/gens.conf)
with plain dataclasses + a JSON/YAML loader and dotted-path CLI overrides.
Defaults reproduce the reference's published DTU recipe
(/root/reference/confs/gens.conf:1-101).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple


@dataclass
class FeatureNetConfig:
    # per-scale output channels, fine-to-coarse (reference confs/gens.conf:64)
    d_out: Tuple[int, ...] = (4, 4, 4, 4, 4)
    # encoder channels per stride stage (strides 2, 4, 8, 16, 32)
    d_enc: Tuple[int, ...] = (16, 24, 40, 96, 160)
    norm: str = "instance"
    # "fpn" (self-contained, default) or "mnasnet" (reference backbone;
    # load ported ImageNet weights via scripts/convert_mnasnet_weights.py +
    # pretrained_path). MnasNet BN running stats are frozen during training.
    backbone: str = "fpn"
    pretrained_path: Optional[str] = None


@dataclass
class VolumeConfig:
    # cascade resolutions, fine-to-coarse (reference confs/gens.conf:67)
    volume_dims: Tuple[int, ...] = (256, 128, 64, 32, 16)
    # a voxel is valid if seen by strictly more than this many views
    # (reference models/modules/volume.py:58)
    min_vis_view: int = 1
    # dtype of the emitted raw volumes ("float32" | "bfloat16"); per-view
    # sums always accumulate in fp32. bf16 halves the 256³ mean/var cascade
    # and makes its autodiff cotangents half-width too.
    dtype: str = "float32"
    # route the per-voxel per-view feature sampling through the packed 2D
    # supercell tables (one 9C-wide gather instead of 4 narrow ones). The
    # aggregation is the single largest gather population in the train step
    # and its BACKWARD dominates training (TRAINBENCH_r02: 87% at 128³).
    # False: plain bilerp. True / "diff": packed forward, cotangents scatter
    # into the raw feature maps (bilerp_packed_diff). "table": differentiate
    # through the supercell table — 4x fewer, 9x wider scatter rows, then
    # the pack conv's transpose (a dense conv) finishes the job. "table"
    # measured 710 ms/step at 128³ / 3052 at 256³ full scale on v5e
    # (TRAINBENCH_r03.json; exactness vs plain pinned in
    # tests/test_volume.py); "pallas" (below) is the fastest measured
    # (2207 ms at 256³ with the r04 safety-corrected windows; 1909 ms with
    # agg_remat="save_gathers") and is what confs/dtu.yaml ships — NB unlike
    # "table"/"table_bf16" its backward matmuls run bf16 operands by
    # default (~2^-8 relative gradient rounding; set splat_mm_dtype to
    # "float32" for the bit-exact adjoint at ~1/4 the MXU rate).
    # "table_bf16":
    # like "table" but the forward (and the remat'd backward re-gather)
    # reads a bf16 copy of the table — 4.3x faster gather rows
    # (GATHER_PROBE.json) — while tangents/cotangents target the f32 table,
    # so GRADIENTS are bit-identical to "table"; values carry bf16 table
    # rounding (same order as volume.dtype=bfloat16's rounding).
    packed_bilerp: object = "table"
    # pixel window of the Pallas splat backward (packed_bilerp="pallas"):
    # "auto" (the Runner sizes per-scale windows to the dataset's rigs via
    # pallas_splat.required_windows_cascade before tracing), an int, a
    # (window_u, window_v) pair, or a per-scale LIST of those. Must cover
    # the worst-case projected span of a 16-voxel tile for the camera rig
    # (dominated by the voxels nearest a camera — close-orbit rigs need
    # ~100-190 px at the reference scale). Scales with dim % 16 != 0 fall
    # back to "table_bf16"; windows larger than the image clamp to it.
    splat_window: object = "auto"
    # which backward implementation packed_bilerp="pallas" runs: "kernel"
    # (the Mosaic splat kernel — TPU only), "adjoint" (the mathematically
    # identical jnp bilerp adjoint, for non-TPU targets), or "auto"
    # (sharded steps resolve from the MESH's device platform in
    # parallel/sharded.py — the platform the computation actually targets;
    # plain-jit callers from jax.default_backend())
    splat_impl: str = "auto"
    # splat-kernel hat-matmul operand dtype: "bfloat16" (4x MXU rate,
    # ~2^-8 relative gradient rounding — same order as the bf16 forward
    # this mode already runs) or "float32" (bit-exact adjoint via
    # Precision.HIGHEST)
    splat_mm_dtype: str = "bfloat16"
    # remat policy of the per-view aggregation contribution: "full"
    # (recompute everything in the backward — minimum HBM; the backward
    # re-runs the supercell GATHERS, ~83M bf16 rows at 256³ scale 0) or
    # "save_gathers" (jax.checkpoint save_only_these_names on the gathered
    # values: the backward recomputes only projection math + elementwise,
    # costing ~1.5 GB extra residents at 256³/5 views f32 — fits the
    # measured 9/16 GiB headroom). Measured at 256³ full scale with the
    # pallas backward: 1909 ms/step save_gathers vs 2207 full
    # (runs/tb_256_pallas_bf16*_r04.json); confs/dtu.yaml ships
    # save_gathers.
    agg_remat: str = "full"
    # cross-view aggregation: "mean_var" (reference live path) or "adaptive"
    # (learned softmax weighting — the reference's dead agg_adaptive made
    # functional; emits C channels/scale, so set reg_network.d_volume to
    # match)
    agg: str = "mean_var"


@dataclass
class RegNetConfig:
    # raw volume channels per scale = 2 * feature channels (mean+var)
    d_volume: Tuple[int, ...] = (8, 8, 8, 8, 8)
    d_out: Tuple[int, ...] = (4, 4, 4, 4, 4)
    d_base: int = 8
    # activation dtype for the U-Net ("float32" | "bfloat16"); params stay
    # fp32, norm statistics accumulate in fp32. bf16 halves the dominant
    # 256³ activation/residual buffers (HBM is the constraint on one chip).
    dtype: str = "float32"
    # bottleneck transformer over the coarsest encoder level (the
    # reference's commented-out GlobalAttn, reg_network.py:138,153)
    use_global_attn: bool = False


@dataclass
class SDFNetConfig:
    d_in: int = 3
    d_out: int = 129  # 1 sdf + 128 latent
    d_hidden: int = 128
    n_layers: int = 6
    skip_in: Tuple[int, ...] = (3,)
    multires: int = 4
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = True
    weight_norm: bool = True
    inside_outside: bool = False
    feat_channels: int = 20  # 5 scales x 4 channels of volume features
    feat_multires: int = 2
    # dtype of the volume cascade inside the trilerp gather; bfloat16 halves
    # the gather traffic of the hottest op (lerp/MLP still run f32)
    volume_dtype: str = "float32"
    # fuse the 5-scale lookup into one packed gather. Measured SLOWER on
    # v5e inside the render (the merged backward scatter serializes worse
    # than per-scale scatters: 7.2k -> 5.0k rays/s), so off by default;
    # kept for gradient-free paths and future hardware
    fused_cascade: bool = False
    # supercell-packed trilerp: one wide 27C-channel gather per scale
    # instead of 8 narrow C-channel ones (ops/interp.py pack_supercell).
    # TPU gathers are addressing-bound, so the wide row is nearly free.
    # Costs ~27/8 x the cascade in HBM for the packed tables.
    packed_trilerp: bool = False
    # inference fast path: ALL cascade scales + the voxel mask in ONE fused
    # supercell gather per lookup site (ops/interp.py FusedCascade). TPU
    # gathers ramp up with population size (scripts/gather_probe.py), so one
    # 6N-row gather beats 5 per-scale gathers + a mask gather of N rows
    # each. Gradient-free/inference only; training keeps per-scale tables.
    fused_packed: bool = False
    # with fused_packed: use the fused single-gather ONLY for the
    # hierarchical-sampling SDF probes (4 rounds x ~16k points — deep in
    # the gather ramp-up regime where one 6N-row gather wins) while
    # render_core keeps the per-scale packed gathers (131k+ points, where
    # the merged gather measured SLOWER because XLA fuses each per-scale
    # gather into its weight contraction). Separates the two population
    # regimes the round-3 A/B conflated.
    fused_sampling_only: bool = False
    # compute dtype of the SDF MLP ("float32" | "bfloat16"). Params are
    # always stored f32; bfloat16 casts the PE'd activations and the
    # weight-normed weights at matmul time and returns f32 outputs. The
    # fused value+grad+smooth pass is activation-bandwidth-bound, so this
    # is a big inference lever; keep f32 for training.
    mlp_dtype: str = "float32"


@dataclass
class BlendingNetConfig:
    d_feature: int = 20
    anti_alias_pooling: bool = True
    # color head: "blending" (IBRNet source-view blending, the reference's
    # live path) or "idr" (surface-light-field MLP on the SDF latent — the
    # reference's never-instantiated RenderingNetwork made functional; useful
    # when no source-view features exist to blend)
    head: str = "blending"
    # supercell-packed bilerp for the source-view feature/RGB warps: one
    # wide 9C-channel gather per (view, scale) instead of 4 narrow ones,
    # packed once per scene (ops/interp.py pack_supercell2d)
    packed_bilerp: bool = False
    # inference fast path: all feature scales + RGB in ONE fused per-view
    # gather for the source-view warps (FusedImagePyramid; see
    # sdf_network.fused_packed for the rationale)
    fused_pyramid: bool = False
    # storage dtype for the packed 2D tables ("float32" | "bfloat16");
    # bfloat16 halves the gathered bytes (mirrors sdf_network.volume_dtype)
    packed_dtype: str = "float32"
    # compute dtype of the blending MLPs ("float32" | "bfloat16"); params
    # stay f32, outputs return f32 (same contract as sdf_network.mlp_dtype)
    mlp_dtype: str = "float32"
    # idr-head hyperparameters (reference rendering_network.py:90-151)
    idr_mode: str = "idr"  # idr | no_view_dir | no_normal
    idr_d_hidden: int = 256
    idr_n_layers: int = 4
    idr_multires_view: int = 4


@dataclass
class VarianceConfig:
    init_val: float = 0.3


@dataclass
class RenderConfig:
    n_samples: int = 64
    n_importance: int = 64
    up_sample_steps: int = 4
    perturb: float = 1.0
    # MFC patch warp
    patch_size: int = 11
    # number of feature scales stacked for the patch warp (scales 0..k-1)
    warp_scales: int = 3
    # number of random points for the sparse SDF regularizer
    n_sparse_pts: int = 1024


@dataclass
class ModelConfig:
    feature_network: FeatureNetConfig = field(default_factory=FeatureNetConfig)
    volume: VolumeConfig = field(default_factory=VolumeConfig)
    reg_network: RegNetConfig = field(default_factory=RegNetConfig)
    sdf_network: SDFNetConfig = field(default_factory=SDFNetConfig)
    color_network: BlendingNetConfig = field(default_factory=BlendingNetConfig)
    variance_network: VarianceConfig = field(default_factory=VarianceConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    # sync cadence (epochs) of the frozen matching feature net
    # (reference models/gens.py:133-138)
    match_sync_every: int = 5


@dataclass
class LossConfig:
    color_weight: float = 1.0
    sparse_weight: float = 0.02
    igr_weight: float = 0.1
    sparse_scale_factor: float = 100.0
    mfc_weight: float = 1.0
    smooth_weight: float = 1e-4
    tv_weight: float = 1e-4
    depth_weight: float = 0.0
    pseudo_sdf_weight: float = 1.0
    pseudo_depth_weight: float = 0.05


@dataclass
class DatasetConfig:
    dataset_name: str = "dtu"
    data_dir: str = ""
    split: Optional[str] = "train"
    scene: Optional[Tuple[str, ...]] = None
    light_idx: Optional[Tuple[int, ...]] = (3,)
    ref_view: Optional[Tuple[int, ...]] = None
    num_src_view: int = 4
    factor: float = 1.0
    interval_scale: float = 1.0
    num_interval: int = 192
    img_hw: Tuple[int, int] = (480, 640)
    n_rays: int = 512
    val_res_level: int = 4
    n_pseudo_pts: int = 2048
    # finetune-only
    num_views: int = 3


@dataclass
class TrainConfig:
    lr_feat: float = 1e-3
    lr_mlp: float = 5e-4
    # NeuS variance (inv_s) scalar LR = lr_mlp * this. 1.0 = reference
    # parity; >1 accelerates surface sharpening on short (chip-budget)
    # schedules — the held-out accuracy floor tracks ~1/inv_s (QUALITY.md)
    lr_variance_mult: float = 1.0
    # per-scale volume LRs for finetune mode (reference confs/gens_finetune.conf:22)
    lr_vol: Tuple[float, ...] = (1e-4, 1e-3, 1e-3, 1e-2, 1e-2)
    epochs: int = 50
    anneal_end: float = 2.0
    warmup: float = 1.0
    alpha: float = 0.02
    save_freq: float = 1.0
    log_freq: float = 0.2
    val_freq: float = 2.0
    seed: int = 0
    loss: LossConfig = field(default_factory=LossConfig)


@dataclass
class ParallelConfig:
    # named mesh axes sizes; 1 = disabled.
    data: int = 1
    view: int = 1


@dataclass
class Config:
    base_exp_dir: str = "./exp"
    mode: str = "train"  # train | val | finetune
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    train_dataset: DatasetConfig = field(default_factory=DatasetConfig)
    val_dataset: DatasetConfig = field(
        default_factory=lambda: DatasetConfig(split="test", num_src_view=2, ref_view=(23,))
    )
    finetune_dataset: DatasetConfig = field(
        default_factory=lambda: DatasetConfig(
            split=None, scene=("scan24",), ref_view=(23,), num_views=3,
            img_hw=(1152, 1600), factor=1.1
        )
    )
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    mesh_resolution: int = 512
    clean_mesh: bool = False
    # persistent XLA compilation cache shared across processes ("" disables).
    # The reference-scale train step compiles in ~2 min per program through
    # the tunneled remote compiler; without this every fresh Runner process
    # re-pays it (measured 3 distinct step-adjacent programs x ~125 s at the
    # 256^3 feasibility config before steady-state 2.6 s/step). "auto"
    # resolves to the per-user dir from utils/cache.py (the fixed /tmp path
    # was poisonable on shared machines — ADVICE r04).
    compilation_cache_dir: str = "auto"


def apply_inference_fast_paths(cfg: "Config") -> "Config":
    """Enable the recommended inference-speed settings in place (the exact
    configuration bench.py measures — shared so every throughput harness
    benches the SAME program):

    * supercell-packed trilerp + 2D bilerp (one wide gather per scale
      instead of 8/4 narrow ones; numerically identical — PERF.md),
    * bf16 storage for the gathered tables (element-count-bound traffic),
    * bf16 compute in the SDF/blending MLPs (params stay f32).
    """
    m = cfg.model
    m.sdf_network.volume_dtype = "bfloat16"
    m.sdf_network.packed_trilerp = True
    m.sdf_network.mlp_dtype = "bfloat16"
    m.color_network.packed_bilerp = True
    m.color_network.packed_dtype = "bfloat16"
    m.color_network.mlp_dtype = "bfloat16"
    # NOT enabled: fused_packed / fused_pyramid (the single-gather merges).
    # Measured SLOWER on v5e — 30.2k -> 22.6k rays/s (cascade) / 27.9k
    # (pyramid) — XLA fuses each per-scale gather into its weight
    # contraction, and the merged big gather defeats that
    # (scripts/bench_variants.py, PERF.md round-3 section).
    return cfg


# ---------------------------------------------------------------------------
# dict <-> dataclass plumbing


def _from_dict(cls, data: Any):
    if data is None:
        return None
    if dataclasses.is_dataclass(cls):
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kwargs = {}
        for key, value in data.items():
            if key not in fields:
                raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
            f = fields[key]
            ftype = f.type if not isinstance(f.type, str) else None
            default = f.default_factory() if f.default_factory is not dataclasses.MISSING else f.default  # type: ignore[misc]
            if dataclasses.is_dataclass(default):
                kwargs[key] = _from_dict(type(default), value)
            elif isinstance(default, tuple) and isinstance(value, (list, tuple)):
                kwargs[key] = tuple(value)
            else:
                kwargs[key] = value
        return cls(**kwargs)
    return data


def config_from_dict(data: dict) -> Config:
    return _from_dict(Config, data)


def config_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def load_config(path: Optional[str] = None, overrides: Sequence[str] = ()) -> Config:
    """Load a config from a JSON/YAML file plus dotted-path overrides.

    Overrides look like ``train.epochs=10`` or ``model.render.n_samples=32``;
    values are parsed as JSON when possible, else kept as strings.
    """
    data: dict = {}
    if path is not None:
        with open(path) as f:
            text = f.read()
        try:
            data = json.loads(text)
        except json.JSONDecodeError:
            import yaml

            data = yaml.safe_load(text)
    cfg = config_from_dict(data)
    for ov in overrides:
        key, _, raw = ov.partition("=")
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        node = cfg
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = getattr(node, p)
        cur = getattr(node, parts[-1])
        if isinstance(cur, tuple) and isinstance(value, list):
            value = tuple(value)
        setattr(node, parts[-1], value)
    return cfg
