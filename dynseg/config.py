"""Configuration dataclasses for the dynseg framework.

Mirrors the reference CLI surface (SURVEY.md C1: operation, dataset,
net_type, lr, weight decay, batch size, niter, distribution_type, values,
update_type, fold) while keeping every parity-sensitive unknown an explicit
knob (SURVEY.md §7 hard part 1): activation slope, batch-norm on/off,
pooling window, scheduler sign convention, LR decay.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

# Patch sizes used by the reference's dynamic multi-context training
# (SURVEY.md C12: lambda in {25,...,65}).
DEFAULT_SCALES = (25, 35, 45, 55, 65)

DISTRIBUTION_TYPES = ("single_fixed", "multi_fixed", "uniform", "multinomial",
                      "multinomial_stratified")
UPDATE_TYPES = ("acc", "loss", "balanced_acc")
NET_TYPES = (
    "dilated_icpr_rate6",
    "dilated_icpr_rate6_densely",
    "dilated_grsl",
    "dilated_grsl_rate8",
    "dilated_icpr_original",
)
DATASETS = ("coffee", "grss_dfc_2014", "vaihingen", "potsdam", "synthetic",
            "synthetic_multi", "synthetic_texture")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture knobs shared by all dilated network variants."""

    net_type: str = "dilated_icpr_rate6"
    num_classes: int = 2
    num_input_bands: int = 3
    # Reference nets use batch-norm + leaky ReLU inside each conv block
    # (SURVEY.md C6, MED confidence on slope; TF default slope is 0.2).
    leaky_slope: float = 0.1
    use_batch_norm: bool = True
    # BN running-statistics momentum (0.9 = reference-parity; the r4
    # collapse diagnosis measured the late-LR oscillation as BN-coupled,
    # making this the knob on that feedback loop).
    bn_momentum: float = 0.9
    # Stride-1 SAME max-pool window interleaved between conv blocks
    # (SURVEY.md §3.3: 3x3, stride 1).
    pool_window: int = 3
    # Compute dtype for convolutions; params always float32. bfloat16 keeps
    # the MXU fed at full rate on TPU; float32 for parity tests.
    compute_dtype: str = "float32"
    # Channel-width multiplier on every conv block (1.0 = reference width).
    # <1 gives cheap models for CPU tests / ablations.
    width_multiplier: float = 1.0
    # Dropout keep-prob on the final feature map (reference passes a dropout
    # placeholder; exact rate LOW confidence — default off).
    dropout_rate: float = 0.0
    # Backward implementation for the stride-1 max pools: "xla"
    # (select_and_scatter) or "pallas" ((H*W, C)-layout equality-mask
    # kernel with tie-split subgradient — dynseg/ops/pool.py, K4).
    pool_backward: str = "xla"
    # Conv implementation for the quantized (int8) serving blocks:
    # "xla" (DEFAULT) = the Mosaic conv emitter with XLA-fused epilogue
    # — measured fastest in the full net (DESIGN.md K5: the Pallas
    # kernel wins only against the conv-ONLY emitter; against the
    # shipped fused configuration it ties per-block at best and loses
    # 1.7x in-net to lost fusion). "auto" = the K5 kernel on TPU when
    # the geometry gate passes; "pallas" = force it (interpret on CPU;
    # tests). Both kept as the experiment's record, K1/K4-style.
    quant_conv: str = "xla"


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Dynamic patch-size scheduler (SURVEY.md C12)."""

    distribution_type: str = "multinomial"
    values: Sequence[int] = DEFAULT_SCALES
    # Score source: batch accuracy or batch loss (reference flag update_type).
    update_type: str = "acc"
    # EMA factor for score updates (exact reference rule MED confidence —
    # SURVEY.md §3.4 says EMA or running mean).
    ema: float = 0.9
    # Sign convention (SURVEY.md §7 hard part 1): if True, the multinomial
    # favours scales with HIGH score (exploit well-performing contexts —
    # the paper's reading); if False it favours LOW score (train the
    # struggling contexts harder). Bracketable for parity.
    favor_high_score: bool = True
    # Temperature for the multinomial over normalized scores.
    temperature: float = 1.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization & loop settings (SURVEY.md C11, C13)."""

    learning_rate: float = 0.01
    # Optional exponential LR decay (LOW confidence in reference; off = flat).
    lr_decay_rate: float = 1.0
    lr_decay_steps: int = 50000
    momentum: float = 0.9
    weight_decay: float = 5e-4
    batch_size: int = 100
    niter: int = 200000
    # Keep per-step *pixel count* roughly constant across patch sizes so
    # memory and loss magnitudes stay comparable between buckets
    # (SURVEY.md §7 hard part 2). If True, batch for scale s becomes
    # round(batch_size * (values[0]/s)**2), floored at 8.
    rescale_batch_by_area: bool = False
    eval_every: int = 500
    checkpoint_every: int = 1000
    # Optimizer steps fused into one device launch (lax.scan). 1 ==
    # reference-exact per-batch scheduler feedback; >1 amortizes the
    # ~10 ms per-launch dispatch overhead of remote/tunneled TPUs
    # (scores then update once per chunk with chunk-mean metrics).
    steps_per_call: int = 1
    # Shard the TILE axis across the data mesh instead of replicating:
    # each chip holds 1/n of the training tiles and gathers its batch
    # shard from them (shard_map), so datasets n times larger than one
    # chip's HBM train without host streaming. Requires tiles >> devices
    # (per-device class balance draws from the local shard only).
    shard_tiles: bool = False
    # Scheduler-metric fetches trail this many launches behind (async
    # device->host copies overlap compute; a scalar fetch is a full
    # tunnel round-trip). Default 1 = reference-like one-step-stale
    # feedback; 4 hides the round-trip entirely (2.4x faster loop at
    # steps_per_call=1) at the cost of scores lagging 4 batches.
    metric_fetch_depth: int = 1
    # Per-step exponential moving average of the params (0 = off).
    # Second shipped mitigation (besides keep_best) for the clean-horizon
    # "final-iterate lottery" (BENCHMARKS.md r4 collapse diagnosis): late
    # training at constant LR oscillates, so the last iterate is a
    # lottery draw; the EMA iterate averages across the oscillation
    # without needing validation-based selection. Tracked INSIDE the
    # optimizer state (train.track_ema appended to the optax chain), so
    # TrainState/checkpoint layouts are unchanged when off and old
    # checkpoints restore as before. Typical value 0.999.
    ema_decay: float = 0.0
    # BatchNorm recalibration batches for the EMA weights at the end of
    # training (the SWA companion step; 0 disables). Measured decisive:
    # the EMA iterate is on-manifold but the LIVE BN statistics track
    # the raw oscillating iterate — 25 recalibrated batches flipped the
    # donor cell from -12.7pp to +4.7pp vs the raw final (BENCHMARKS.md
    # "Params EMA"). Stored in the stats sidecar; served automatically
    # with --use_ema/auto.
    ema_recalib_batches: int = 50
    seed: int = 0
    # Data-parallel device count; 1 = single chip. The mesh axis is "data".
    num_devices: int = 1
    output_path: str = "/tmp/dynseg_out"
    resume: bool = False


@dataclasses.dataclass(frozen=True)
class InferConfig:
    """Full-tile multi-scale sliding-window inference (SURVEY.md C15)."""

    # Window stride as a fraction of the window size (MED confidence:
    # reference stride ≈ λ/2 — SURVEY.md C15).
    stride_fraction: float = 0.5
    # Batch of windows per device step.
    window_batch: int = 256
    # Scales fused at test time; default: the training schedule's values.
    scales: Sequence[int] = DEFAULT_SCALES
    # True when --test_scales was passed explicitly (vs derived from
    # --values): an explicit list is honored even when a restored
    # checkpoint was trained at different scales (warned, not silent).
    scales_explicit: bool = False
    save_prediction_maps: bool = True
    # Per-tile green/red correctness PNGs for error analysis (beyond ref).
    save_error_maps: bool = False
    # "window": reference-parity multi-scale sliding-window softmax voting.
    # "dense": TPU-native blockwise whole-tile forward (one forward per
    # pixel, full receptive field, ~20x less compute; exact via halo).
    mode: str = "window"
    dense_block: int = 256
    # Must be >= the net's receptive-field radius (~34 rate6, ~37 rate8).
    dense_halo: int = 40
    # Blocks batched per device per forward. The v5e conv emitter runs
    # ~2x faster when the batch dim fills the 8-wide sublane tiling
    # (measured: (8,592,592,3) 95 TF/s vs (1,592,592,3) 47 —
    # scripts/mfu_probe.py, r3); 0 = auto (8 when the tile has enough
    # blocks, else all remaining — never pads small tiles with wasted
    # duplicate compute).
    dense_block_batch: int = 0
    # Window batches fused per device launch (a lax.scan of this static
    # length). Fixed-size chunks make every compiled program independent
    # of the tile size — a workload of many odd-sized tiles compiles ONE
    # program per scale, not one per (tile-shape, scale) — while an async
    # host loop over chunks (donated accumulators chain them) keeps the
    # device saturated past the per-launch dispatch latency.
    scan_chunk: int = 8
    # Grid-fold overlap-add (r5): the λ/2 window grid decomposes into
    # k×k classes of NON-overlapping windows (k = ceil(s/stride)); each
    # class places as one dense pad→transpose→reshape canvas add,
    # replacing the sequential per-window RMW loop that measured 41% of
    # the window pass at s=25 (docs/k3_overlap_probe.json; 1.41×
    # measured at that scale). Programs are per-(tile h,w, scale) —
    # "auto" enables it only on a single device AND when the tile set
    # has ≤4 distinct valid shapes (unequal tile sets would compile per
    # shape; the legacy chunked path stays shape-independent). "on"
    # forces it for any shape count (still single-device only); "off"
    # keeps the sequential accumulator everywhere.
    window_fold: str = "auto"
    dense_scan_chunk: int = 4
    # Test sets above this budget stream tile-by-tile from host instead
    # of living in HBM (peak device memory = one padded tile + buffers).
    hbm_budget_gb: float = 10.0
    # ISPRS benchmark protocol: also report metrics against ground truth
    # with class boundaries eroded by this Chebyshev radius (~3 px on
    # Vaihingen/Potsdam). 0 = full-GT metrics only (reference default).
    eroded_boundary_radius: int = 0
    # Test-time dihedral augmentation: average softmax maps over the 8
    # rotations/flips (beyond reference; 8x inference compute, on device).
    tta: bool = False
    # Post-training int8 serving path (beyond reference; ops/quant.py):
    # "int8" quantizes conv blocks whose channel dims are both >=
    # quant_min_ch — the measured v5e win region (docs/DESIGN.md int8
    # probe) — with per-channel weight scales and per-tensor activation
    # scales calibrated at the quant_calib_pct percentile of |input|
    # over quant_calib_crops sample crops of the bound tiles.
    quant: str = "none"
    quant_min_ch: int = 128
    quant_calib_pct: float = 99.9
    quant_calib_crops: int = 8
    # Also run the FINAL block's pool + head input in int8 (approximate
    # — the head input is quantized; measured ~+4% dense on top of the
    # interior streaming, 14.0->14.6 Mpx/s). Off by default: the
    # interior path is exact.
    quant_exit: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"
    dataset_path: str = ""
    fold: int = 0
    # Per-class balanced sampling of patch centers (SURVEY.md C4).
    balanced_sampling: bool = True
    # Cap each class's position table to a random subsample (0 = all
    # labeled pixels). Bounds host RAM on production-size label volumes
    # (12 bytes/position; full Potsdam ~8.6 GB uncapped).
    max_positions_per_class: int = 0
    # Random 90-degree rotations + flips (the 8-element dihedral group),
    # applied identically to image and label patches (SURVEY.md C5).
    augment: bool = True
    # ISPRS published protocol (SURVEY.md C2c/C2d): comma-separated
    # validation tile ids (Vaihingen area numbers e.g. "11,15,28,30,34";
    # Potsdam grid ids e.g. "2_12,3_12"). Empty = the dataset's default
    # named split (datasets.VAIHINGEN_VAL_TILES / POTSDAM_VAL_TILES).
    val_tiles: str = ""
    # Potsdam image source: "rgb" | "irrg" | "rgbir" (Vaihingen top tiles
    # are inherently IRRG). Empty = dataset default ("rgb" for Potsdam).
    bands: str = ""
    # Extra channels appended to the imagery: "dsm", "ndsm" or both.
    extra_bands: str = ""
    # JSON dict of extra loader kwargs (--dataset_kwargs): generic escape
    # hatch, mainly for the synthetic generators' knobs (size, num_tiles,
    # class_probs, label_noise, ...). Stored as the raw string so the
    # frozen config stays hashable; parsed in cli._loader_kwargs.
    dataset_kwargs: str = ""


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    sched: SchedulerConfig = SchedulerConfig()
    train: TrainConfig = TrainConfig()
    infer: InferConfig = InferConfig()
    data: DataConfig = DataConfig()

    def validate(self) -> "Config":
        """Raise ValueError (not assert — those vanish under -O) with an
        actionable message for every inconsistent setting."""
        def check(ok, msg):
            if not ok:
                raise ValueError(f"invalid config: {msg}")

        check(self.model.net_type in NET_TYPES,
              f"net_type {self.model.net_type!r} not in {sorted(NET_TYPES)}")
        check(self.sched.distribution_type in DISTRIBUTION_TYPES,
              f"distribution_type {self.sched.distribution_type!r} not in "
              f"{sorted(DISTRIBUTION_TYPES)}")
        check(self.sched.update_type in UPDATE_TYPES,
              f"update_type {self.sched.update_type!r} not in "
              f"{sorted(UPDATE_TYPES)}")
        check(self.data.dataset in DATASETS,
              f"dataset {self.data.dataset!r} not in {sorted(DATASETS)}")
        check(len(self.sched.values) >= 1, "--values must name >=1 patch size")
        check(all(int(v) >= 1 for v in self.sched.values),
              f"patch sizes must be >=1, got {tuple(self.sched.values)}")
        check(len(set(self.sched.values)) == len(self.sched.values),
              f"--values has duplicates: {tuple(self.sched.values)} — a "
              f"duplicated scale double-weights the multinomial and then "
              f"collapses on checkpoint restore (schedule changes across "
              f"a resume)")
        check(self.train.batch_size >= 1,
              f"batch_size must be >=1, got {self.train.batch_size}")
        check(self.train.niter >= 0,
              f"niter must be >=0, got {self.train.niter}")
        check(self.train.num_devices >= 1,
              f"num_devices must be >=1, got {self.train.num_devices}")
        check(self.train.steps_per_call >= 1,
              f"steps_per_call must be >=1, got {self.train.steps_per_call}")
        check(0.0 <= self.train.ema_decay < 1.0,
              f"ema_decay must be in [0, 1), got {self.train.ema_decay} "
              f"(0 disables; 1.0 would freeze the EMA at initialization)")
        check(0 < self.infer.stride_fraction,
              f"stride_fraction must be >0, got {self.infer.stride_fraction}")
        check(self.infer.window_batch >= 1,
              f"window_batch must be >=1, got {self.infer.window_batch}")
        check(self.infer.mode in ("window", "dense"),
              f"inference mode {self.infer.mode!r} not in ('window','dense')")
        check(self.infer.window_fold in ("auto", "on", "off"),
              f"window_fold {self.infer.window_fold!r} not in "
              f"('auto','on','off')")
        check(self.infer.eroded_boundary_radius >= 0,
              "eval_eroded_boundaries must be >=0")
        check(self.infer.dense_block >= 1,
              f"dense_block must be >=1, got {self.infer.dense_block}")
        check(self.infer.dense_block_batch >= 0,
              f"dense_block_batch must be >=0 (0 = auto), got "
              f"{self.infer.dense_block_batch}")
        check(self.infer.dense_halo >= 0,
              f"dense_halo must be >=0, got {self.infer.dense_halo} "
              f"(wrong block slicing; use 0 for the cheapest approximate "
              f"dense mode)")
        check(not self.train.shard_tiles or self.train.num_devices > 1,
              "--shard_tiles requires --num_devices > 1 (a device mesh "
              "to shard the tile axis over)")
        check(0.0 <= self.sched.ema < 1.0,
              f"sched_ema must be in [0, 1), got {self.sched.ema} "
              f"(1.0 would freeze scores; >1 diverges)")
        check(self.sched.temperature > 0.0,
              f"sched_temperature must be > 0, got {self.sched.temperature}")
        check(self.infer.quant in ("none", "int8"),
              f"quant {self.infer.quant!r} not in ('none', 'int8')")
        check(self.infer.quant_min_ch >= 1,
              f"quant_min_ch must be >=1, got {self.infer.quant_min_ch}")
        check(0.0 < self.infer.quant_calib_pct <= 100.0,
              f"quant_calib_pct must be in (0, 100], got "
              f"{self.infer.quant_calib_pct}")
        check(self.infer.quant_calib_crops >= 1,
              f"quant_calib_crops must be >=1, got "
              f"{self.infer.quant_calib_crops}")
        check(not (self.infer.quant != "none" and self.infer.quant_exit
                   and self.model.net_type == "dilated_icpr_rate6_densely"),
              "--quant_exit requires sequential wiring — the dense-concat "
              "variant has no single exit stream (drop --quant_exit)")
        if self.infer.quant != "none":
            # Feasibility is decidable from the config alone — refuse at
            # startup, not after hours of training + restore (review).
            from dynseg.ops.quant import quant_plan

            check(any(quant_plan(self.model, self.model.num_input_bands,
                                 min_ch=self.infer.quant_min_ch)),
                  f"--quant int8 selects no blocks for "
                  f"{self.model.net_type} at width "
                  f"{self.model.width_multiplier} with --quant_min_ch "
                  f"{self.infer.quant_min_ch}: every layer is below the "
                  f"measured int8 win threshold — run without --quant or "
                  f"lower --quant_min_ch")
        check(self.model.pool_backward in ("xla", "pallas"),
              f"pool_backward {self.model.pool_backward!r} not in "
              f"('xla', 'pallas')")
        check(self.model.quant_conv in ("auto", "xla", "pallas"),
              f"quant_conv {self.model.quant_conv!r} not in "
              f"('auto', 'xla', 'pallas')")
        extra = tuple(b.strip() for b in self.data.extra_bands.split(",")
                      if b.strip())
        check(all(b in ("dsm", "ndsm") for b in extra),
              f"extra_bands {self.data.extra_bands!r}: accepted values are "
              f"dsm, ndsm")
        return self
