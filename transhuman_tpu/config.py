"""Typed configuration tree.

Replaces the reference's vendored-yacs global mutable singleton
(`/root/reference/lib/config/config.py`, `lib/config/yacs.py`) with plain
dataclasses threaded explicitly.  YAML files written for the reference
(`configs/train_or_eval.yaml` et al.) load unchanged: key names and the
CLI ``opts`` override list (``key value key value ...`` with dotted paths)
are kept compatible.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional


def _parse_scalar(v: str) -> Any:
    """Parse a CLI override string the way yacs' literal_eval merge did."""
    if not isinstance(v, str):
        return v
    low = v.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("none", "null"):
        return None
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    if v.startswith(("[", "(", "{")) or "," in v:
        # yacs literal_evals every override, so the reference's shell
        # scripts pass lists as bare comma strings: `test.input_view 0,7,15`
        # -> (0, 7, 15), and one-element lists with a trailing comma:
        # `test.target_view 3,` -> (3,)  (reference scripts/test.sh:26-28).
        import ast

        try:
            out = ast.literal_eval(v)
            return list(out) if isinstance(out, tuple) else out
        except (ValueError, SyntaxError):
            pass
    return v


@dataclass
class PatchConfig:
    """Patch-based ray sampling (reference `configs/train_or_eval.yaml:71-76`)."""

    use_patch_sampling: bool = True  # False -> N_rand random-ray sampling + masked MSE
    sample_subject_ratio: float = 0.8
    N_patches: int = 6
    size: int = 20


@dataclass
class SchedulerConfig:
    """Warmup + cosine LR schedule (reference `lib/train/scheduler.py:21-28`)."""

    type: str = "cosine"
    warmup_epochs: int = 300
    decay_epochs: int = 3000
    end_lr: float = 1e-6


@dataclass
class TrainConfig:
    batch_size: int = 1
    lr: float = 7e-4
    epoch: int = 3000
    num_workers: int = 1
    optim: str = "adam"
    weight_decay: float = 0.0
    shuffle: bool = True
    accum_steps: int = 1  # gradient accumulation: split each device's local
    # batch into this many sequential microbatches with averaged gradients
    # (train/step.py::accum_value_and_grad; BN stats pool per microbatch)
    cull: bool = False  # route the TRAINING decode through the same
    # SMPL-distance cull (+ static-capacity compaction) as inference.
    # DELIBERATE semantics change vs the reference, which trains unculled
    # (if_clight_renderer.py:486-498): off-body sample points contribute
    # raw=0 and receive no gradient — i.e. training optimizes exactly the
    # function inference serves.  Survivor-proportional step costs (the
    # d_feat engine, decode fwd/bwd) shrink ~with the ~19% cull fraction.
    # Monitor the 'overflow' stat (must stay 0) and see docs/SCALING.md.
    cull_ratio: float = 0.35  # static decode capacity as a fraction of
    # rays*samples when train.cull is on; >= 1.0 decodes every point with
    # culled ones masked (the semantics oracle, no compaction speedup);
    # <= 0 = AUTO — the train CLI sizes it from the measured survivor
    # fraction of the first train samples (recommended; docs/SCALING.md
    # attribution table — most of the culled-step win is capacity matching
    # the data).  Clipped points beyond capacity lose contribution AND
    # gradient; the step's 'overflow' stat + trainer warning guard a miss.
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)


@dataclass
class TestConfig:
    sampler: str = "FrameSampler"
    batch_size: int = 1
    collator: str = ""
    epoch: int = -1
    full_eval: bool = False
    exp_folder_name: str = "debug"
    time_det: int = 20
    input_view: List[int] = field(default_factory=lambda: [0, 7, 15])
    target_view: List[int] = field(default_factory=lambda: [3, 5, 10, 12, 18, 20])
    mode: str = "model_x_motion_x"
    frame_interval: int = 30  # FrameSampler decimation (reference samplers.py:150-155)


@dataclass
class Config:
    """Top-level config. Defaults mirror `configs/train_or_eval.yaml` merged over
    `lib/config/config.py:9-123` defaults."""

    exp_name: str = "transhuman_tpu"
    task: str = "transhuman"

    # --- plugin selection (registry names, replacing *_module/_path pairs;
    # each routed through transhuman_tpu.registry at the construction site,
    # so an unknown name fails loudly with the known options) ---
    dataset: str = "zju"  # [zju | synthetic]
    network: str = "transhuman"
    renderer: str = "clight"
    trainer: str = "clight"
    evaluator: str = "if_nerf"
    visualizer: str = "perform"

    # --- dataset options ---
    ratio: float = 0.5
    H: int = 1024
    W: int = 1024
    white_bkgd: bool = False
    mask_bkgd: bool = True
    N_rand: int = 1024
    perturb: float = 1.0
    train_num_views: int = 3
    time_steps: int = 1
    time_mult: List[int] = field(default_factory=lambda: [0, -20, 20])
    data_root: str = "data/zju_mocap"
    rasterize_root: str = "data/zju_rasterization"
    smpl_dir: str = "data/smplx/smpl"
    kmeans_dir: str = "data/kmeans_dict"
    big_box: bool = False
    rot_ratio: float = 0.0
    vertices: str = "new_vertices"
    params: str = "new_params"
    use_viz_test: bool = True
    rasterize: bool = True
    jitter: bool = True
    depth_map: bool = False
    depth_vizmap: bool = False
    depth_root: str = "data/zju_depth_map_train"

    # --- misc ---
    gpus: List[int] = field(default_factory=lambda: [0])
    seed: int = 123
    use_record: bool = True
    log_interval: int = 1
    record_interval: int = 20
    N_samples: int = 64
    save_freq: int = 5
    save_latest_ep: int = 5
    ep_iter: int = 500
    resume: bool = True
    specified_resume: str = ""
    run_mode: str = "train"  # ['train' | 'test']

    # --- architecture ---
    pretrained: bool = True
    encoder_weights: str = ""  # converted ResNet18 weights (.npz); '' = random init
    lpips_weights: str = ""  # converted LPIPS-VGG weights (.npz); '' = disable LPIPS
    lpips_backbone: str = ""  # converted VGG16 backbone .npz when lpips_weights is lins-only
    xyz_res: int = 10
    view_res: int = 4
    raw_noise_std: float = 0.0
    vit_depth: int = 12
    vit_variant: str = "tiny"  # [tiny | small | base] (vision_transformer.py:404-417)
    num_class: int = 300  # TransHE token count
    KNN: int = 7
    KNN_FREQ: int = 10
    KNN_DIST_ALPHA: float = 0.5
    KNN_SIGMA: float = 0.25
    use_truncation: bool = False

    # --- TPU execution policy (new; no reference analog) ---
    compute_dtype: str = "float32"  # [float32 | bfloat16] for the network forward
    chunk_size: int = 32768  # points per inference chunk (if_clight_renderer.py:575)
    cull_distance: float = 0.1  # SMPL-distance point cull (if_clight_renderer.py:442)
    cull_radii: str = ""  # npz of per-vertex cull radii (key 'radii', (Nv,))
    # measured from a trained model by tools/measure_vertex_radii.py:
    # replaces the uniform cull_distance shell with dist(p, v) < r_v —
    # fewer survivors => faster decode on the descriptor-bound render path.
    # Opt-in; tightening the shell changes outputs by at most the deltas
    # the tool reports (docs/PERF.md "Per-vertex cull radii").
    pad_bucket: int = 8192  # ray-count padding granularity for static shapes
    use_pallas_knn: bool = False  # fused Pallas DPaRF kernel (experiments/dparf.py;
    # measured slower than the XLA composition on v5e — see its docstring)
    compact_ratio: Optional[float] = 0.3  # static-capacity compaction: decode
    # only culled-survivor points packed into ratio*N slots (the reference's
    # dynamic pts[mask] indexing, cross_transformer.py:229-242, as a static
    # TPU program).  None disables.  Default justified by measurement:
    # tools/measure_compact_ratio over varied synthetic poses reports a max
    # prefilter-superset fraction of 0.19 (recommended 0.22 at 1.15x margin);
    # 0.3 adds further headroom, and a clip is SAFE anyway — the CLI
    # auto-re-renders the frame with compaction off on overflow (cli/run.py
    # ::FrameRenderer).  Re-measure on your data with the tool.
    mesh_axis_data: int = 0  # data-parallel mesh size for training (0 = all
    # local devices, the reference's DDP-over-all-GPUs default)
    mesh_axis_rays: int = 1  # ray/sequence-parallel mesh size for inference
    mesh_axis_model: int = 1  # tensor-parallel mesh size for training: > 1
    # trains on a ('data','model') mesh with the ViT params + Adam moments
    # sharded over 'model' (parallel/tp.py; for vit_small/vit_base scale)
    remat: bool = False  # rematerialize the point decode in the train
    # backward (jax.checkpoint): peak activation memory stops scaling with
    # rays-per-step at the cost of ~one extra decode forward; gradients are
    # unchanged (render/pipeline.py)

    # --- ray sampling ---
    patch: PatchConfig = field(default_factory=PatchConfig)
    face_sample_ratio: float = 0.0
    body_sample_ratio: float = 0.5
    sample_fg_ratio: float = 0.7

    # --- loss ---
    l2rec_weight: float = 1.0
    lpips_weight: float = 0.1

    # --- mesh reconstruction ---
    mesh_th: float = 20.0
    voxel_size: List[float] = field(default_factory=lambda: [0.005, 0.005, 0.005])

    # --- free-viewpoint rendering ---
    render_views: int = 100

    # --- output dirs ---
    trained_model_dir: str = "data/trained_model"
    record_dir: str = "data/record"
    result_dir: str = "data/result"

    # --- observability (no reference analog; SURVEY §5.1 TPU plan) ---
    profile_dir: str = ""  # non-empty: capture a jax.profiler trace of a
    # steady-state window (train: steps 5-8 of the first epoch; run: the 3rd
    # frame) into this dir — viewable in TensorBoard/Perfetto/xprof

    train: TrainConfig = field(default_factory=TrainConfig)
    test: TestConfig = field(default_factory=TestConfig)

    # ------------------------------------------------------------------
    @property
    def embed_size(self) -> int:
        """ViT token dim; the reference writes this back into cfg at model build
        (cross_transformer.py:91). Here it is derived from vit_variant."""
        return {"tiny": 192, "small": 384, "base": 768}[self.vit_variant]

    @property
    def img_feat_size(self) -> int:
        """Pixel-aligned feature channels: ResNet pyramid 64+64+128 plus the
        128-ch color conv (encoder.py:85,123,144-146)."""
        return 256 + 128

    @property
    def H_render(self) -> int:
        return int(self.H * self.ratio)

    @property
    def W_render(self) -> int:
        return int(self.W * self.ratio)

    # ------------------------------------------------------------------
    def merge_dict(self, d: dict) -> "Config":
        return _merge_into(self, d)

    def merge_opts(self, opts: List[str]) -> "Config":
        """yacs merge_from_list compatible: ['a.b', '1', 'c', 'true', ...]."""
        if not opts:
            return self
        assert len(opts) % 2 == 0, f"opts must be key/value pairs, got {opts}"
        d: dict = {}
        for k, v in zip(opts[0::2], opts[1::2]):
            node = d
            parts = k.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            # raw string: _merge_into parses it against the field's type
            node[parts[-1]] = v
        return self.merge_dict(d)

    @classmethod
    def from_yaml(cls, path: Optional[str] = None, opts: Optional[List[str]] = None) -> "Config":
        cfg = cls()
        if path:
            import yaml

            with open(path) as f:
                loaded = yaml.safe_load(f) or {}
            cfg = cfg.merge_dict(loaded)
        if opts:
            cfg = cfg.merge_opts(list(opts))
        return cfg


# Reference YAML keys that have no analog here (module paths handled by the
# registry, GPU/global-iter bookkeeping handled by JAX) — silently ignored on load.
_IGNORED_KEYS = {
    "dataset_module", "dataset_path", "cross_transformer_network_module",
    "cross_transformer_network_path", "renderer_module", "renderer_path",
    "trainer_module", "trainer_path", "evaluator_module", "evaluator_path",
    "visualizer_module", "visualizer_path", "global_iter", "flag_train",
    "img_feat_size", "embed_size", "local_rank", "distributed",
}

# Reference keys whose values are remapped rather than copied verbatim.
_RENAMED_KEYS = {}


def _merge_into(obj, d: dict):
    """Recursively merge a plain dict into a dataclass, returning a new one."""
    if not dataclasses.is_dataclass(obj):
        return d
    fields = {f.name: f for f in dataclasses.fields(obj)}
    updates = {}
    for k, v in d.items():
        if k in _IGNORED_KEYS:
            continue
        k = _RENAMED_KEYS.get(k, k)
        if k == "dataset" and isinstance(v, str) and v in ("h36m", "thu"):
            # the reference YAML documents dataset: [zju | h36m | thu]
            # (configs/train_or_eval.yaml:26) and all three load the zju
            # layout; OTHER names pass through verbatim so a
            # DATASETS.register'd custom dataset is honored and a typo
            # fails loudly at registry lookup instead of silently
            # training on the zju loader
            v = "zju"
        if k not in fields:
            raise KeyError(f"Unknown config key: {k!r}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur):
            if not isinstance(v, dict):
                raise TypeError(
                    f"config key {k!r} is a section; got scalar {v!r}"
                )
            updates[k] = _merge_into(cur, v)
        else:
            if isinstance(v, str):
                parsed = _parse_scalar(v)
                # str-typed fields take values verbatim: `exp_name 1,2` is
                # the string "1,2", not [1, 2] (yacs would raise a type
                # mismatch; keeping the string is the useful behavior)
                v = v if isinstance(cur, str) else parsed
            updates[k] = _check_type(k, cur, v)
    return dataclasses.replace(obj, **updates)


def _check_type(key, cur, new):
    """yacs-style merge type check (yacs.py _check_and_coerce_cfg_value_type
    analog): silently replacing a list field with a scalar (or a float with
    a list from a comma typo) corrupts the config far from the merge site.
    int widens to float; None accepts anything (optional fields); list and
    tuple interchange."""
    if cur is None or new is None:
        return new
    if type(new) is type(cur):
        return new
    if isinstance(cur, float) and type(new) is int:
        return float(new)
    if isinstance(cur, (list, tuple)) and isinstance(new, (list, tuple)):
        return type(cur)(new)
    hint = ""
    if isinstance(cur, (list, tuple)) and not isinstance(new, (list, tuple)):
        hint = " (list field: a single value needs a trailing comma, e.g. '3,')"
    raise TypeError(
        f"config key {key!r}: expected {type(cur).__name__}, got "
        f"{type(new).__name__} ({new!r}){hint}"
    )
