"""transhuman_tpu — TPU-native (JAX/XLA/Pallas) generalizable neural human rendering.

A from-scratch reimplementation of the capabilities of TransHuman (ICCV 2023,
pansanity666/TransHuman): painted-SMPL canonicalization, k-means vertex-token
grouping, the TransHE transformer over human-part tokens, DPaRF deformable part
coordinate frames, multi-view pixel-aligned feature fusion, and conditional-NeRF
volume rendering — designed TPU-first (static shapes, MXU-sized matmuls, Pallas
kernels for the kNN/aggregation hot path, pjit/shard_map data- and ray-parallel
execution over a device mesh).

Layout:
    config      — typed config tree with YAML + CLI-opts merge (reference-compatible keys)
    registry    — string -> constructor plugin registry (replaces imp.load_source)
    geometry/   — cameras, rays, SMPL LBS, k-means cluster pooling (pure math)
    data/       — host-side input pipeline (ZJU-MoCap + synthetic), fixed-shape batches
    models/     — encoder CNN, TransHE ViT, DPaRF binding, NeRF heads (flax)
    render/     — volume rendering orchestration: the jitted render step
    experiments/ — measured-negative Pallas kernel experiments (see docs/PERF.md)
    parallel/   — device mesh + sharding helpers (DP training, ray-sharded inference)
    train/      — loss (MSE + LPIPS), optimizer/schedule, train step, checkpointing
    eval/       — PSNR/SSIM/LPIPS evaluator
    viz/        — free-viewpoint video rendering
    mesh_ops/   — density-grid marching cubes (C++ kernel) + PLY export
    tools/      — torch checkpoint converter, k-means regeneration
    cli/        — train / run entry points mirroring the reference CLI
"""

__version__ = "0.1.0"
