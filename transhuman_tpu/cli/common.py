"""Shared CLI plumbing: arg parsing, asset loading, pipeline construction."""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from ..config import Config
from ..geometry.clusters import ClusterSpec
from ..geometry.smpl import SMPLModel
from ..models.network import TransHumanNet  # noqa: F401  registers 'transhuman'
from ..render.pipeline import RenderPipeline  # noqa: F401  registers 'clight'


def maybe_init_distributed():
    """Multi-host bring-up (the torch.distributed.launch / env:// analog,
    train_net.py:116-123).  Explicit env triple JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID initializes directly; on managed
    clusters (Cloud TPU pods, SLURM) jax.distributed auto-detects, so the
    triple is only needed for hand-rolled launches.  Used by the train CLI
    (DP training) and the run CLI (frame-sharded evaluation)."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    import jax

    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(os.environ["JAX_PROCESS_ID"]),
    )


def _honor_jax_platforms_env():
    """Apply JAX_PLATFORMS via jax.config: some PJRT plugins (the axon TPU
    tunnel) ignore the environment variable, which silently puts CPU-only
    runs on the TPU."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # backends already initialized


def parse_args(argv=None, need_type: bool = False, allow_test: bool = False):
    _honor_jax_platforms_env()
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", default=None)
    if allow_test:
        p.add_argument(
            "--test", action="store_true",
            help="validation pass instead of training (train_net.py --test):"
            " weights-only load, val loss stats + evaluator over the test"
            " split",
        )
    if need_type:
        p.add_argument(
            "--type",
            default="evaluate",
            choices=["evaluate", "visualize", "reconstruction", "light_stage"],
        )
        p.add_argument("--ply", default=None, help="light_stage: input .ply")
        p.add_argument("--occupancy_out", default=None,
                       help="light_stage: output .npy")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args(argv)
    cfg = Config.from_yaml(args.cfg_file, args.opts)
    return args, cfg


def load_smpl(cfg: Config) -> SMPLModel:
    try:
        return SMPLModel.load(cfg.smpl_dir)
    except (FileNotFoundError, OSError):
        print(
            f"WARNING: SMPL pickle not found under {cfg.smpl_dir!r}; "
            "using the synthetic stand-in body (tests/benchmarks only)."
        )
        return SMPLModel.synthetic()


def _cache_dir() -> str:
    """User-owned cache dir (never a world-writable shared tmp: the cache is
    trusted input, see load_cluster_spec).  Override: TRANSHUMAN_CACHE_DIR."""
    d = os.environ.get("TRANSHUMAN_CACHE_DIR")
    if not d:
        d = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "transhuman_tpu",
        )
    return d


def load_cluster_spec(cfg: Config, smpl: SMPLModel) -> ClusterSpec:
    path = os.path.join(cfg.kmeans_dir, f"kmeans_dict_{cfg.num_class}.npy")
    if os.path.exists(path):
        return ClusterSpec.load_reference_dict(path)
    # no dict on disk: run k-means once and cache the result, keyed by the
    # template contents — every CLI invocation (train, --test, run) builds a
    # runtime, and re-clustering 6890 verts each time is ~minutes of host
    # work on small machines.  The cache is a pickle-FREE npz (just the
    # assignment vector) in a user-owned dir: loading a pickle from a
    # predictable world-writable path would execute whatever another local
    # user planted there.
    import hashlib

    v = np.ascontiguousarray(smpl.v_template, np.float32)
    key = hashlib.sha256(v.tobytes() + str(cfg.num_class).encode()).hexdigest()[:16]
    cache = os.path.join(_cache_dir(), f"kmeans_{cfg.num_class}_{key}.npz")
    if os.path.exists(cache):
        try:
            with np.load(cache, allow_pickle=False) as z:
                spec = ClusterSpec(z["vert2cluster"], int(z["num"]))
            print(f"WARNING: {path} not found; using cached on-the-fly "
                  f"k-means ({cache}).")
            return spec
        except Exception as e:  # stale/truncated cache: recluster
            print(f"WARNING: ignoring unreadable k-means cache {cache}: {e}")
    print(f"WARNING: {path} not found; running k-means over the template.")
    spec = ClusterSpec.from_kmeans(v, cfg.num_class)
    try:
        os.makedirs(_cache_dir(), exist_ok=True)
        tmp = cache + f".{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            np.savez(f, vert2cluster=spec.vert2cluster,
                     num=np.int64(spec.num_clusters))
        os.replace(tmp, cache)  # atomic: concurrent processes race safely
    except OSError:
        pass  # read-only home: caching is best-effort
    return spec


def make_dataset(cfg: Config, split: str, smpl=None, **kw):
    """Registry-routed dataset construction — the reference's config-named
    plugin dispatch (`make_dataset.py:57-91` via `imp.load_source`) as a
    name lookup: `cfg.dataset` picks the implementation ('zju' loads the
    on-disk ZJU-MoCap layout, 'synthetic' the procedural in-memory body)."""
    from ..data import synthetic, zju  # noqa: F401  (register implementations)
    from ..registry import DATASETS

    return DATASETS.get(cfg.dataset)(cfg, split, smpl=smpl, **kw)


def build_runtime(
    cfg: Config,
    axis_name=None,
    chunk_rays: Optional[int] = None,
    smpl: Optional[SMPLModel] = None,
    pe_table=None,
):
    """Returns (model, pipe, smpl, cluster).  cfg.network / cfg.renderer pick
    the implementations by registry name (the reference's make_network.py /
    make_renderer.py plugin dispatch)."""
    from ..registry import NETWORKS, RENDERERS

    if smpl is None:
        smpl = load_smpl(cfg)
    cluster = load_cluster_spec(cfg, smpl)
    model = NETWORKS.get(cfg.network)(cfg, axis_name=axis_name)
    pipe = RENDERERS.get(cfg.renderer)(
        model, cluster, smpl.v_template, cfg,
        chunk_rays=chunk_rays, pe_table=pe_table,
    )
    return model, pipe, smpl, cluster


def model_dir(cfg: Config) -> str:
    return os.path.join(cfg.trained_model_dir, cfg.task, cfg.exp_name)


def result_dir(cfg: Config) -> str:
    return os.path.join(
        cfg.result_dir, f"epoch_{cfg.test.epoch}", cfg.test.exp_folder_name
    )


def seed_everything(seed: int):
    np.random.seed(seed)
    import random

    random.seed(seed)
