"""Config plugin fields must be LIVE: every cfg.{dataset,network,renderer,
trainer,evaluator,visualizer} is routed through the registry (the
reference's make_* plugin dispatch), unknown names fail loudly, and the
formerly-ignored knobs (view_res, test.sampler, time_steps) act."""

import numpy as np
import pytest

from transhuman_tpu.config import Config


def test_all_plugin_fields_resolve():
    import transhuman_tpu.cli.common  # noqa: F401  (registration imports)
    import transhuman_tpu.data.synthetic  # noqa: F401
    import transhuman_tpu.evals.evaluator  # noqa: F401
    import transhuman_tpu.train.step  # noqa: F401
    import transhuman_tpu.viz.perform  # noqa: F401
    from transhuman_tpu.registry import (
        DATASETS,
        EVALUATORS,
        NETWORKS,
        RENDERERS,
        TRAINERS,
        VISUALIZERS,
    )

    cfg = Config()
    assert cfg.dataset in DATASETS
    assert "synthetic" in DATASETS
    assert cfg.network in NETWORKS
    assert cfg.renderer in RENDERERS
    assert cfg.trainer in TRAINERS
    assert cfg.evaluator in EVALUATORS
    assert cfg.visualizer in VISUALIZERS


def test_unknown_plugin_name_fails_loudly():
    from transhuman_tpu.cli.common import build_runtime

    cfg = Config().merge_dict({"network": "resnerf", "num_class": 8})
    with pytest.raises(KeyError, match="resnerf"):
        build_runtime(cfg)


def test_view_res_changes_embedding_width():
    """cfg.view_res reaches the pipeline (reference embedder.py:53 builds the
    view embedder from it); head widths adapt via flax shape inference."""
    import jax

    from transhuman_tpu.render.pipeline import pad_rays
    from transhuman_tpu.registry import NETWORKS, RENDERERS
    from transhuman_tpu.testing import init_params, synthetic_rays, synthetic_setup

    _, pipe_ref, frame, smpl, cluster = synthetic_setup(
        image_hw=(16, 16), n_verts=60, n_clusters=8, n_samples=4,
        chunk_rays=4, embed_dim=12, vit_depth=1, vit_heads=2, knn_k=3,
    )
    cfg = Config().merge_dict({
        "num_class": 8, "N_samples": 4, "chunk_size": 16, "view_res": 2,
        "vit_depth": 1, "vit_variant": "tiny",
    })
    model = NETWORKS.get(cfg.network)(cfg)
    pipe = RENDERERS.get(cfg.renderer)(
        model, cluster, np.asarray(frame.verts_world), cfg
    )
    assert pipe.view_freqs == 2
    params = init_params(model, frame, 8, jax.random.PRNGKey(0))
    # view_fc input = 256 + (6*view_res + 3): 271 at view_res=2, 283 at 4
    vfc = params["params"]["heads"]["view_fc"]["kernel"]
    assert vfc.shape[0] == 256 + 6 * 2 + 3
    rays = pad_rays(synthetic_rays(8), pipe.chunk_rays)
    out = jax.jit(pipe.render_frame)(params, frame, rays)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


def test_test_sampler_default_disables_decimation(fake_zju=None):
    from transhuman_tpu.data.catalog import frame_sampler_indices

    # the dataset-level wiring: sampler != 'FrameSampler' -> every frame
    from transhuman_tpu.data.zju import ZJUDataset

    class _Stub(ZJUDataset):
        def __init__(self, cfg):
            self.cfg = cfg
            self.human_list = ["h"]
            self.human2frame_cam = {"h": (90, 2)}

    cfg = Config().merge_dict({"test": {"sampler": "FrameSampler"}})
    assert len(_Stub(cfg).frame_sampler_indices()) == 6  # 90/30 frames x 2 cams
    cfg = Config().merge_dict({"test": {"sampler": "default"}})
    assert len(_Stub(cfg).frame_sampler_indices()) == 180
    assert len(frame_sampler_indices([(90, 2)], full_eval=False)) == 6


def test_time_steps_guard():
    from transhuman_tpu.data.zju import ZJUDataset

    cfg = Config().merge_dict({"time_steps": 3})
    with pytest.raises(ValueError, match="time_steps"):
        ZJUDataset(cfg, "train", smpl=object())
