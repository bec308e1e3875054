"""Synthetic in-memory dataset: end-to-end flows without ZJU-MoCap assets.

Produces the same item types as data/zju.ZJUDataset (TrainSample / EvalItem)
from the procedural body + cameras of transhuman_tpu.testing, so every
workload (train / evaluate / visualize / reconstruction) can run in any
environment (the real dataset and SMPL pickle are license-gated downloads).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import Config
from ..geometry.rays import get_near_far, get_rays
from ..geometry.smpl import SMPLModel
from ..registry import DATASETS
from ..render.pipeline import FrameInputs, RayBundle
from ..testing import synthetic_setup
from ..train.loss import TrainSample
from .zju import EvalItem


class SyntheticDataset:
    """Fixed synthetic subject viewed from `n_views + 1` circular cameras."""

    def __init__(
        self,
        cfg: Config,
        split: str = "train",
        n_frames: int = 8,
        image_hw: tuple = (128, 128),
        n_verts: int = 6890,
        smpl: Optional[SMPLModel] = None,
    ):
        del smpl  # procedural body; signature parity with ZJUDataset
        self.cfg = cfg
        self.split = split
        self.n_frames = n_frames
        self.hw = image_hw
        _, _, frame, self.smpl, self.cluster = synthetic_setup(
            n_views=cfg.train_num_views + 1,
            image_hw=image_hw,
            n_verts=n_verts,
            n_clusters=cfg.num_class,
        )
        self.frame_all = frame
        self.epoch = 0

    def __len__(self):
        return self.n_frames

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def frame_sampler_indices(self, full_eval=None):
        """FrameSampler decimation contract (reference samplers.py:150-155),
        same semantics as ZJUDataset.frame_sampler_indices: every
        cfg.test.frame_interval-th frame unless full_eval (or a
        non-FrameSampler cfg.test.sampler) keeps all.  The synthetic frames
        are identical anyway; honoring the contract keeps CLI eval runs at
        the reference's decimated cost."""
        fe = self.cfg.test.full_eval if full_eval is None else full_eval
        if self.cfg.test.sampler != "FrameSampler":
            fe = True
        step = 1 if fe else max(1, self.cfg.test.frame_interval)
        return np.arange(0, self.n_frames, step)

    # ------------------------------------------------------------------
    def _frame_and_target(self, index):
        f = self.frame_all
        v = self.cfg.train_num_views
        frame = FrameInputs(
            images=f.images[:v],
            vizmaps=f.vizmaps[:v],
            K=f.K[:v],
            R=f.R[:v],
            T=f.T[:v],
            verts_world=f.verts_world,
            tar_verts_smpl=f.tar_verts_smpl,
            blend_rot=f.blend_rot,
            Rh=f.Rh,
            Th=f.Th,
        )
        tgt = (f.images[v], f.K[v], f.R[v], f.T[v])
        mn = f.verts_world.min(0) - 0.05
        mx = f.verts_world.max(0) + 0.05
        return frame, tgt, np.stack([mn, mx])

    def get_train_sample(self, index) -> TrainSample:
        rng = np.random.default_rng(index + self.epoch * self.cfg.seed)
        frame, (timg, tK, tR, tT), bounds = self._frame_and_target(index)
        if not self.cfg.patch.use_patch_sampling:
            # non-patch mode (masked-MSE loss): mirror ZJUDataset's branch so
            # the only asset-free dataset can exercise the wired path; the
            # synthetic target has no segmentation, so the subject mask is
            # the whole image (body_ratio then draws uniformly)
            from .ray_sampling import sample_train_rays_random

            rr = sample_train_rays_random(
                np.asarray(timg, np.float32),
                np.ones(self.hw, np.uint8),
                np.asarray(tK),
                np.asarray(tR),
                np.asarray(tT).reshape(3, 1),
                bounds,
                rng,
                n_rays=self.cfg.N_rand,
                body_ratio=self.cfg.body_sample_ratio,
                face_ratio=self.cfg.face_sample_ratio,
            )
            return TrainSample(frame=frame, rays=rr.rays, target_rgb=rr.rgb)
        ps, npatch = self.cfg.patch.size, self.cfg.patch.N_patches
        h, w = self.hw
        ray_o, ray_d = get_rays(h, w, tK, tR, tT.reshape(3, 1))
        cap = npatch * ps * ps
        # center patches near the subject's projected centroid (the
        # reference's subject_ratio patch placement, in spirit)
        c3 = np.asarray(frame.verts_world).mean(0)
        cam = np.asarray(tR) @ c3 + np.asarray(tT).reshape(3)
        cx, cy = (np.asarray(tK) @ cam)[:2] / cam[2]
        rays_o, rays_d, near, far, pix = [], [], [], [], []
        target_patches = np.zeros((npatch, ps, ps, 3), np.float32)
        for p in range(npatch):
            jy, jx = rng.integers(-ps, ps + 1, 2)
            y0 = int(np.clip(cy - ps // 2 + jy, 0, h - ps))
            x0 = int(np.clip(cx - ps // 2 + jx, 0, w - ps))
            target_patches[p] = np.asarray(timg)[y0 : y0 + ps, x0 : x0 + ps]
            yy, xx = np.meshgrid(range(y0, y0 + ps), range(x0, x0 + ps), indexing="ij")
            rays_o.append(ray_o[yy, xx].reshape(-1, 3))
            rays_d.append(ray_d[yy, xx].reshape(-1, 3))
            pix.append(p * ps * ps + np.arange(ps * ps, dtype=np.int32))
        ro = np.concatenate(rays_o)
        rd = np.concatenate(rays_d)
        nr, fr_, mask = get_near_far(bounds, ro, rd)
        near_full = np.zeros(cap, np.float32)
        far_full = np.full(cap, 1e-3, np.float32)
        near_full[mask] = nr
        far_full[mask] = fr_
        rays = RayBundle(
            ray_o=ro.astype(np.float32),
            ray_d=rd.astype(np.float32),
            near=near_full,
            far=far_full,
            mask=mask,
        )
        pix_idx = np.concatenate(pix)
        pix_idx[~mask] = -1
        return TrainSample(
            frame=frame,
            rays=rays,
            target_patches=target_patches,
            ray_pixel_idx=pix_idx,
        )

    def get_eval_item(self, index) -> EvalItem:
        from .ray_sampling import sample_eval_rays

        frame, (timg, tK, tR, tT), bounds = self._frame_and_target(index)
        er = sample_eval_rays(np.asarray(timg), tK, tR, tT.reshape(3, 1), bounds)
        h, w = self.hw
        return EvalItem(
            frame=frame,
            eval_rays=er,
            target_img=np.asarray(timg),
            target_msk=np.ones((h, w), np.uint8),
            human="synthetic",
            human_idx=0,
            frame_index=int(index),
            cam_ind=0,
        )

    def get_perform_item(self, index, render_views=None) -> EvalItem:
        return self.get_eval_item(index)

    def get_mesh_item(self, index):
        frame, _, bounds = self._frame_and_target(index)
        return frame, bounds, dict(
            human="synthetic", human_idx=0, frame_index=int(index), cam_ind=0
        )


@DATASETS.register("synthetic")
def _make_synthetic(cfg: Config, split: str, **kw):
    return SyntheticDataset(cfg, split, **kw)
