"""ZJU-MoCap dataset: host-side assembly of device-ready frame batches.

Behavior parity with the reference dataset
(`lib/datasets/light_stage/can_smpl.py`):
  * index = (human, frame, target_camera) triples built from annots.npy with
    the per-human (begin, interval, count) catalog (can_smpl.py:57-117),
  * per item: load + undistort + x`ratio` resize + background mask-out of
    the target view and the V input views; union of `mask`/`mask_cihp`
    layers with a 5px border band marked 100 on the target mask
    (:118-200,629-660); epoch-seeded color jitter at train (:320-328),
  * input views: random V at train / cfg.test.input_view at test (:346-362),
  * rasterized vertex visibility maps with all-ones fallback (:440-461),
  * SMPL vertices/params per frame, world->SMPL transform, LBS blend
    matrices (prepare_input, :214-266),
  * ray sampling: patches (train) / full-frame-in-bbox (eval).

Output contract is the device pytree of render/pipeline.py + train/loss.py
(FrameInputs / RayBundle / TrainSample, all static shapes), not a 35-key
torch dict.  313/315's irregular camera naming and the '396' layout quirks
are handled as in the reference.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from ..config import Config
from ..geometry.smpl import SMPLModel, rodrigues
from ..registry import DATASETS
from ..render.pipeline import FrameInputs
from ..train.loss import TrainSample
from . import catalog
from .aug import transform_can_smpl
from .jitter import color_jitter
from .ray_sampling import (
    EvalRays,
    sample_eval_rays,
    sample_train_rays,
    sample_train_rays_random,
)

def _imread_rgb(p):
    """JPG frames load via cv2 (libjpeg-turbo, releases the GIL for the
    loader's worker threads; ~2x imageio/PIL).  The reference reads with
    imageio (can_smpl.py:339) — RGB order preserved here; jpeg decoder
    differences are at most +-1 u8 LSB.  Palette-PNG masks stay on imageio
    (_load_mask): cv2 would apply the palette in BGR and flip the channel
    the != 0 test reads.  cv2.imread returns None (no exception) for
    missing/corrupt files; raise with the path — inside a Loader worker a
    bare cv2.error surfaces far from the offending frame."""
    import cv2

    img = cv2.imread(p)
    if img is None:
        raise FileNotFoundError(f"unreadable image: {p}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


SPECIAL_HUMANS = ("CoreView_313", "CoreView_315")
# 313/315 annots use the COMPACT 21-camera layout: K/R/T/ims rows align with
# this list, which maps compact index -> on-set camera number - 1 (cameras
# 20/21 of the 23 on set are absent).  This is the reference's contract too:
# its own `cam_idx_list[idx]` (can_smpl.py:352,430) IndexErrors on a 23-row
# annots, so any annots it trained on must be compact.  __init__ validates
# the row count loudly (a raw 23-row annots would otherwise read wrong
# calibration for rows >= 19).
CAM_IDX_313 = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 21, 22]


@dataclass
class EvalItem:
    frame: FrameInputs
    eval_rays: EvalRays
    target_img: np.ndarray  # (H, W, 3)
    target_msk: np.ndarray  # (H, W) uint8 (0 bg / 1 body / 100 border)
    human: str
    human_idx: int
    frame_index: int
    cam_ind: int


class ZJUDataset:
    """split: 'train' | 'test'."""

    def __init__(
        self,
        cfg: Config,
        split: str,
        smpl: Optional[SMPLModel] = None,
        human_info: Optional[dict] = None,
    ):
        if cfg.time_steps != 1:
            # the reference parses time_steps/time_mult but ASSERTS == 1 at
            # runtime (if_clight_renderer.py:412,556) — fail at load instead
            # of silently ignoring the key
            raise ValueError(
                f"time_steps={cfg.time_steps} is unsupported: the reference "
                "itself asserts time_steps == 1 (if_clight_renderer.py:412)"
            )
        self.cfg = cfg
        self.split = split
        self.data_root = cfg.data_root
        self.rasterize_root = cfg.rasterize_root
        self.ratio = cfg.ratio
        if smpl is None:
            smpl = SMPLModel.load(cfg.smpl_dir)
        self.smpl = smpl
        self.epoch = 0
        from ..utils.cache import ByteLRU

        # undistort maps per (human, cam, size): ~8.4 MB each at 1024x1024;
        # the realistic working set (7 train humans x ~21 cams) is ~1.2 GB,
        # so the budget is set ABOVE it — the bound is a ceiling against
        # pathological key spaces (many sizes), not a thrash knob (an evicted
        # hot entry costs a 40 ms initUndistortRectifyMap rebuild)
        self._ud_cache = ByteLRU(int(1.5 * 1024**3))
        # processed-input-view LRU (jitter-off items only): FrameSampler keeps
        # every target camera of a kept frame (samplers.py:136-164), so eval/
        # visualize items arrive in runs of len(test.target_view) that share
        # the SAME input views — without this each run re-decoded,
        # re-undistorted, re-resized and re-read vizmaps len(target_view)
        # times (~the whole 216 ms/sample host cost).
        self._iv_cache = ByteLRU(128 * 1024 * 1024)

        if human_info is None:
            human_info = catalog.get_human_info(split, cfg.test.mode)
        self.human_list = list(human_info)
        self.human2idx = {h: i for i, h in enumerate(self.human_list)}

        self.cams: Dict[str, dict] = {}
        self.ims: List[str] = []
        self.cam_inds: List[int] = []
        self.start_end: Dict[str, dict] = {}
        self.human2frame_cam: Dict[str, tuple] = {}

        missing = [
            h for h in self.human_list
            if not os.path.exists(os.path.join(self.data_root, h, "annots.npy"))
        ]
        if missing:
            if len(missing) == len(self.human_list):
                raise FileNotFoundError(
                    f"no annots.npy for any of {self.human_list} under "
                    f"{self.data_root!r}"
                )
            print(f"WARNING: skipping humans missing from disk: {missing}")
            self.human_list = [h for h in self.human_list if h not in missing]
            self.human2idx = {h: i for i, h in enumerate(self.human_list)}

        for human in self.human_list:
            root = os.path.join(self.data_root, human)
            annots = np.load(
                os.path.join(root, "annots.npy"), allow_pickle=True
            ).item()
            self.cams[human] = annots["cams"]
            num_cams = len(self.cams[human]["K"])
            if human in SPECIAL_HUMANS and num_cams != len(CAM_IDX_313):
                raise ValueError(
                    f"{human}: annots list {num_cams} cameras but the "
                    f"compact {len(CAM_IDX_313)}-camera layout is required "
                    "(see CAM_IDX_313; a raw 23-row annots would silently "
                    "pair wrong calibration with on-disk cameras)"
                )
            target_view = (
                list(range(num_cams)) if split == "train" else list(cfg.test.target_view)
            )
            info = human_info[human]
            i0, intv, ni = info["begin_i"], info["i_intv"], info["ni"]
            frames = annots["ims"][i0 : i0 + ni][::intv]
            ims = np.array(
                [np.array(fd["ims"])[target_view] for fd in frames]
            )
            cam_inds = np.array(
                [np.array(target_view, dtype=np.int64) for _ in frames]
            )
            self.human2frame_cam[human] = ims.shape
            ims_flat = ims.ravel().tolist()
            if human in SPECIAL_HUMANS:
                # path layout: "Camera (N)/..._XXXX.jpg" with the frame number
                # as the 5th '_'-separated token
                ims_flat = [
                    os.path.join(root, p.split("/")[0], p.split("/")[1].split("_")[4] + ".jpg")
                    for p in ims_flat
                ]
            else:
                ims_flat = [os.path.join(root, p) for p in ims_flat]
            self.ims.extend(ims_flat)
            self.cam_inds.extend(cam_inds.ravel().tolist())
            first = int(os.path.basename(ims_flat[0])[:-4])
            last = int(os.path.basename(ims_flat[-1])[:-4])
            self.start_end[human] = {
                "start": first,
                "end": last,
                "length": last - first + 1,
                "intv": intv,
            }

    # ------------------------------------------------------------------
    def __len__(self):
        return len(self.ims)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def frame_sampler_indices(self, full_eval: Optional[bool] = None):
        fe = self.cfg.test.full_eval if full_eval is None else full_eval
        if self.cfg.test.sampler != "FrameSampler":
            # the reference's non-FrameSampler path is a plain sequential
            # pass over every frame (make_dataset.py:14-25); only
            # FrameSampler decimates (samplers.py:150-155)
            fe = True
        return catalog.frame_sampler_indices(
            [self.human2frame_cam[h] for h in self.human_list],
            full_eval=fe,
            interval=self.cfg.test.frame_interval,
        )

    # -- file loading helpers ------------------------------------------
    def _cam_dir(self, human, cam_id_1based):
        if human in SPECIAL_HUMANS:
            return f"Camera ({cam_id_1based})"
        return f"Camera_B{cam_id_1based}"

    def _load_mask(self, human, cam_dir, frame_file):
        import imageio.v2 as imageio

        stem = frame_file[:-4] + ".png"
        msk = None
        for layer in ("mask", "mask_cihp"):
            p = os.path.join(self.data_root, human, layer, cam_dir, stem)
            if os.path.exists(p):
                m = (np.asarray(imageio.imread(p)) != 0).astype(np.uint8)
                if m.ndim == 3:
                    m = m[..., 0]
                msk = m if msk is None else (msk | m)
        if msk is None:
            raise FileNotFoundError(f"no mask for {human}/{cam_dir}/{stem}")
        return msk

    @staticmethod
    def _mark_border(msk, border: int = 5):
        import cv2

        kernel = np.ones((border, border), np.uint8)
        eroded = cv2.erode(msk.copy(), kernel)
        dilated = cv2.dilate(msk.copy(), kernel)
        out = msk.copy()
        out[(dilated - eroded) == 1] = 100
        return out

    def _undistort_maps(self, human, cam_ind, hw):
        """Cached cv2.initUndistortRectifyMap for a fixed camera+size.
        cv2.undistort recomputes the distortion maps on EVERY call (~40 ms
        at 1024x1024); cameras are fixed per dataset, so build the CV_32FC1
        maps once and remap per frame (same map type + bilinear interp as
        undistort's internal path).  Returns None for zero distortion
        (undistort is then an exact-identity resample — skip it)."""
        import cv2

        key = (human, cam_ind, hw)
        maps = self._ud_cache.get(key)
        if maps is None:
            cams = self.cams[human]
            K = np.array(cams["K"][cam_ind], np.float32)
            D = np.array(cams["D"][cam_ind], np.float32)
            if not np.any(D):
                maps = (None, None)
            else:
                h, w = hw
                maps = cv2.initUndistortRectifyMap(
                    K, D, None, K, (w, h), cv2.CV_32FC1
                )
            self._ud_cache.put(key, maps)
        return maps

    def _process(self, img_u8, msk, human, cam_ind, jitter_seed=None):
        """jitter -> [0,1] -> undistort -> resize -> mask bkgd.
        Returns (img (H,W,3) f32, msk (H,W) u8, K (3,3), R (3,3), T (3,))."""
        import cv2

        # one fused u8 -> [0,1] f32 pass (astype + divide was two)
        img = np.multiply(img_u8, np.float32(1.0 / 255.0), dtype=np.float32)
        cams = self.cams[human]
        K = np.array(cams["K"][cam_ind], np.float32).copy()
        m1, m2 = self._undistort_maps(human, cam_ind, img.shape[:2])
        if m1 is not None:
            img = cv2.remap(img, m1, m2, cv2.INTER_LINEAR)
            msk = cv2.remap(msk, m1, m2, cv2.INTER_LINEAR)
        R = np.array(cams["R"][cam_ind], np.float32)
        T = (np.array(cams["T"][cam_ind], np.float32) / 1000.0).reshape(3)
        H, W = int(img.shape[0] * self.ratio), int(img.shape[1] * self.ratio)
        K[:2] *= self.ratio
        img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        msk = cv2.resize(msk, (W, H), interpolation=cv2.INTER_NEAREST)
        if jitter_seed is not None:
            # post-resize float jitter (see data/jitter.py docstring)
            img = color_jitter(img, jitter_seed)
        if self.cfg.mask_bkgd:
            img[msk == 0] = 1.0 if self.cfg.white_bkgd else 0.0
        return img, msk, K, R, T

    def _vertices(self, human, frame: int):
        d = "vertices" if "396" in human else self.cfg.vertices
        return np.load(
            os.path.join(self.data_root, human, d, f"{frame}.npy")
        ).astype(np.float32)

    def _params(self, human, frame: int):
        d = "params" if "396" in human else self.cfg.params
        return np.load(
            os.path.join(self.data_root, human, d, f"{frame}.npy"),
            allow_pickle=True,
        ).item()

    def _depthmap(self, human, cam_id_1based, frame_str):
        """Per-view depth map (reference stores torch .pt tensors under
        cfg.depth_root, can_smpl.py:463-475). Returns (H, W) float32."""
        import torch

        p = os.path.join(
            self.cfg.depth_root,
            human,
            self._cam_dir(human, cam_id_1based),
            f"{frame_str}.pt",
        )
        d = torch.load(p, map_location="cpu", weights_only=False)
        d = np.asarray(d)
        if d.ndim == 3:  # (1, H, W) or (H, W, 1)
            d = d[0] if d.shape[0] == 1 else d[..., 0]
        return d.astype(np.float32)

    def _vizmap(self, human, cam_id_1based, frame_str):
        if not self.cfg.rasterize:
            # cfg.rasterize=False skips the precomputed visibility entirely —
            # every vertex visible in every view (if_clight_renderer.py:176-181)
            return np.ones(self.smpl.v_template.shape[0], np.float32)
        p = os.path.join(
            self.rasterize_root,
            human,
            "visibility",
            self._cam_dir(human, cam_id_1based),
            f"{frame_str}.npy",
        )
        try:
            return np.load(p).astype(np.float32)
        except (FileNotFoundError, OSError):
            return np.ones(self.smpl.v_template.shape[0], np.float32)

    def _input_view(self, human, v, frame_file, frame_str, jseed):
        """One fully-processed input view: (img, K, R, T, vizmap, depth|None).

        LRU-cached by (human, view, frame) when jitter is off (jseed None) —
        the cache would otherwise leak one epoch's jitter draws into the
        next.  Consecutive eval items of the same frame (one per target
        camera, FrameSampler semantics samplers.py:136-164) then pay the
        decode/undistort/resize/vizmap cost once instead of once per target.
        Cached arrays are read-only shared views; `np.stack` in _build_frame
        copies them into each item.  All cache access is under a lock: the
        Loader drives this from concurrent worker threads, and an unlocked
        insert-scan racing a popitem is an intermittent
        'mutated during iteration' crash."""
        key = (human, v, frame_file)
        if jseed is None:
            hit = self._iv_cache.get(key)
            if hit is not None:
                return hit
        cam_id = (CAM_IDX_313[v] + 1) if human in SPECIAL_HUMANS else (v + 1)
        ipath = os.path.join(
            self.data_root, human, self._cam_dir(human, cam_id), frame_file
        )
        iimg = _imread_rgb(ipath)
        imsk = self._load_mask(human, self._cam_dir(human, cam_id), frame_file)
        iimg, _, iK, iR, iT = self._process(iimg, imsk, human, v, jseed)
        ivz = self._vizmap(human, cam_id, frame_str)
        # depth maps feed visibility only when depth_vizmap is also set
        # (_build_frame's gate); loading them without it was pure host-path
        # waste that also ate _iv_cache budget
        idep = (
            self._depthmap(human, cam_id, frame_str)
            if (self.cfg.depth_map and self.cfg.depth_vizmap)
            else None
        )
        out = (iimg, iK, iR, iT, ivz, idep)
        if jseed is None:
            self._iv_cache.put(key, out)
        return out

    # -- item assembly -------------------------------------------------
    def _pick_input_views(self, human, rng):
        num_cams = len(self.cams[human]["K"])
        if self.split == "train":
            views = rng.permutation(num_cams)[: self.cfg.train_num_views]
            return views.tolist()
        return list(self.cfg.test.input_view)

    def _frame_meta(self, index):
        path = self.ims[index]
        human = path.split("/")[-3]
        frame_file = os.path.basename(path)
        frame_index = int(frame_file[:-4])
        return path, human, frame_file, frame_index

    def _build_frame(self, index, rng, jitter: bool, train: bool = False) -> tuple:
        """Shared input-view/SMPL assembly. Returns (frame_inputs, target
        stuff tuple, meta)."""
        path, human, frame_file, frame_index = self._frame_meta(index)
        cam_ind = self.cam_inds[index]
        zfill = len(frame_file[:-4])

        # ---- target view (mask lives under the image's own camera dir)
        tgt_img = _imread_rgb(path)
        tgt_cam_dir = os.path.basename(os.path.dirname(path))
        tgt_msk_raw = self._mark_border(
            self._load_mask(human, tgt_cam_dir, frame_file)
        )
        jseed = (
            (index + self.epoch * self.cfg.seed) if jitter else None
        )
        tgt_img, tgt_msk, tK, tR, tT = self._process(
            tgt_img, tgt_msk_raw, human, cam_ind, jseed
        )

        # ---- input views (time_steps == 1: the painting frame IS the target
        # frame; multi-time support would loop here, if_clight_renderer.py:412)
        views = self._pick_input_views(human, rng)
        frame_str = str(frame_index).zfill(zfill)
        imgs, viz, Ks, Rs, Ts, depths = [], [], [], [], [], []
        for v in views:
            iimg, iK, iR, iT, ivz, idep = self._input_view(
                human, v, frame_file, frame_str, jseed
            )
            imgs.append(iimg)
            Ks.append(iK)
            Rs.append(iR)
            Ts.append(iT)
            viz.append(ivz)
            if idep is not None:
                depths.append(idep)

        # ---- SMPL for the target frame
        verts_world = self._vertices(human, frame_index)
        params = self._params(human, frame_index)
        Rh = rodrigues(np.asarray(params["Rh"]).reshape(1, 3))[0]
        Th = np.asarray(params["Th"], np.float32).reshape(3)
        verts_smpl = (verts_world - Th) @ Rh
        _, _, blend = self.smpl(params["poses"], np.asarray(params["shapes"]).reshape(-1))

        # transform_can_smpl augmentation (can_smpl.py:244): training-only,
        # identity draw with prob 1-rot_ratio.  Fields are set whenever
        # rot_ratio > 0 (identity included) so the FrameInputs pytree
        # structure never flips between steps.
        aug = None
        if train and self.cfg.rot_ratio > 0:
            verts_smpl, a_center, a_rot, a_trans = transform_can_smpl(
                verts_smpl, rng, self.cfg.rot_ratio
            )
            aug = dict(aug_center=a_center, aug_rot=a_rot, aug_trans=a_trans)

        frame = FrameInputs(
            images=np.stack(imgs),
            vizmaps=np.stack(viz),
            K=np.stack(Ks),
            R=np.stack(Rs),
            T=np.stack(Ts),
            verts_world=verts_world,
            tar_verts_smpl=verts_smpl,
            blend_rot=blend[:, :3, :3].copy(),
            Rh=Rh,
            Th=Th,
            depth_maps=(
                np.stack(depths)
                if (self.cfg.depth_map and self.cfg.depth_vizmap and depths)
                else None
            ),
            **(aug or {}),
        )

        from ..geometry.rays import world_bounds

        can_bounds = world_bounds(verts_world, self.cfg.big_box)

        target = (tgt_img, tgt_msk, tK, tR, tT, can_bounds)
        meta = dict(
            human=human,
            human_idx=self.human2idx.get(human, 0),
            frame_index=frame_index,
            cam_ind=cam_ind,
            path=path,
        )
        return frame, target, meta

    def get_train_sample(self, index) -> TrainSample:
        rng = np.random.default_rng(index + self.epoch * self.cfg.seed)
        frame, target, _ = self._build_frame(
            index, rng, jitter=self.cfg.jitter, train=True
        )
        tgt_img, tgt_msk, tK, tR, tT, can_bounds = target
        if not self.cfg.patch.use_patch_sampling:
            rr = sample_train_rays_random(
                tgt_img,
                tgt_msk,
                tK,
                tR,
                tT.reshape(3, 1),
                can_bounds,
                rng,
                n_rays=self.cfg.N_rand,
                body_ratio=self.cfg.body_sample_ratio,
                face_ratio=self.cfg.face_sample_ratio,
            )
            return TrainSample(frame=frame, rays=rr.rays, target_rgb=rr.rgb)
        tr = sample_train_rays(
            tgt_img,
            tgt_msk,
            tK,
            tR,
            tT.reshape(3, 1),
            can_bounds,
            rng,
            n_patches=self.cfg.patch.N_patches,
            patch_size=self.cfg.patch.size,
            subject_ratio=self.cfg.patch.sample_subject_ratio,
        )
        return TrainSample(
            frame=frame,
            rays=tr.rays,
            target_patches=tr.target_patches,
            ray_pixel_idx=tr.ray_pixel_idx,
        )

    def get_eval_item(self, index) -> EvalItem:
        rng = np.random.default_rng(index)
        frame, target, meta = self._build_frame(index, rng, jitter=False)
        tgt_img, tgt_msk, tK, tR, tT, can_bounds = target
        er = sample_eval_rays(tgt_img, tK, tR, tT.reshape(3, 1), can_bounds)
        return EvalItem(
            frame=frame,
            eval_rays=er,
            target_img=tgt_img,
            target_msk=tgt_msk,
            human=meta["human"],
            human_idx=meta["human_idx"],
            frame_index=meta["frame_index"],
            cam_ind=meta["cam_ind"],
        )


    def get_perform_item(self, index, render_views: Optional[int] = None) -> EvalItem:
        """Free-viewpoint variant (can_smpl_perform.py:44-89): the target
        camera is replaced by a frame-indexed pose on a 360-degree spherical
        path around the subject; intrinsics stay the real target camera's."""
        from ..geometry.cameras import gen_path_virt, load_cam

        rng = np.random.default_rng(index)
        frame, target, meta = self._build_frame(index, rng, jitter=False)
        tgt_img, tgt_msk, tK, _, _, can_bounds = target
        human = meta["human"]

        if not hasattr(self, "_render_w2c"):
            self._render_w2c: Dict[str, list] = {}
        if human not in self._render_w2c:
            n_frames = self.human2frame_cam[human][0]
            _, RT = load_cam(
                os.path.join(self.data_root, human, "annots.npy"), self.ratio
            )
            self._render_w2c[human] = gen_path_virt(
                RT, render_views=render_views or n_frames
            )
        path = self._render_w2c[human]
        w2c = path[meta["frame_index"] % len(path)]
        vR = w2c[:3, :3].astype(np.float32)
        vT = w2c[:3, 3].astype(np.float32)

        er = sample_eval_rays(tgt_img, tK, vR, vT.reshape(3, 1), can_bounds)
        return EvalItem(
            frame=frame,
            eval_rays=er,
            target_img=tgt_img,
            target_msk=tgt_msk,
            human=human,
            human_idx=meta["human_idx"],
            frame_index=meta["frame_index"],
            cam_ind=meta["cam_ind"],
        )

    def get_mesh_item(self, index):
        """Mesh variant (can_smpl_mesh.py:61-97): eval item + the world AABB
        for dense-grid reconstruction (the grid itself is built in
        mesh_ops/reconstruct.py from these bounds)."""
        rng = np.random.default_rng(index)
        frame, target, meta = self._build_frame(index, rng, jitter=False)
        can_bounds = target[5]
        return frame, can_bounds, meta


@DATASETS.register("zju")
def _make_zju(cfg: Config, split: str, **kw):
    return ZJUDataset(cfg, split, **kw)
