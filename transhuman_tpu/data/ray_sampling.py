"""Host-side ray sampling: patch sampling (train) and full-frame rays (eval).

Behavior parity with the reference
(`lib/utils/if_nerf/if_nerf_data_utils.py:286-513,516-614`):

Train (patch mode, the default — configs/train_or_eval.yaml:71-76):
  * rays exist only inside the projected-AABB bound mask AND the ray-AABB
    intersection mask; N_patches square patches are sampled, each centered
    (prob `subject_ratio`) on a random subject pixel, else on a random
    bbox-minus-subject pixel; all patch pixels intersecting the ray mask
    become rays.
Train (non-patch, cfg.patch.use_patch_sampling=False):
  * N_rand individual rays, body_sample_ratio of them from subject pixels,
    the rest uniform over the bound mask, rejection-resampled until all
    intersect the AABB (`sample_train_rays_random`).
Eval:
  * every pixel whose ray intersects the (inflated) world AABB is a ray.

TPU-native contract: everything is padded to static shapes.  Each train ray
carries `ray_pixel_idx` = patch_index * ps^2 + local pixel offset so the
loss can scatter ray colors back into (P, ps, ps) patches with one static
scatter (train/loss.py) instead of the reference's per-patch boolean loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..geometry.rays import (
    get_bound_2d_mask,
    get_near_far,
    get_near_far_hull,
    get_rays_cached,
)
from ..render.pipeline import RayBundle


@dataclass
class TrainRays:
    rays: RayBundle  # padded to n_patches * ps^2
    ray_pixel_idx: np.ndarray  # (R,) int32, -1 on padding
    target_patches: np.ndarray  # (P, ps, ps, 3)
    patch_masks: np.ndarray  # (P, ps, ps) bool — ray-mask pixels per patch
    patch_masks_sub: np.ndarray  # (P, ps, ps) bool — subject pixels per patch
    sub_mask: np.ndarray  # (R,) bool — ray is on the subject (incl. border)


@dataclass
class RandomTrainRays:
    rays: RayBundle  # R = n_rays, static (mask False on the rare padding)
    rgb: np.ndarray  # (R, 3) ground-truth colors at the sampled pixels
    coord: np.ndarray  # (R, 2) int32 (y, x) pixel coords


@dataclass
class EvalRays:
    rays: RayBundle  # R = #rays in box (unpadded; pad with pipeline.pad_rays)
    pix_idx: np.ndarray  # (R,) int32 index into H*W for scatter-back
    rgb: np.ndarray  # (R, 3) ground-truth colors
    mask_at_box: np.ndarray  # (H*W,) bool


def _pick_patch(candidate_mask, ps, H, W, rng):
    """Random patch box centered on a candidate pixel, clipped to the image."""
    ys, xs = np.nonzero(candidate_mask)
    i = rng.integers(ys.shape[0])
    x0 = int(np.clip(xs[i] - ps // 2, 0, W - ps))
    y0 = int(np.clip(ys[i] - ps // 2, 0, H - ps))
    return x0, y0


def sample_train_rays(
    img,
    msk,
    K,
    R,
    T,
    can_bounds,
    rng: np.random.Generator,
    n_patches: int = 6,
    patch_size: int = 20,
    subject_ratio: float = 0.8,
) -> TrainRays:
    """img: (H,W,3) float; msk: (H,W) uint8 with {0 bg, 1 body, 100 border};
    can_bounds: (2,3) world AABB.  rng drives patch placement (the epoch-
    seeded determinism contract, can_smpl.py:320-328)."""
    H, W = img.shape[:2]
    ps = patch_size
    ray_o, ray_d = get_rays_cached(H, W, K, R, T)
    ray_o = ray_o.reshape(-1, 3)
    ray_d = ray_d.reshape(-1, 3)

    pose = np.concatenate([R, T.reshape(3, 1)], axis=1)
    bound_mask = get_bound_2d_mask(can_bounds, K, pose, H, W)
    msk_eff = msk * bound_mask  # mask clipped to the projected AABB

    near_full, far_full, ray_mask = get_near_far_hull(
        can_bounds, ray_o, ray_d, K, R, T, H, W
    )

    subject_mask = msk_eff > 0
    bbox_not_subject = ray_mask.reshape(H, W) & ~subject_mask

    cap = n_patches * ps * ps
    sel_pix = np.full(cap, -1, np.int64)  # flat H*W pixel index per ray slot
    ray_pixel_idx = np.full(cap, -1, np.int32)
    patch_masks = np.zeros((n_patches, ps, ps), bool)
    patch_masks_sub = np.zeros((n_patches, ps, ps), bool)
    target_patches = np.zeros((n_patches, ps, ps, 3), np.float32)
    n_rays = 0

    for p in range(n_patches):
        if rng.random() < subject_ratio and subject_mask.any():
            cand = subject_mask
        else:
            cand = bbox_not_subject if bbox_not_subject.any() else subject_mask
        if not cand.any():
            cand = np.ones((H, W), bool)
        x0, y0 = _pick_patch(cand, ps, H, W, rng)
        target_patches[p] = img[y0 : y0 + ps, x0 : x0 + ps]

        in_patch = np.zeros((H, W), bool)
        in_patch[y0 : y0 + ps, x0 : x0 + ps] = True
        inter = in_patch & ray_mask.reshape(H, W)
        patch_masks[p] = inter[y0 : y0 + ps, x0 : x0 + ps]
        patch_masks_sub[p] = (in_patch & subject_mask)[y0 : y0 + ps, x0 : x0 + ps]

        pys, pxs = np.nonzero(inter)
        k = pys.shape[0]
        sel_pix[n_rays : n_rays + k] = pys * W + pxs
        ray_pixel_idx[n_rays : n_rays + k] = (
            p * ps * ps + (pys - y0) * ps + (pxs - x0)
        ).astype(np.int32)
        n_rays += k

    valid = sel_pix >= 0
    sel = np.where(valid, sel_pix, 0)
    rays = RayBundle(
        ray_o=ray_o[sel].astype(np.float32),
        ray_d=np.where(valid[:, None], ray_d[sel], [[0, 0, 1.0]]).astype(np.float32),
        near=np.where(valid, near_full[sel], 0.0).astype(np.float32),
        far=np.where(valid, far_full[sel], 1e-3).astype(np.float32),
        mask=valid,
    )
    sub_mask = np.zeros(cap, bool)
    sub_mask[valid] = subject_mask.reshape(-1)[sel[valid]]
    return TrainRays(
        rays=rays,
        ray_pixel_idx=ray_pixel_idx,
        target_patches=target_patches,
        patch_masks=patch_masks,
        patch_masks_sub=patch_masks_sub,
        sub_mask=sub_mask,
    )


def sample_train_rays_random(
    img,
    msk,
    K,
    R,
    T,
    can_bounds,
    rng: np.random.Generator,
    n_rays: int = 1024,
    body_ratio: float = 0.5,
    face_ratio: float = 0.0,
) -> RandomTrainRays:
    """Non-patch train sampling (`sample_ray_h36m` train branch,
    if_nerf_data_utils.py:516-614): per round, `body_ratio` of the still-
    needed rays come from subject pixels (msk==1), `face_ratio` from face
    pixels (msk==13), the rest uniformly from the projected-AABB bound mask
    (border label 100 excluded); only rays that intersect the 3D AABB count,
    and rounds repeat until exactly `n_rays` valid rays are collected — so
    the output shape is STATIC, which is exactly what the jitted step wants.

    Degenerate inputs (a bound mask that never intersects the AABB) can stall
    the rejection loop; after a bounded number of rounds the tail is padded
    with mask=False rays, which `masked_mse` drops.
    """
    H, W = img.shape[:2]
    ray_o, ray_d = get_rays_cached(H, W, K, R, T)
    ray_o = ray_o.reshape(-1, 3)
    ray_d = ray_d.reshape(-1, 3)
    img_flat = img.reshape(-1, 3)

    pose = np.concatenate([R, T.reshape(3, 1)], axis=1)
    bound_mask = get_bound_2d_mask(can_bounds, K, pose, H, W)
    msk_eff = msk * bound_mask
    bound_mask = bound_mask.copy()
    bound_mask[msk_eff == 100] = 0  # exclude the eroded-border label

    body_pix = np.flatnonzero(msk_eff == 1)
    # NOTE face_ratio is dead in the reference too: masks are binarized to
    # {0,1} before sampling (can_smpl.py:134-141), so the CIHP face label 13
    # never survives and n_face is always backfilled from later rounds.
    # Kept verbatim for parity with sample_ray_h36m's face branch
    # (if_nerf_data_utils.py:229-245).
    face_pix = np.flatnonzero(msk_eff == 13)
    rand_pix = np.flatnonzero(bound_mask == 1)

    sel = np.zeros(n_rays, np.int64)
    near_out = np.zeros(n_rays, np.float32)
    far_out = np.full(n_rays, 1e-3, np.float32)
    valid = np.zeros(n_rays, bool)
    n = 0
    for _ in range(64):
        rem = n_rays - n
        if rem <= 0:
            break
        n_body = int(rem * body_ratio)
        n_face = int(rem * face_ratio)
        n_rand = rem - n_body - n_face
        parts = []
        if body_pix.size:
            parts.append(body_pix[rng.integers(0, body_pix.size, n_body)])
        if face_pix.size and n_face:
            parts.append(face_pix[rng.integers(0, face_pix.size, n_face)])
        if rand_pix.size:
            parts.append(rand_pix[rng.integers(0, rand_pix.size, n_rand)])
        if not parts:
            break
        cand = np.concatenate(parts)
        near_, far_, in_box = get_near_far(
            can_bounds, ray_o[cand], ray_d[cand]
        )
        k = min(int(in_box.sum()), rem)
        kept = cand[in_box][:k]
        sel[n : n + k] = kept
        near_out[n : n + k] = near_[:k]
        far_out[n : n + k] = far_[:k]
        valid[n : n + k] = True
        n += k

    if n < n_rays:
        # the reference's rejection loop is unbounded (if_nerf_data_utils.py:
        # 516-614); our 64-round cap pads instead — masked_mse drops the
        # padding, but the step then trains on fewer effective rays, so say so
        print(
            f"WARNING: ray rejection sampling padded {n_rays - n}/{n_rays} "
            "rays after 64 rounds (degenerate mask/bounds?) — these rays are "
            "masked out of the loss"
        )

    rays = RayBundle(
        ray_o=ray_o[sel].astype(np.float32),
        ray_d=np.where(valid[:, None], ray_d[sel], [[0, 0, 1.0]]).astype(
            np.float32
        ),
        near=near_out,
        far=far_out,
        mask=valid,
    )
    coord = np.stack([sel // W, sel % W], axis=1).astype(np.int32)
    return RandomTrainRays(
        rays=rays,
        rgb=np.where(valid[:, None], img_flat[sel], 0.0).astype(np.float32),
        coord=coord,
    )


def sample_eval_rays(img, K, R, T, can_bounds, hw=None) -> EvalRays:
    """Every pixel whose ray intersects the world AABB
    (sample_ray_h36m test branch, if_nerf_data_utils.py:272-284).

    img may be None when no ground truth exists (the serving path renders
    novel views): pass the resolution via `hw` and `.rgb` comes back as
    zeros of the masked size — this avoids allocating an (H, W, 3) dummy
    image per request just to carry the shape (768 MB at the 8192 cap)."""
    H, W = img.shape[:2] if img is not None else hw
    ray_o, ray_d = get_rays_cached(H, W, K, R, T)
    ray_o = ray_o.reshape(-1, 3)
    ray_d = ray_d.reshape(-1, 3)
    near_full, far_full, mask_at_box = get_near_far_hull(
        can_bounds, ray_o, ray_d, K, R, T, H, W
    )
    pix_idx = np.nonzero(mask_at_box)[0].astype(np.int32)
    rays = RayBundle(
        ray_o=ray_o[mask_at_box].astype(np.float32),
        ray_d=ray_d[mask_at_box].astype(np.float32),
        near=near_full[mask_at_box].astype(np.float32),
        far=far_full[mask_at_box].astype(np.float32),
        mask=np.ones(pix_idx.shape[0], bool),
    )
    return EvalRays(
        rays=rays,
        pix_idx=pix_idx,
        rgb=(img.reshape(-1, 3)[mask_at_box].astype(np.float32)
             if img is not None
             else np.zeros((pix_idx.shape[0], 3), np.float32)),
        mask_at_box=mask_at_box,
    )
