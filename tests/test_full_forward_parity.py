"""Capstone parity test: the ENTIRE render forward against an independent
torch oracle.

A torch replica of the reference model (TFull from test_convert_parity) and
a torch reimplementation of the reference renderer math (painting via
grid_sample, cluster pooling, ViT with canonical PE, DPaRF via torch.topk,
heads, alpha compositing) are run on a tiny scene; the flax pipeline with
converter-imported weights must reproduce the ray colors."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tests.test_convert_parity import TFull
from tests.test_embedder import torch_nerf_embed
from transhuman_tpu.geometry.clusters import ClusterSpec, normalize_positions
from transhuman_tpu.geometry.smpl import SMPLModel
from transhuman_tpu.models.network import TransHumanNet
from transhuman_tpu.render.pipeline import FrameInputs, RayBundle, RenderPipeline
from transhuman_tpu.tools.convert_checkpoint import (
    convert_state_dict,
    reference_pe_table,
)

V, H, W, NV, NC, NR, NS, K_NN = 3, 32, 32, 120, 12, 6, 5, 4

torch.manual_seed(7)


def grid_sample_ref(feat_vchw, uv, image_shape):
    """Reference sample_from_feature_map (if_clight_renderer.py:186-208)."""
    v, c, hf, wf = feat_vchw.shape
    scale = np.array([wf, hf]) / (np.array([wf, hf]) - 1) * 2.0 / np.array(
        [image_shape[1], image_shape[0]]
    )
    grid = (uv * torch.tensor(scale, dtype=torch.float32) - 1.0).unsqueeze(2)
    out = F.grid_sample(
        feat_vchw, grid, align_corners=True, mode="bilinear",
        padding_mode="border",
    )
    return out[:, :, :, 0]  # (V, C, N)


def project_ref(xyz, K, R, T):
    """(N,3) world -> (V,N,2) uv (paint_neural_human projection)."""
    cam = torch.einsum("vab,nb->vna", R, xyz) + T[:, None, :]
    pix = torch.einsum("vab,vnb->vna", K, cam)
    return pix[..., :2] / pix[..., 2:]


class TorchRenderer:
    def __init__(self, net: TFull, pool_matrix, pe_table, centers, rot):
        self.net = net
        self.pool = torch.from_numpy(pool_matrix)  # (C, NV)
        self.pe = torch.from_numpy(pe_table)  # (C, D)
        self.centers = centers  # (C,3) torch, SMPL coords
        self.rot = rot  # (C,3,3)

    def __call__(self, images, vizmaps, K, R, T, verts_world, Rh, Th,
                 ray_o, ray_d, near, far):
        imgs = images.permute(0, 3, 1, 2)  # VCHW
        holder_map, pixel_map = self.net.encoder(imgs)

        uv = project_ref(verts_world, K, R, T)
        latent = grid_sample_ref(holder_map, uv, (H, W)).permute(0, 2, 1)
        holder = latent * vizmaps[..., None]
        # ViT with precomputed PE table (bit-parity with the flax side)
        x = torch.einsum("cv,Vvd->Vcd", self.pool, holder) + self.pe[None]
        for blk in self.net.ViT.blocks:
            x = blk(x)
        tokens = self.net.ViT.norm(x)  # (V, C, D)

        # rays -> points
        t_lin = torch.linspace(0, 1, NS)
        z_vals = near[:, None] * (1 - t_lin) + far[:, None] * t_lin
        pts = ray_o[:, None] + ray_d[:, None] * z_vals[..., None]  # (R,S,3)
        flat = pts.reshape(-1, 3)
        pts_smpl = (flat - Th) @ Rh

        viewdir = ray_d / ray_d.norm(dim=-1, keepdim=True)
        vde = torch_nerf_embed(viewdir, 4)  # (R, 27)
        vde = vde[:, None].expand(-1, NS, -1).reshape(-1, 27)

        # pixel-aligned features
        uv_p = project_ref(flat, K, R, T)
        pixel_feat = grid_sample_ref(pixel_map, uv_p, (H, W))  # (V, 384, N)

        # DPaRF
        d2 = torch.cdist(pts_smpl, self.centers) ** 2
        dist, idx = torch.topk(-torch.sqrt(d2.clamp_min(1e-12)), K_NN, dim=1)
        dist = -dist
        w = F.softmax(-dist / 0.5, dim=1)
        ck = self.centers[idx]  # (N,k,3)
        rk = self.rot[idx]  # (N,k,3,3)
        rel = pts_smpl[:, None] - ck
        local = torch.matmul(rel.unsqueeze(-2), rk).squeeze(-2)  # (N,k,3)
        # pixelNeRF PE, pi freqs, 10 bands, include input
        parts = [local]
        for fb in range(10):
            s = local * (np.pi * 2.0**fb)
            parts.append(torch.sin(s))
            parts.append(torch.cos(s))
        pe_loc = torch.cat(parts, -1)  # (N,k,63)
        pe_agg = (w[..., None] * pe_loc).sum(1)
        tok_k = tokens[:, idx]  # (V,N,k,D)
        tok_agg = (w[None, :, :, None] * tok_k).sum(2)  # (V,N,D)
        human_rep = torch.cat(
            [tok_agg, pe_agg[None].expand(V, -1, -1)], -1
        ).permute(0, 2, 1)  # (V, 255, N)

        heads_in = human_rep
        # heads (same math as THeads.forward)
        net = self.net
        net_ske = F.relu(net.fc_0(heads_in))
        net_pix = F.relu(net.alpha_res_0(pixel_feat))
        key = net.spatial_key_value_0.key_embed(net_pix.permute(2, 1, 0))
        val = net.spatial_key_value_0.value_embed(net_pix.permute(2, 1, 0))
        qk = net.spatial_key_value_1.key_embed(net_ske.permute(2, 1, 0))
        qv = net.spatial_key_value_1.value_embed(net_ske.permute(2, 1, 0))
        A = F.softmax(torch.bmm(key.transpose(1, 2), qk) / math.sqrt(128), dim=1)
        fused = (qv + torch.bmm(val, A)).permute(2, 1, 0)
        fused = F.relu(net.fc_1(fused))
        inter = F.relu(net.fc_2(fused))
        alpha = net.alpha_fc(F.relu(net.fc_3(inter.mean(0, keepdim=True))))
        feat = net.feature_fc(inter) + net.rgb_res_0(pixel_feat)
        vdir = vde.t().unsqueeze(0).expand(V, -1, -1)
        feat = torch.cat([feat, vdir], 1)
        feat = F.relu(net.view_fc(feat)) + net.rgb_res_1(pixel_feat)
        rgb = net.rgb_fc(F.relu(net.fc_4(feat.mean(0, keepdim=True))))
        raw = torch.cat([rgb, alpha], 1).transpose(1, 2)[0]  # (N,4)

        # composite
        raw = raw.reshape(NR, NS, 4)
        dists = z_vals[:, 1:] - z_vals[:, :-1]
        dists = torch.cat([dists, torch.full_like(dists[:, :1], 1e10)], -1)
        dists = dists * ray_d.norm(dim=-1, keepdim=True)
        rgb_s = torch.sigmoid(raw[..., :3])
        alpha_s = 1 - torch.exp(-F.relu(raw[..., 3]) * dists)
        trans = torch.cumprod(
            torch.cat([torch.ones_like(alpha_s[:, :1]), 1 - alpha_s + 1e-10], -1),
            -1,
        )[:, :-1]
        wgt = alpha_s * trans
        return (wgt[..., None] * rgb_s).sum(1), wgt.sum(1)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    smpl = SMPLModel.synthetic(n_verts=NV)
    cluster = ClusterSpec.from_kmeans(smpl.v_template, NC, iters=5)
    verts, _, Tm = smpl(np.zeros(72), np.zeros(10))
    images = rng.random((V, H, W, 3)).astype(np.float32)
    vizmaps = (rng.random((V, NV)) > 0.2).astype(np.float32)
    K = np.tile(np.array([[[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]]], np.float32), (V, 1, 1))
    Rm = np.stack([
        np.array([[np.cos(t), 0, -np.sin(t)], [0, 1, 0], [np.sin(t), 0, np.cos(t)]], np.float32)
        for t in (0.0, 2.1, 4.2)
    ])
    Tv = np.stack([-Rm[i] @ np.array([-2.5 * np.sin(t), 0, -2.5 * np.cos(t)], np.float32)
                   for i, t in enumerate((0.0, 2.1, 4.2))])
    Rh = np.linalg.qr(rng.standard_normal((3, 3)))[0].astype(np.float32)
    Th = (rng.standard_normal(3) * 0.05).astype(np.float32)
    verts_world = verts @ np.linalg.inv(Rh) + Th  # smpl->world so tar_verts_smpl=verts
    blend_rot = np.stack([np.linalg.qr(m)[0] for m in rng.standard_normal((NV, 3, 3))]).astype(np.float32)

    dirs = rng.standard_normal((NR, 3)).astype(np.float32) * 0.05
    dirs[:, 2] += 1.0
    ray_o = np.tile(np.array([0, 0, -2.3], np.float32), (NR, 1)) + Th
    near = np.full(NR, 1.0, np.float32)
    far = np.full(NR, 3.2, np.float32)
    return dict(
        smpl=smpl, cluster=cluster, images=images, vizmaps=vizmaps, K=K,
        R=Rm, T=Tv.astype(np.float32), verts_world=verts_world.astype(np.float32),
        verts_smpl=verts, blend_rot=blend_rot, Rh=Rh, Th=Th,
        ray_o=ray_o, ray_d=dirs, near=near, far=far,
    )


def test_full_forward_matches_torch_oracle(scene):
    s = scene
    cluster = s["cluster"]
    pe_can = normalize_positions(cluster.pool_matrix @ s["smpl"].v_template, 1.5)
    pe_table = reference_pe_table(pe_can, 192)

    tf = TFull(depth=2)
    tf.train()
    variables = convert_state_dict(tf.state_dict())

    centers = cluster.pool_matrix @ s["verts_smpl"]
    rot = np.einsum("cv,vij->cij", cluster.pool_matrix, s["blend_rot"])
    oracle = TorchRenderer(
        tf, cluster.pool_matrix, pe_table,
        torch.from_numpy(centers.astype(np.float32)),
        torch.from_numpy(rot.astype(np.float32)),
    )
    tt = lambda x: torch.from_numpy(np.asarray(x, np.float32))
    with torch.no_grad():
        rgb_t, acc_t = oracle(
            tt(s["images"]), tt(s["vizmaps"]), tt(s["K"]), tt(s["R"]), tt(s["T"]),
            tt(s["verts_world"]), tt(s["Rh"]), tt(s["Th"]),
            tt(s["ray_o"]), tt(s["ray_d"]), tt(s["near"]), tt(s["far"]),
        )

    model = TransHumanNet(embed_dim=192, vit_depth=2, vit_heads=3, knn_k=K_NN)
    pipe = RenderPipeline(
        model, cluster, s["smpl"].v_template, n_samples=NS, chunk_rays=2,
        pe_table=pe_table,
    )
    frame = FrameInputs(
        images=jnp.asarray(s["images"]), vizmaps=jnp.asarray(s["vizmaps"]),
        K=jnp.asarray(s["K"]), R=jnp.asarray(s["R"]), T=jnp.asarray(s["T"]),
        verts_world=jnp.asarray(s["verts_world"]),
        tar_verts_smpl=jnp.asarray(s["verts_smpl"]),
        blend_rot=jnp.asarray(s["blend_rot"]),
        Rh=jnp.asarray(s["Rh"]), Th=jnp.asarray(s["Th"]),
    )
    rays = RayBundle(
        ray_o=jnp.asarray(s["ray_o"]), ray_d=jnp.asarray(s["ray_d"]),
        near=jnp.asarray(s["near"]), far=jnp.asarray(s["far"]),
        mask=jnp.ones(NR, bool),
    )
    # jitted: the compile persists in conftest's cache across suite runs
    # (and jit does not move the parity — same ops, highest matmul precision)
    out = jax.jit(pipe.render_train)(variables, frame, rays, rng=None)

    np.testing.assert_allclose(
        np.asarray(out["rgb_map"]), rgb_t.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["acc_map"]), acc_t.numpy(), atol=2e-3
    )
