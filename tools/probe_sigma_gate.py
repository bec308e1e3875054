"""Sigma-gated RGB decode A/B at bench scale (VERDICT r3 item #1).

The reference's render_fast evaluates the RGB branch only where alpha > 0
(cross_transformer.py:291-311: trunk + alpha for every point, then
`inter_net[..., density_mask]` feeds `_RGB_forward`).  Our compact path
reproduces the *cull* gating but runs the RGB-branch matmuls
(feature_fc/rgb_res0/view_fc/rgb_res1/fc_4/rgb_out, models/heads.py:153-168)
for every cull survivor.  This probe measures, at exact bench scale
(65,536 rays x 64 samples, compact_ratio 0.1875, bf16):

  base   the shipping compact render (bench.py config)
  norgb  RGB branch replaced by zeros — the HARD UPPER BOUND on any gating
  gated  a real in-chunk gated decode: trunk+sigma for all chunk points,
         jnp.nonzero(size=gate_ratio*cp) compaction of sigma>0 survivors,
         ONE packed per-point row gather [inter | pixel_feat | vde]
         (descriptor economics: one ~3.9 KB row per gated point), RGB branch
         on the compacted set, scatter-back

Decision rule (the dparf2 discipline): productionize only if gated beats
base meaningfully AND norgb shows the headroom; otherwise document the
floor in docs/PERF.md and stop.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/probe_sigma_gate.py [base norgb gated ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from transhuman_tpu.models.encoder import SpatialEncoder  # noqa: E402
from transhuman_tpu.models.heads import NeRFHeads, ViewFusion  # noqa: E402
from transhuman_tpu.models.network import TransHumanNet  # noqa: E402
from transhuman_tpu.models.vit import TransHE  # noqa: E402
from transhuman_tpu.render.pipeline import RenderPipeline  # noqa: E402
from transhuman_tpu.testing import (  # noqa: E402
    init_params,
    synthetic_rays,
    synthetic_setup,
)

N_RAYS, N_SAMPLES, CHUNK, RATIO = 65_536, 64, 512, 0.1875
GATE_RATIO = 0.625  # capacity for sigma>0 survivors per chunk (random-init
# params put ~50% of valid points at sigma>0; real trained weights would be
# lower, making this probe's overhead side PESSIMISTIC for the gated variant
# but the savings side OPTIMISTIC — both bracketed by norgb)


class NoRGBHeads(NeRFHeads):
    """Trunk + sigma only; rgb = 0.  Upper bound for any RGB gating."""

    @nn.compact
    def __call__(self, human_rep, pixel_feat, viewdir_embed, pts_mask=None):
        net_hold = nn.relu(
            nn.Dense(self.hidden, dtype=self.dtype, name="holder_in")(human_rep)
        )
        net_pix = nn.relu(
            nn.Dense(self.hidden, dtype=self.dtype, name="pixel_in")(pixel_feat)
        )
        net = ViewFusion(dtype=self.dtype, name="fusion")(net_hold, net_pix)
        net = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc_1")(net))
        inter = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc_2")(net))
        opa = jnp.mean(inter, axis=0)
        opa = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc_3")(opa))
        sigma = nn.Dense(1, dtype=self.dtype, name="alpha_out")(opa)
        raw = jnp.concatenate([jnp.zeros_like(sigma, shape=sigma.shape[:1] + (3,)), sigma], axis=-1)
        if pts_mask is not None:
            raw = jnp.where(pts_mask[:, None], raw, 0.0)
        return raw


class GatedHeads(NeRFHeads):
    """In-chunk sigma-gated RGB: nonzero-compact the sigma>0 survivors,
    run the RGB branch on them only, scatter back.  Same param tree as
    NeRFHeads (identical Dense names)."""

    gate_ratio: float = GATE_RATIO

    @nn.compact
    def __call__(self, human_rep, pixel_feat, viewdir_embed, pts_mask=None):
        v, n, _ = human_rep.shape
        net_hold = nn.relu(
            nn.Dense(self.hidden, dtype=self.dtype, name="holder_in")(human_rep)
        )
        net_pix = nn.relu(
            nn.Dense(self.hidden, dtype=self.dtype, name="pixel_in")(pixel_feat)
        )
        net = ViewFusion(dtype=self.dtype, name="fusion")(net_hold, net_pix)
        net = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc_1")(net))
        inter = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc_2")(net))
        opa = jnp.mean(inter, axis=0)
        opa = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc_3")(opa))
        sigma = nn.Dense(1, dtype=self.dtype, name="alpha_out")(opa)

        gate = sigma[:, 0] > 0
        if pts_mask is not None:
            gate = gate & pts_mask
        m2 = int(self.gate_ratio * n)
        (idx,) = jnp.nonzero(gate, size=m2, fill_value=n)
        safe = jnp.minimum(idx, n - 1)
        pfw = pixel_feat.shape[-1]
        packed = jnp.concatenate(
            [
                inter.transpose(1, 0, 2).reshape(n, v * self.hidden),
                pixel_feat.transpose(1, 0, 2).reshape(n, v * pfw),
                viewdir_embed.astype(inter.dtype),
            ],
            axis=1,
        )
        pc = packed.at[safe].get(indices_are_sorted=True)
        ic = pc[:, : v * self.hidden].reshape(m2, v, self.hidden).transpose(1, 0, 2)
        pxc = (
            pc[:, v * self.hidden : v * self.hidden + v * pfw]
            .reshape(m2, v, pfw)
            .transpose(1, 0, 2)
        )
        vdec = pc[:, v * self.hidden + v * pfw :]

        feat = nn.Dense(self.hidden, dtype=self.dtype, name="feature_fc")(ic)
        feat = feat + nn.Dense(self.hidden, dtype=self.dtype, name="rgb_res0")(pxc)
        vdir = jnp.broadcast_to(vdec[None], (v, m2, vdec.shape[-1]))
        feat = jnp.concatenate([feat, vdir], axis=-1)
        feat = nn.relu(nn.Dense(self.rgb_hidden, dtype=self.dtype, name="view_fc")(feat))
        feat = feat + nn.Dense(self.rgb_hidden, dtype=self.dtype, name="rgb_res1")(pxc)
        feat = jnp.mean(feat, axis=0)
        feat = nn.relu(nn.Dense(self.rgb_hidden, dtype=self.dtype, name="fc_4")(feat))
        rgb_c = nn.Dense(3, dtype=self.dtype, name="rgb_out")(feat)

        rgb = (
            jnp.zeros((n, 3), rgb_c.dtype)
            .at[idx]
            .set(rgb_c, mode="drop", indices_are_sorted=True)
        )
        raw = jnp.concatenate([rgb, sigma], axis=-1)
        if pts_mask is not None:
            raw = jnp.where(pts_mask[:, None], raw, 0.0)
        return raw


def variant_net(base: TransHumanNet, heads_cls):
    class VariantNet(TransHumanNet):
        def setup(self):
            self.encoder = SpatialEncoder(
                embed_dim=self.embed_dim, axis_name=self.axis_name, dtype=self.dtype
            )
            self.transhe = TransHE(
                embed_dim=self.embed_dim,
                depth=self.vit_depth,
                num_heads=self.vit_heads,
                dtype=self.dtype,
            )
            self.heads = heads_cls(dtype=self.dtype)

    return VariantNet(
        embed_dim=base.embed_dim,
        vit_depth=base.vit_depth,
        vit_heads=base.vit_heads,
        knn_k=base.knn_k,
        knn_dist_alpha=base.knn_dist_alpha,
        knn_freqs=base.knn_freqs,
        view_freqs=base.view_freqs,
        use_truncation=base.use_truncation,
        knn_sigma=base.knn_sigma,
        axis_name=base.axis_name,
        dtype=base.dtype,
    )


def clone_pipe(pipe, model):
    p = RenderPipeline.__new__(RenderPipeline)
    p.__dict__.update(pipe.__dict__)
    p.model = model
    return p


def timed(render, params, frame, rays, n_iters=10):
    out = render(params, frame, rays)
    float(jnp.sum(out["acc_map"]))
    overflow = int(np.asarray(out.get("overflow", [0]))[0])
    t0 = time.perf_counter()
    prev = None
    for _ in range(n_iters):
        out = render(params, frame, rays)
        if prev is not None:
            float(jnp.sum(prev["acc_map"]))
        prev = out
    float(jnp.sum(prev["acc_map"]))
    dt = (time.perf_counter() - t0) / n_iters
    return dt, overflow, prev


def main():
    variants = sys.argv[1:] or ["base", "norgb", "gated"]
    model, pipe, frame, _, cluster = synthetic_setup(
        image_hw=(512, 512),
        n_verts=6890,
        n_clusters=300,
        n_samples=N_SAMPLES,
        chunk_rays=CHUNK,
        dtype=jnp.bfloat16,
        compact_ratio=RATIO,
    )
    params = init_params(model, frame, cluster.num_clusters, jax.random.PRNGKey(0))
    rays = synthetic_rays(N_RAYS)
    frame = jax.tree.map(jnp.asarray, frame)
    rays = jax.tree.map(jnp.asarray, rays)

    nets = {
        "base": model,
        "norgb": variant_net(model, NoRGBHeads),
        "gated": variant_net(model, GatedHeads),
    }
    base_out = None
    for name in variants:
        p = clone_pipe(pipe, nets[name])
        render = jax.jit(lambda pr, f, r, _p=p: _p.render_frame(pr, f, r))
        dt, overflow, out = timed(render, params, frame, rays)
        print(
            f"{name:6s} {dt*1e3:8.1f} ms  {N_RAYS/dt:9,.0f} rays/s  overflow={overflow}",
            flush=True,
        )
        if name == "base":
            base_out = out
        elif name == "gated" and base_out is not None:
            d = float(
                jnp.max(jnp.abs(out["rgb_map"].astype(jnp.float32)
                                - base_out["rgb_map"].astype(jnp.float32)))
            )
            print(f"  gated-vs-base rgb_map max|diff| = {d:.3e} "
                  "(nonzero => gate capacity clipped; raise GATE_RATIO)",
                  flush=True)


if __name__ == "__main__":
    main()
