"""CPU probe: how much prefilter-superset slack is left on the table.

The compact render's capacity (and so its decode cost) is set by the
cluster-ball PREFILTER superset, not by the exact cull fraction
(render/pipeline.py::_prefilter_tables).  Two inflation sources:

  (a) cluster spatial extent — segment-max of vd_v inflates the ball by the
      cluster's radius (~1 cm at Cc=1024, ~6.7 verts/cluster);
  (b) reach spread — under per-vertex radii, the segment-max of
      (vd_v + reach_v) lets one large-reach vertex inflate its whole ball.

This probe measures superset vs exact fractions (synthetic varied poses,
same counting as tools/measure_compact_ratio) across:

  * fine-cluster counts Cc in {1024, 2048, 4096}          (attacks a)
  * a reach-stratified partition at the SAME Cc budget     (attacks b)
    (k-means run independently inside reach bands, proportional budgets)

against both the uniform 0.1 m shell and a heterogeneous radii set
(0.02 m base, 15% of verts at 0.08 m — the worst realistic spread the
trained-radii tool produces).  Pure fraction measurement — run on CPU; an
on-chip A/B is only warranted if a variant cuts the superset by enough to
beat the extra prefilter matmul cost (~15 ms per 1024 extra centers at
bench scale, docs/PERF.md).

    JAX_PLATFORMS= python tools/probe_prefilter_tightness.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from transhuman_tpu.geometry.clusters import ClusterSpec  # noqa: E402
from transhuman_tpu.render.pipeline import pad_rays  # noqa: E402
from transhuman_tpu.testing import synthetic_rays, synthetic_setup  # noqa: E402
from transhuman_tpu.tools.measure_compact_ratio import make_counts_fn  # noqa: E402

N_RAYS = 8_192
N_FRAMES = 2


def stratified_partition(verts, reach, budget, bands=3, seed=0):
    """K-means independently inside reach bands (equal-width bins over
    [min, max] — quantile banding collapses on bimodal radii, where most
    values are identical); per-band budget proportional to member count
    (>=1).  Returns (assign, pool)."""
    lo, hi = float(reach.min()), float(reach.max())
    band = np.minimum(
        ((reach - lo) / max(hi - lo, 1e-9) * bands).astype(np.int64),
        bands - 1,
    )
    assign = np.zeros(verts.shape[0], np.int32)
    next_id = 0
    for b in range(bands):
        m = band == b
        if not m.any():
            continue
        nb = max(1, min(int(round(budget * m.sum() / verts.shape[0])),
                        int(m.sum())))
        spec = ClusterSpec.from_kmeans(verts[m], nb, iters=8, seed=seed)
        assign[m] = spec.vert2cluster + next_id
        next_id += nb
    pool = np.zeros((next_id, verts.shape[0]), np.float32)
    counts = np.bincount(assign, minlength=next_id)
    pool[assign, np.arange(verts.shape[0])] = 1.0 / counts[assign]
    return assign, pool, next_id


def measure(pipe, items):
    fn = make_counts_fn(pipe)
    sups, exs = [], []
    for frame, rays in items:
        sup, ex, n = fn(jax.tree.map(jnp.asarray, frame),
                        jax.tree.map(jnp.asarray, rays))
        sups.append(float(sup) / int(n))
        exs.append(float(ex) / int(n))
    return max(sups), max(exs)


def main():
    _, pipe, frame, smpl, _ = synthetic_setup(compact_ratio=0.5)
    rng = np.random.default_rng(0)
    items = []
    for i in range(N_FRAMES):
        pose = rng.normal(0.0, 0.2, 72).astype(np.float32)
        pose[:3] = 0.0
        verts, _, _ = smpl(pose, np.zeros(10))
        f = frame.replace(verts_world=np.asarray(verts, np.float32),
                          tar_verts_smpl=np.asarray(verts, np.float32))
        items.append((f, pad_rays(synthetic_rays(N_RAYS, seed=i),
                                  pipe.chunk_rays)))

    nv = pipe._canon_verts.shape[0]
    hetero = np.full(nv, 0.02, np.float32)
    hetero[rng.choice(nv, int(0.15 * nv), replace=False)] = 0.08

    for label, radii in (("shell_0.1", None), ("radii_hetero", hetero)):
        for cc in (1024, 2048, 4096):
            p = pipe.clone(vertex_radii=radii, _cull_clusters=cc,
                           cull_assign=None, cull_pool=None)
            sup, ex = measure(p, items)
            print(json.dumps({"variant": label, "partition": f"kmeans_{cc}",
                              "superset_max": round(sup, 4),
                              "exact_max": round(ex, 4),
                              "overhead": round(sup / max(ex, 1e-9), 3)}),
                  flush=True)
        if radii is not None:
            for cc in (1024, 2048):
                a, pool, n_eff = stratified_partition(
                    pipe._canon_verts, radii, cc)
                p = pipe.clone(vertex_radii=radii, cull_assign=a,
                               cull_pool=pool)
                sup, ex = measure(p, items)
                print(json.dumps({"variant": label,
                                  "partition": f"stratified_{cc}(eff {n_eff})",
                                  "superset_max": round(sup, 4),
                                  "exact_max": round(ex, 4),
                                  "overhead": round(sup / max(ex, 1e-9), 3)}),
                      flush=True)


if __name__ == "__main__":
    main()
