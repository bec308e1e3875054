"""Pipeline-parallel vit_base TransHE: the user path for parallel/pp.py.

The reference ships vit_small/vit_base TransHE factories
(vision_transformer.py:404-417) but no way to run them beyond one GPU.
This example pipelines a REAL vit_base TransHE (768-d, 12 blocks, ~85 MB of
block params in f32) over a ('pipe',) mesh — each device holds only its
stage's blocks — and verifies the pipelined forward and gradients against
the unsharded module.  Optionally composes tensor parallelism within each
stage over a second 'model' axis (PP x TP).

Run on the 8-device virtual CPU mesh (no TPU needed):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/pp_vit_base.py

    # PP x TP over a ('pipe','model') 4x2 mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python examples/pp_vit_base.py --tp 2

On real hardware, drop the XLA_FLAGS/JAX_PLATFORMS and the same code runs
over the chips jax.devices() reports (stages hop via ICI ppermute).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from transhuman_tpu.cli.common import _honor_jax_platforms_env

_honor_jax_platforms_env()  # some PJRT plugins ignore the env var


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--stages", type=int, default=4, help="pipe axis size")
    p.add_argument("--micro", type=int, default=4, help="microbatches")
    p.add_argument("--tp", type=int, default=1,
                   help=">1: Megatron TP within each stage over a second "
                        "'model' mesh axis (needs stages*tp devices)")
    p.add_argument("--batch", type=int, default=8, help="ViT batch rows")
    p.add_argument("--tokens", type=int, default=300,
                   help="cluster tokens (num_class)")
    args = p.parse_args(argv)

    from jax.sharding import Mesh

    from transhuman_tpu.models.vit import TransHE
    from transhuman_tpu.parallel.pp import (
        make_pp_mesh,
        make_pp_vit_apply,
        shard_pp_params,
        stack_block_params,
        unstack_block_params,
    )

    # the reference's vit_base geometry (vision_transformer.py:414-417)
    model = TransHE(embed_dim=768, depth=12, num_heads=12)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.normal(size=(args.batch, args.tokens, 768)), jnp.float32)
    # precomputed (B, C, D) PE table, the official-checkpoint path: at
    # embed_dim=768 the raw-centroid encoding's top band is pi*2^127 —
    # f32 overflow -> NaN in this formulation AND the reference's
    # (helpers.py get_embedder at multires=D/6), so vit_base-scale runs
    # must carry a stored table (see models/vit.py docstring)
    pe = jnp.asarray(
        rng.uniform(-1, 1, size=(args.batch, args.tokens, 768)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, pe)["params"]
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree_util.tree_leaves(params))
    print(f"vit_base TransHE: {n_bytes / 1e6:.1f} MB of params, "
          f"{args.stages} pipeline stages"
          + (f" x TP {args.tp}" if args.tp > 1 else ""))

    tp_axis = None
    if args.tp > 1:
        devs = np.asarray(jax.devices())
        need = args.stages * args.tp
        if devs.size < need:
            raise SystemExit(f"need {need} devices, have {devs.size}")
        mesh = Mesh(devs[:need].reshape(args.stages, args.tp),
                    ("pipe", "model"))
        tp_axis = "model"
    else:
        mesh = make_pp_mesh(args.stages)

    apply = make_pp_vit_apply(model, mesh, args.micro, tp_axis=tp_axis)
    pp = shard_pp_params(mesh, stack_block_params(params, args.stages),
                         tp_axis=tp_axis)

    # per-device parameter footprint: stages are NOT replicated
    qkv = pp["stages"]["attn"]["qkv"]["kernel"]
    shard_bytes = qkv.addressable_shards[0].data.size * 4
    print(f"qkv kernel {qkv.sharding.spec}: "
          f"{qkv.size * 4 / 1e6:.1f} MB total, "
          f"{shard_bytes / 1e6:.2f} MB on device 0")

    ref = model.apply({"params": params}, tokens, pe)
    got = jax.jit(apply)(pp, tokens, pe)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"pipelined forward max|delta| vs unsharded: {err:.2e}")
    assert err < 1e-4

    tgt = jnp.asarray(rng.normal(size=tokens.shape), jnp.float32)
    ref_g = jax.grad(
        lambda q: jnp.mean((model.apply({"params": q}, tokens, pe) - tgt) ** 2)
    )(params)
    pp_g = jax.jit(
        jax.grad(lambda q: jnp.mean((apply(q, tokens, pe) - tgt) ** 2))
    )(pp)
    gerr = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(unstack_block_params(pp_g)),
            jax.tree_util.tree_leaves(dict(ref_g)),
        )
    )
    print(f"pipelined backward max|grad delta|: {gerr:.2e}")
    assert gerr < 1e-5
    print("OK: pipelined vit_base forward+backward match the unsharded module")


if __name__ == "__main__":
    main()
