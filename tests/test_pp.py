"""Pipeline-parallel TransHE (parallel/pp.py): forward + gradient equality
vs the unsharded module, stage-param sharding, and layout round-trips.

The reference has no pipeline parallelism (SURVEY.md §2.4); this is the
TPU-native extension for vit_base-scale TransHE variants
(vision_transformer.py:404-417)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from transhuman_tpu.models.vit import TransHE
from transhuman_tpu.parallel.pp import (
    make_pp_mesh,
    make_pp_vit_apply,
    shard_pp_params,
    stack_block_params,
    unstack_block_params,
)

DIM, HEADS, DEPTH = 12, 2, 4


def _setup(b=4, c=6, seed=0):
    model = TransHE(embed_dim=DIM, depth=DEPTH, num_heads=HEADS)
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.normal(size=(b, c, DIM)), jnp.float32)
    pe = jnp.asarray(rng.uniform(-1, 1, size=(b, c, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, pe)["params"]
    return model, params, tokens, pe


def test_stack_round_trip():
    _, params, _, _ = _setup()
    pp = stack_block_params(params, 2)
    lead = jax.tree_util.tree_leaves(pp["stages"])[0].shape[:2]
    assert lead == (2, DEPTH // 2)
    back = unstack_block_params(pp)
    jax.tree.map(
        np.testing.assert_array_equal, back, dict(params)
    )


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4), (2, 4), (4, 1)])
def test_pp_forward_matches_unsharded(n_stages, n_micro):
    model, params, tokens, pe = _setup(b=4)
    ref = model.apply({"params": params}, tokens, pe)
    mesh = make_pp_mesh(n_stages)
    apply = make_pp_vit_apply(model, mesh, n_micro)
    pp = shard_pp_params(mesh, stack_block_params(params, n_stages))
    got = jax.jit(apply)(pp, tokens, pe)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pp_forward_with_mask_and_pe_table():
    model, params, tokens, pe = _setup(b=4)
    mask = np.zeros(tokens.shape[:2], bool)
    mask[:, ::2] = True
    from transhuman_tpu.models.embedder import embed_vit_pos

    table = embed_vit_pos(pe, DIM)  # precomputed (B, C, D) path
    ref = model.apply({"params": params}, tokens, table, jnp.asarray(mask))
    mesh = make_pp_mesh(2)
    apply = make_pp_vit_apply(model, mesh, 2)
    pp = shard_pp_params(mesh, stack_block_params(params, 2))
    got = jax.jit(apply)(pp, tokens, table, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pp_grads_match_unsharded():
    """jax.grad through the scanned pipeline IS the pipelined backward —
    cotangents ride the inverse ppermute ring.  Compare per-block grads."""
    model, params, tokens, pe = _setup(b=4)
    tgt = jnp.asarray(np.random.default_rng(7).normal(size=tokens.shape),
                      jnp.float32)

    def ref_loss(p):
        return jnp.mean((model.apply({"params": p}, tokens, pe) - tgt) ** 2)

    ref_grads = jax.grad(ref_loss)(params)

    mesh = make_pp_mesh(2)
    apply = make_pp_vit_apply(model, mesh, 2)
    pp = shard_pp_params(mesh, stack_block_params(params, 2))

    def pp_loss(p):
        return jnp.mean((apply(p, tokens, pe) - tgt) ** 2)

    pp_grads = jax.jit(jax.grad(pp_loss))(pp)
    got = unstack_block_params(pp_grads)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        ),
        got,
        dict(ref_grads),
    )


def test_pp_composes_with_dp():
    """DP x PP over a ('data','pipe') mesh: microbatch rows sharded over
    'data', stages over 'pipe'; forward + grads equal to unsharded."""
    from jax.sharding import Mesh

    model, params, tokens, pe = _setup(b=4)
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "pipe"))
    apply = make_pp_vit_apply(model, mesh, n_micro=2, batch_axis="data")
    # the production placement helper works unchanged on the 2-D mesh
    pp = shard_pp_params(mesh, stack_block_params(params, 2))
    ref = model.apply({"params": params}, tokens, pe)
    got = jax.jit(apply)(pp, tokens, pe)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    tgt = jnp.asarray(np.random.default_rng(3).normal(size=tokens.shape),
                      jnp.float32)

    ref_g = jax.grad(
        lambda p: jnp.mean((model.apply({"params": p}, tokens, pe) - tgt) ** 2)
    )(params)
    pp_g = jax.jit(
        jax.grad(lambda p: jnp.mean((apply(p, tokens, pe) - tgt) ** 2))
    )(pp)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        ),
        unstack_block_params(pp_g),
        dict(ref_g),
    )


def test_pp_composes_with_tp():
    """PP x TP over a ('pipe','model') mesh: stages manual over 'pipe'
    (ppermute ring), block matmuls GSPMD-partitioned over 'model' from the
    Megatron shardings shard_pp_params(tp_axis=...) placed — forward +
    grads equal to unsharded, and the stacked qkv kernel really carries the
    column-parallel spec."""
    from jax.sharding import Mesh

    model, params, tokens, pe = _setup(b=4)
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("pipe", "model"))
    apply = make_pp_vit_apply(model, mesh, n_micro=2, tp_axis="model")
    pp = shard_pp_params(mesh, stack_block_params(params, 2),
                         tp_axis="model")
    # placement really is Megatron column-parallel on the stacked leaves
    assert pp["stages"]["attn"]["qkv"]["kernel"].sharding.spec == P(
        "pipe", None, None, "model")
    assert pp["stages"]["attn"]["proj"]["kernel"].sharding.spec == P(
        "pipe", None, "model", None)

    ref = model.apply({"params": params}, tokens, pe)
    got = jax.jit(apply)(pp, tokens, pe)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    tgt = jnp.asarray(np.random.default_rng(5).normal(size=tokens.shape),
                      jnp.float32)
    ref_g = jax.grad(
        lambda p: jnp.mean((model.apply({"params": p}, tokens, pe) - tgt) ** 2)
    )(params)
    pp_g = jax.jit(
        jax.grad(lambda p: jnp.mean((apply(p, tokens, pe) - tgt) ** 2))
    )(pp)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6
        ),
        unstack_block_params(pp_g),
        dict(ref_g),
    )


def test_pp_tp_axis_validation():
    from jax.sharding import Mesh

    model, params, tokens, pe = _setup()
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("pipe", "model"))
    with pytest.raises(ValueError, match="not in mesh"):
        make_pp_vit_apply(model, mesh, 2, tp_axis="nope")
    with pytest.raises(ValueError, match="distinct axis"):
        make_pp_vit_apply(model, mesh, 2, tp_axis="pipe")


def test_pp_bf16_matches_unsharded():
    """The flagship compute dtype: pipelined bf16 blocks == unsharded bf16
    (same op order per token; tolerance covers scan-vs-unroll fusion)."""
    model = TransHE(embed_dim=DIM, depth=DEPTH, num_heads=HEADS,
                    dtype=jnp.bfloat16)
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.normal(size=(4, 6, DIM)), jnp.float32)
    pe = jnp.asarray(rng.uniform(-1, 1, size=(4, 6, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), tokens, pe)["params"]
    ref = model.apply({"params": params}, tokens, pe)
    mesh = make_pp_mesh(2)
    apply = make_pp_vit_apply(model, mesh, 2)
    pp = shard_pp_params(mesh, stack_block_params(params, 2))
    got = jax.jit(apply)(pp, tokens, pe)
    assert got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_pp_stage_params_actually_sharded():
    model, params, _, _ = _setup()
    mesh = make_pp_mesh(4)
    pp = shard_pp_params(mesh, stack_block_params(params, 4))
    qkv = pp["stages"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P("pipe")
    assert pp["mask_token"].sharding.spec == P()


def test_pp_validation_errors():
    model, params, tokens, pe = _setup()
    with pytest.raises(ValueError, match="not divisible"):
        stack_block_params(params, 3)
    mesh = make_pp_mesh(2)
    with pytest.raises(ValueError, match="not divisible"):
        make_pp_vit_apply(TransHE(embed_dim=DIM, depth=3, num_heads=HEADS),
                          mesh, 2)
    apply = make_pp_vit_apply(model, mesh, 3)
    pp = shard_pp_params(mesh, stack_block_params(params, 2))
    with pytest.raises(ValueError, match="not divisible"):
        apply(pp, tokens, pe)
    # params stacked for 4 stages on a 2-stage mesh would shard cleanly and
    # silently drop blocks 1 and 3 without the lead-dim guard
    apply2 = make_pp_vit_apply(model, mesh, 2)
    pp4 = shard_pp_params(mesh, stack_block_params(params, 4))
    with pytest.raises(ValueError, match="stacked for 4 stages"):
        apply2(pp4, tokens, pe)
