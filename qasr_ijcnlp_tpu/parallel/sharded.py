"""Tensor-parallel encoder trunk under ``jax.shard_map``.

Under pure data parallelism the Pallas kernels partition automatically
(``ops/partition.py`` batch-partitions them through GSPMD).  Tensor
parallelism is different: the fused encoder block computes LN + QKV +
attention + MLP as opaque kernels over the FULL model width, so GSPMD's only
legal move is to all-gather the head-sharded weights around each call.  This
module is the mesh-aware path that keeps the kernels *sharded*:

* the whole trunk runs inside one ``shard_map`` over the (data, model) mesh;
* each model shard calls the attention kernel (ops/encoder_block.py
  ``fused_attention_ln``) with its OWN (D, D/tp) head columns — the kernel's
  (batch, head-group) grid just runs with fewer head groups;
* the output projection and MLP second matmul are row-parallel: each shard
  contributes a partial (B, T, D) product and one ``psum`` over the model
  axis completes it — exactly the two collectives per block that
  column/row-parallel transformer sharding requires (same decomposition
  GSPMD derives for the XLA formulation, here made explicit so the kernels
  survive).

Numerics match the unfused single-device block to float-reassociation level
(tests/test_shardmap_kernels.py pins parity on the 8-virtual-device CPU
mesh, kernels in interpret mode).  Backward works: ``fused_attention_ln``
carries a custom VJP through the XLA formulation and ``psum`` transposes
under shard_map, so the sharded train step can run with kernels on.

Replaces (capability the reference lacks): the torch SDPA block at
/root/reference/whisper/whisper/model.py:111-146 under SURVEY.md §2.5's
mesh requirement.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from . import DATA_AXIS, MODEL_AXIS, _path_keys, encoder_block_specs

def _lin(t, p, dt):
    """y = t @ w (+ b) with weights cast to the compute dtype — the one
    projection primitive shared by every shard_map trunk (keeps them in
    lockstep with models.whisper.linear's dtype handling)."""
    out = t @ p["w"].astype(dt)
    return out + p["b"].astype(dt) if "b" in p else out



def mesh_axis_sizes(mesh: Mesh):
    shape = dict(mesh.shape)
    return shape.get(DATA_AXIS, 1), shape.get(MODEL_AXIS, 1)


def tp_trunk_applicable(dims, mesh: Mesh, batch: int) -> bool:
    """The head-sharded trunk needs: a model axis > 1, heads and MLP width
    divisible by it, and a batch divisible by the data axis (shard_map has
    no ragged shards; non-dividing batches fall back to GSPMD)."""
    dp, tp = mesh_axis_sizes(mesh)
    return (
        tp > 1
        and dims.n_audio_head % tp == 0
        and (4 * dims.n_audio_state) % tp == 0
        and batch % dp == 0
    )


def tp_trunk(params, x, dims, t_real: int, mesh: Mesh):
    """Head-sharded encoder trunk: (B, T, D) -> (B, T, D) over ``mesh``.

    ``params`` is the encoder tree (blocks + ln_post) with leaves sharded by
    :func:`parallel.param_specs` (column-parallel QKV/fc, row-parallel
    out/proj); ``x`` is batch-sharded along the data axis.
    """
    from ..models import whisper as w
    from ..ops import encoder_block as eb

    dp, tp = mesh_axis_sizes(mesh)
    T = t_real
    Tp = (T + 127) // 128 * 128
    nh_local = dims.n_audio_head // tp
    dh = dims.n_audio_state // dims.n_audio_head
    dt = x.dtype

    use_kernel = (
        w._flash_enabled()
        and Tp >= 512
        and eb.attn_applicable(nh_local, dims.n_audio_state, Tp, d_head=dh)
        and (dt == jnp.bfloat16 or jax.default_backend() != "tpu")
    )

    def body(blocks, lnp, xx):
        if use_kernel and xx.shape[1] != Tp:
            xx = jnp.pad(xx, ((0, 0), (0, Tp - xx.shape[1]), (0, 0)))
        # Always mask keys beyond the real length: x may arrive pre-padded
        # (fused conv stem emits tile-padded rows), and the XLA fallback
        # must not attend to the padding rows' LN(0) keys.
        t_mask = T

        def layer(xc, bp):
            if use_kernel:
                ao = eb.fused_attention_ln(
                    xc, bp["attn_ln"], bp["attn"], nh_local, T
                )
            else:
                ao = eb._xla_attn_ln(
                    xc, bp["attn_ln"], bp["attn"], nh_local, t_mask
                )
            part = ao @ bp["attn"]["out"]["w"].astype(dt)
            xc = xc + (
                jax.lax.psum(part, MODEL_AXIS)
                + bp["attn"]["out"]["b"].astype(dt)
            )
            h = w.layer_norm(xc, bp["mlp_ln"])
            t = jax.nn.gelu(
                h @ bp["mlp"]["fc"]["w"].astype(dt)
                + bp["mlp"]["fc"]["b"].astype(dt),
                approximate=False,
            )
            xc = xc + (
                jax.lax.psum(t @ bp["mlp"]["proj"]["w"].astype(dt), MODEL_AXIS)
                + bp["mlp"]["proj"]["b"].astype(dt)
            )
            return xc, None

        xx, _ = jax.lax.scan(w._maybe_remat(layer), xx, blocks)
        if xx.shape[1] != T:
            xx = xx[:, :T]
        return w.layer_norm(xx, lnp)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            encoder_block_specs(params["blocks"]),
            jax.tree.map(lambda _: P(), params["ln_post"]),
            P(DATA_AXIS, None, None),
        ),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )(params["blocks"], params["ln_post"], x)


# ---------------------------------------------------------------------------
# Sequence parallelism (beyond-reference; SURVEY §2.5 marks SP/CP optional)
# ---------------------------------------------------------------------------


def sp_trunk_applicable(dims, mesh: Mesh, batch: int, t_real: int) -> bool:
    """Sequence parallelism shards the (padded) time axis over the model
    axis instead of the heads — the fallback when the head count doesn't
    divide the mesh (e.g. tiny's 6 heads on a 4-way model axis), and the
    scaling axis for long-context encoder variants."""
    dp, tp = mesh_axis_sizes(mesh)
    t_pad = (t_real + 127) // 128 * 128
    return tp > 1 and t_pad % tp == 0 and batch % dp == 0


def sp_trunk(params, x, dims, t_real: int, mesh: Mesh):
    """Sequence-parallel encoder trunk: time axis sharded over the model
    mesh axis, weights replicated.

    Each shard computes LN + QKV on its local frame rows, ``all_gather``\\ s
    K and V along the axis (the only two collectives per layer — queries,
    residuals and the MLP stay row-local), and attends for its local
    queries.  Communication per layer is 2 * (B x Tp x D) over ICI, vs the
    TP trunk's 2 psums of the same size; SP wins when the sequence is long
    relative to the head count or the heads don't divide the mesh.
    Differentiable (all_gather transposes to reduce-scatter under
    shard_map).
    """
    from ..models import whisper as w

    T = t_real
    Tp = (T + 127) // 128 * 128
    n_head = dims.n_audio_head
    dt = x.dtype
    if x.shape[1] != Tp:
        x = jnp.pad(x, ((0, 0), (0, Tp - x.shape[1]), (0, 0)))

    key_mask = jnp.where(jnp.arange(Tp) < T, 0.0, -jnp.inf).astype(
        jnp.float32
    )

    def body(blocks, lnp, xx):
        B_l, T_l, D = xx.shape
        dh = D // n_head
        scale = dt.type(dh ** -0.25)

        def split(z):
            return z.reshape(B_l, -1, n_head, dh).transpose(0, 2, 1, 3)

        def layer(xc, bp):
            h = w.layer_norm(xc, bp["attn_ln"])
            lin = lambda t, p: _lin(t, p, dt)
            q = lin(h, bp["attn"]["query"]) * scale
            k_loc = lin(h, bp["attn"]["key"]) * scale
            v_loc = lin(h, bp["attn"]["value"])
            k = jax.lax.all_gather(k_loc, MODEL_AXIS, axis=1, tiled=True)
            v = jax.lax.all_gather(v_loc, MODEL_AXIS, axis=1, tiled=True)
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", split(q), split(k)
            ).astype(jnp.float32) + key_mask
            wgt = jax.nn.softmax(logits, axis=-1).astype(dt)
            att = jnp.einsum("bhqk,bhkd->bhqd", wgt, split(v))
            att = att.transpose(0, 2, 1, 3).reshape(B_l, T_l, D)
            xc = xc + lin(att, bp["attn"]["out"])
            h = w.layer_norm(xc, bp["mlp_ln"])
            t = jax.nn.gelu(lin(h, bp["mlp"]["fc"]), approximate=False)
            return xc + lin(t, bp["mlp"]["proj"]), None

        xx, _ = jax.lax.scan(w._maybe_remat(layer), xx, blocks)
        return w.layer_norm(xx, lnp)

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), params["blocks"]),
            jax.tree.map(lambda _: P(), params["ln_post"]),
            P(DATA_AXIS, MODEL_AXIS, None),
        ),
        out_specs=P(DATA_AXIS, MODEL_AXIS, None),
        check_vma=False,
    )(params["blocks"], params["ln_post"], x)
    return out[:, :T] if Tp != T else out


# ---------------------------------------------------------------------------
# Pipeline parallelism (beyond-reference; SURVEY §2.5 lists PP as absent)
# ---------------------------------------------------------------------------


def pp_trunk_applicable(
    dims, mesh: Mesh, batch: int, n_micro: int = 4
) -> bool:
    """GPipe pipelining needs: a model axis > 1 that divides the layer
    count evenly (equal stage depth), and a local batch that splits into
    ``n_micro`` equal microbatches."""
    dp, pp = mesh_axis_sizes(mesh)
    return (
        pp > 1
        and dims.n_audio_layer % pp == 0
        and batch % dp == 0
        and (batch // dp) % n_micro == 0
    )


def pp_trunk(params, x, dims, t_real: int, mesh: Mesh, n_micro: int = 4):
    """Pipeline-parallel encoder trunk: layers sharded over the model axis.

    GPipe schedule under ``shard_map``: stage ``s`` holds layers
    ``[s*L/S, (s+1)*L/S)`` (the stacked-scan block leaves are sharded on
    their leading layer axis, so each stage's weights live only on that
    stage), the local batch is split into ``n_micro`` microbatches, and at
    every step each stage runs its local layer stack on one microbatch and
    ``ppermute``\\ s the activation to the next stage — S-1 bubble steps,
    one (B/M, T, D) hop per step over ICI.  The finished microbatches
    accumulate on the last stage and one masked ``psum`` broadcasts them
    back to the data layout (a real deployment would feed the next pipeline
    consumer directly from the last stage instead).

    Differentiable: the unrolled schedule transposes cleanly (``ppermute``
    reverses direction under AD), so the sharded train step can pipeline.
    Complements :func:`tp_trunk` (head-sharded) and :func:`sp_trunk`
    (time-sharded) — PP is the axis that scales DEPTH (large's 32 layers,
    reference family table /root/reference/whisper/__init__.py:17-32) with
    only point-to-point communication, where TP needs two psums per layer.
    The reference has no distributed execution at all (SURVEY §2.5).
    """
    from ..models import whisper as w

    dp, S = mesh_axis_sizes(mesh)
    T = t_real
    n_head = dims.n_audio_head
    dt = x.dtype
    key_mask = (
        None
        if x.shape[1] == T
        else jnp.where(jnp.arange(x.shape[1]) < T, 0.0, -jnp.inf).astype(
            jnp.float32
        )
    )

    def body(blocks, lnp, xx):
        B_l, T_l, D = xx.shape
        dh = D // n_head
        scale = dt.type(dh ** -0.25)
        M = n_micro
        s = jax.lax.axis_index(MODEL_AXIS)

        def split(z):
            return z.reshape(z.shape[0], -1, n_head, dh).transpose(
                0, 2, 1, 3
            )

        lin = lambda t, p: _lin(t, p, dt)

        def layer(xc, bp):
            h = w.layer_norm(xc, bp["attn_ln"])
            q = lin(h, bp["attn"]["query"]) * scale
            k = lin(h, bp["attn"]["key"]) * scale
            v = lin(h, bp["attn"]["value"])
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", split(q), split(k)
            ).astype(jnp.float32)
            if key_mask is not None:
                logits = logits + key_mask
            wgt = jax.nn.softmax(logits, axis=-1).astype(dt)
            att = jnp.einsum("bhqk,bhkd->bhqd", wgt, split(v))
            att = att.transpose(0, 2, 1, 3).reshape(xc.shape)
            xc = xc + lin(att, bp["attn"]["out"])
            h = w.layer_norm(xc, bp["mlp_ln"])
            t = jax.nn.gelu(lin(h, bp["mlp"]["fc"]), approximate=False)
            return xc + lin(t, bp["mlp"]["proj"]), None

        def stage(mb):
            out, _ = jax.lax.scan(w._maybe_remat(layer), mb, blocks)
            return out

        micro = xx.reshape(M, B_l // M, T_l, D)
        buf = jnp.zeros_like(micro[0])          # activation arriving from s-1
        outs = jnp.zeros_like(micro)            # finished, on the last stage
        fwd = [(i, (i + 1) % S) for i in range(S)]
        for step in range(M + S - 1):
            inject = micro[min(step, M - 1)]
            out = stage(jnp.where(s == 0, inject, buf))
            if step >= S - 1:
                outs = outs.at[step - (S - 1)].set(out)
            if step < M + S - 2:
                buf = jax.lax.ppermute(out, MODEL_AXIS, fwd)
        # Masked broadcast from the last stage back to the data layout.
        outs = jax.lax.psum(
            jnp.where(s == S - 1, outs, jnp.zeros_like(outs)), MODEL_AXIS
        )
        return w.layer_norm(outs.reshape(B_l, T_l, D), lnp)

    out = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(MODEL_AXIS), params["blocks"]),
            jax.tree.map(lambda _: P(), params["ln_post"]),
            P(DATA_AXIS, None, None),
        ),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )(params["blocks"], params["ln_post"], x)
    return out[:, :T] if out.shape[1] != T else out


# ---------------------------------------------------------------------------
# Expert parallelism (beyond-reference; the reference has no MoE — SURVEY
# §2.5 lists EP as N/A.  models/moe.py defines the MoE encoder variant.)
# ---------------------------------------------------------------------------


def ep_trunk_applicable(dims, moe, mesh: Mesh, batch: int,
                        t_real: int) -> bool:
    """Expert parallelism shards the EXPERTS over the model axis and the
    encoder time axis with them (SP-style attention), so it needs: a model
    axis > 1 dividing ``n_experts`` and the padded time length, and a batch
    divisible by the data axis."""
    dp, ep = mesh_axis_sizes(mesh)
    t_pad = (t_real + 127) // 128 * 128
    return (
        ep > 1
        and moe.n_experts % ep == 0
        and t_pad % ep == 0
        and batch % dp == 0
    )


def _ep_block_specs(blocks):
    """in_specs for the MoE block stack: expert leaves (L, E, ...) shard on
    their E axis over the model mesh axis; attention weights, layer norms
    and the router replicate (attention is time-sharded, not head-sharded,
    under the EP trunk)."""

    def spec(path, leaf):
        keys = _path_keys(path)
        if "experts" in keys:
            return P(None, MODEL_AXIS, *([None] * (leaf.ndim - 2)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, blocks)


def ep_trunk(params, x, dims, moe, t_real: int, mesh: Mesh):
    """Expert-parallel MoE encoder trunk: experts sharded over the model
    axis, tokens routed to their expert's shard via ``all_to_all``.

    Layout: the (padded) TIME axis is sharded over the model axis exactly
    like :func:`sp_trunk` (attention all-gathers K/V; queries, residuals
    and routing stay row-local), so no compute is replicated.  Each MoE
    layer then runs the GShard dispatch algebra (models/moe.py::route) on
    its local tokens:

    1. top-1 routing builds a (E, C, D) dispatch buffer from the local
       tokens (per-shard capacity C — the standard GShard grouping);
    2. ``all_to_all`` over the model axis exchanges the (S, E/S, C, D)
       blocks so each shard holds every token destined for ITS experts;
    3. the local expert FFNs run as one batched (E/S, S*C, D) einsum pair
       — dense MXU work, no gathers;
    4. the reverse ``all_to_all`` returns results and the combine einsum
       scatters them back into the residual, scaled by the router gate.

    Two all_to_alls of (E, C, D) ~ (cf * N_local, D) per layer ride ICI —
    the canonical sparse-MoE communication pattern.  Differentiable
    end-to-end (all_to_all is its own transpose under AD; router gradients
    flow through the combine gates).  Returns ``(out, aux)`` with ``aux``
    the load-balancing loss psum-averaged over every shard.
    """
    from ..models import whisper as w
    from ..models import moe as moe_mod

    dp, S = mesh_axis_sizes(mesh)
    T = t_real
    Tp = (T + 127) // 128 * 128
    n_head = dims.n_audio_head
    dt = x.dtype
    E = moe.n_experts
    E_l = E // S
    if x.shape[1] != Tp:
        x = jnp.pad(x, ((0, 0), (0, Tp - x.shape[1]), (0, 0)))
    key_mask = jnp.where(jnp.arange(Tp) < T, 0.0, -jnp.inf).astype(
        jnp.float32
    )

    def body(blocks, lnp, xx):
        B_l, T_l, D = xx.shape
        dh = D // n_head
        scale = dt.type(dh ** -0.25)
        s = jax.lax.axis_index(MODEL_AXIS)
        row = s * T_l + jnp.arange(T_l)
        valid = jnp.broadcast_to(
            (row < T)[None, :], (B_l, T_l)
        ).reshape(B_l * T_l)
        N = B_l * T_l
        C = moe.capacity(N)

        def split(z):
            return z.reshape(B_l, -1, n_head, dh).transpose(0, 2, 1, 3)

        lin = lambda t, p: _lin(t, p, dt)

        def layer(xc, bp):
            h = w.layer_norm(xc, bp["attn_ln"])
            q = lin(h, bp["attn"]["query"]) * scale
            k = jax.lax.all_gather(
                lin(h, bp["attn"]["key"]) * scale, MODEL_AXIS, axis=1,
                tiled=True,
            )
            v = jax.lax.all_gather(
                lin(h, bp["attn"]["value"]), MODEL_AXIS, axis=1, tiled=True
            )
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", split(q), split(k)
            ).astype(jnp.float32) + key_mask
            wgt = jax.nn.softmax(logits, axis=-1).astype(dt)
            att = jnp.einsum("bhqk,bhkd->bhqd", wgt, split(v))
            xc = xc + lin(
                att.transpose(0, 2, 1, 3).reshape(B_l, T_l, D),
                bp["attn"]["out"],
            )

            h = w.layer_norm(xc, bp["mlp_ln"]).reshape(N, D)
            dispatch, combine, aux = moe_mod.route(
                h, bp["mlp"]["router"]["w"], moe, C, valid=valid
            )
            buf = jnp.einsum("nec,nd->ecd", dispatch.astype(dt), h)
            recv = jax.lax.all_to_all(
                buf.reshape(S, E_l, C, D), MODEL_AXIS, 0, 0, tiled=True
            )
            rbuf = recv.transpose(1, 0, 2, 3).reshape(E_l, S * C, D)
            y = moe_mod._expert_ffn(rbuf, bp["mlp"]["experts"], dt)
            back = jax.lax.all_to_all(
                y.reshape(E_l, S, C, D).transpose(1, 0, 2, 3),
                MODEL_AXIS, 0, 0, tiled=True,
            )
            out = jnp.einsum(
                "nec,ecd->nd", combine.astype(dt), back.reshape(E, C, D)
            )
            return xc + out.reshape(B_l, T_l, D), aux

        xx, auxes = jax.lax.scan(w._maybe_remat(layer), xx, blocks)
        aux = jax.lax.psum(
            jnp.mean(auxes), (DATA_AXIS, MODEL_AXIS)
        ) / (dp * S)
        return w.layer_norm(xx, lnp), aux

    out, aux = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            _ep_block_specs(params["blocks"]),
            jax.tree.map(lambda _: P(), params["ln_post"]),
            P(DATA_AXIS, MODEL_AXIS, None),
        ),
        out_specs=(P(DATA_AXIS, MODEL_AXIS, None), P()),
        check_vma=False,
    )(params["blocks"], params["ln_post"], x)
    return (out[:, :T] if Tp != T else out), aux
