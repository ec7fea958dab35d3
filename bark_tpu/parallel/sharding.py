"""Device-mesh sharding for the GPT stages: tensor parallel + data parallel.

The reference has NO distributed execution of any kind (SURVEY.md §2.10 —
single process, one backend device, a server mutex). Multi-chip support here
is therefore a TPU-native extension, not a parity requirement:

- **TP** (Megatron-style) over the `tp` mesh axis, laid out on ICI: the fused
  QKV and MLP-in projections are column-sharded, the attention-out and MLP-out
  projections row-sharded, attention heads and KV caches sharded over `tp`,
  LM head sharded over the vocab. XLA/GSPMD inserts the all-reduces at the
  row-sharded matmuls; no hand-written collectives are needed at this scale
  (bark's 1024-token contexts and <=1B params fit one chip comfortably —
  sequence/pipeline/expert parallelism have nothing to shard; see §2.10).
- **DP** over the `dp` axis batches independent generation requests (the
  server's scale-out axis); each request's tokens/caches live on its DP slice.

Everything works through `jax.sharding.NamedSharding` annotations on a
`Mesh`; the same code runs single-chip when the mesh is 1x1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bark_tpu.models import gpt


def make_mesh(
    n_devices: Optional[int] = None, dp: int = 1, devices=None
) -> Mesh:
    """A (dp, tp) mesh over the first `n_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % dp != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by dp={dp}")
    tp = n_devices // dp
    arr = np.asarray(devices[:n_devices]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def gpt_param_specs(cfg: gpt.GPTConfig):
    """PartitionSpecs for the GPT param pytree (gpt.init_params layout)."""
    return {
        # embeddings: model-dim sharded (gathers stay local, contributions
        # concatenate across tp)
        "wte": P(None, None, "tp"),
        "wpe": P(None, "tp"),
        "lm_head": P(None, "tp", None),  # vocab-sharded head
        "ln_f_g": P(None),
        "ln_f_b": P(None),
        "blocks": {
            "ln1_g": P(None, None),
            "ln1_b": P(None, None),
            "ln2_g": P(None, None),
            "ln2_b": P(None, None),
            # column-parallel: QKV and MLP-in split the output features
            "qkv_w": P(None, None, "tp"),
            "qkv_b": P(None, "tp"),
            "fc_w": P(None, None, "tp"),
            "fc_b": P(None, "tp"),
            # row-parallel: attn-out and MLP-out split the input features;
            # GSPMD inserts the psum over tp after these matmuls
            "proj_w": P(None, "tp", None),
            "proj_b": P(None, None),
            "out_w": P(None, "tp", None),
            "out_b": P(None, None),
        },
    }


def kv_cache_spec(batched: bool):
    """Caches (L, [B,] S, D) (flat feature axis, see gpt.init_kv_cache):
    sharding D over `tp` equals head sharding whenever tp divides n_head
    (head h owns the contiguous D-slice [h*hd, (h+1)*hd)); batch over dp."""
    if batched:
        return P(None, "dp", None, "tp")
    return P(None, None, "tp")


def shard_gpt_params(mesh: Mesh, cfg: gpt.GPTConfig, params):
    """Place a param pytree onto the mesh with TP shardings.

    Dimensions not divisible by the tp axis (e.g. an odd vocab) are left
    replicated on that axis rather than failing.
    """
    specs = gpt_param_specs(cfg)

    def place(path, arr):
        node = specs
        for k in path:
            node = node[k.key]
        spec = node
        for dim, axis in enumerate(spec):
            if axis is not None and arr.shape[dim] % mesh.shape[axis] != 0:
                spec = P()
                break
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


# Packed-quantized (qpack) TP specs. Layout is loader.gpt_qparams_from_section:
# transposed (in, out) int8 value planes + per-32-block scale/min planes whose
# blocked axis is the IN-features axis. Placement mirrors gpt_param_specs —
# qkv/fc column-parallel (shard the out axis, never blocked), proj/out
# row-parallel (shard the blocked in axis: each device must hold WHOLE
# 32-value quant blocks, enforced below), LM head vocab-sharded, embeddings
# model-dim sharded. Scale/min planes shard on the same logical axis as
# their values (their blocked axis is already /32, so divisibility of the
# plane itself is the alignment check).
#   name -> (spec, blocked_dim_of_the_value_plane | None)
_QPACK_SPECS = {
    "wte": (P(None, None, "tp"), 2),      # (n_wtes, V, D); D is blocked
    "wpe": (P(None, "tp"), None),
    "ln_f_g": (P(None), None),
    "ln_f_b": (P(None), None),
    "lm": (P(None, "tp"), None),          # (D, v_pad); D (dim 0) is blocked
    "lm_heads": (P(None, "tp", None), None),  # (n, V, D) vocab-sharded
}
_QPACK_BLOCK_SPECS = {
    "ln1_g": (P(None, None), None),
    "ln1_b": (P(None, None), None),
    "ln2_g": (P(None, None), None),
    "ln2_b": (P(None, None), None),
    "qkv": (P(None, None, "tp"), None),   # (L, D, 3D) column-parallel
    "qkv_b": (P(None, "tp"), None),
    "fc": (P(None, None, "tp"), None),    # (L, D, 4D) column-parallel
    "fc_b": (P(None, "tp"), None),
    "proj": (P(None, "tp", None), 1),     # (L, D, D) row-parallel, in blocked
    "proj_b": (P(None, None), None),
    "out": (P(None, "tp", None), 1),      # (L, 4D, D) row-parallel, in blocked
    "out_b": (P(None, None), None),
}


def _qpack_spec(name: str, in_blocks: bool):
    table = _QPACK_BLOCK_SPECS if in_blocks else _QPACK_SPECS
    if name in table:
        return table[name]
    for suffix in ("_q", "_s", "_m"):
        if name.endswith(suffix) and name[: -len(suffix)] in table:
            spec, blocked = table[name[: -len(suffix)]]
            # scale/min planes are already /32 along the blocked axis
            return spec, (blocked if suffix == "_q" else None)
    return P(), None


def shard_qpack_params(mesh: Mesh, qpack):
    """Place a packed-quantized param pytree onto the mesh with TP shardings
    (VERDICT r4 #4 stretch: packed-quantized TP serving).

    The sharded qpack flows into the batched pipeline's `densify` hook
    (loader.dense_from_qpack) INSIDE the jitted stage programs: dequant is
    elementwise per 32-value block, so when every device holds whole blocks
    it is collective-free and the densified weight comes out sharded exactly
    like gpt_param_specs wants it — GSPMD then runs the same column/row-
    parallel matmuls as the dense TP path. Tensors whose shard would split a
    quant block, or that don't divide the tp axis, stay replicated (placement
    never changes semantics under GSPMD; it only moves collectives).
    """
    tp = mesh.shape["tp"]

    def place(path, arr):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        in_blocks = any(
            getattr(k, "key", None) == "blocks" for k in path[:-1]
        )
        spec, blocked = _qpack_spec(name, in_blocks)
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if arr.shape[dim] % tp != 0 or (
                blocked == dim and (arr.shape[dim] // tp) % 32 != 0
            ):
                spec = P()
                break
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, qpack)


def replicated(mesh: Mesh, tree):
    """Place a pytree fully replicated on the mesh (codec weights etc.)."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)


def shard_context(ctx, mesh: Mesh):
    """Place a BarkContext's weights onto a (dp, tp) mesh for sharded batched
    serving: GPT params tensor-parallel over `tp`, codec replicated. The
    batched pipeline (generate_audio_batch) then runs under GSPMD — the
    batch axis rides `dp`, attention heads / MLP features / vocab ride `tp`,
    with XLA inserting the all-reduces (SURVEY §2.10: the reference has no
    distributed execution; this is the TPU-native scale-out).

    Packed-quantized stages shard their int8 value + scale planes with the
    same column/row-parallel layout (shard_qpack_params); the in-program
    densify (dense_from_qpack) is block-local so GSPMD dequantizes shard-
    locally and runs the same TP matmuls as dense. (The single-device Pallas
    packed kernels are a different, per-device path — shard_context_dp.)
    """
    for stage in ("semantic", "coarse", "fine"):
        if getattr(ctx, "_packed", {}).get(stage, False):
            params = shard_qpack_params(
                mesh, getattr(ctx, f"{stage}_params")
            )
        else:
            params = shard_gpt_params(
                mesh, getattr(ctx, f"{stage}_cfg"),
                getattr(ctx, f"{stage}_params"),
            )
        setattr(ctx, f"{stage}_params", params)
    ctx.codec_params = replicated(mesh, ctx.codec_params)
    ctx._programs.clear()  # programs must re-trace against the shardings
    return ctx


def make_dp_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-axis data-parallel mesh for kernel-preserving dp serving."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), ("dp",))


def shard_context_dp(ctx, mesh: Mesh):
    """dp-only sharded serving that KEEPS the fused Pallas-kernel pipeline.

    `shard_context` (TP over GSPMD) partitions the plain-XLA vmapped stage
    programs — correct, but it abandons every Pallas kernel and can't serve
    packed-quantized weights at all. This mode instead replicates ALL
    weights (dense or qpack) on a 1-axis `dp` mesh and `shard_map`s the
    existing natively-batched stage programs over it: each device runs the
    single-chip fused pipeline (batched multi-step Pallas kernels, packed
    dequant, int8-KV — everything) on its B/dp slice of the batch, so
    per-request RTF matches the single-chip fused number instead of the
    XLA fallback. Per-lane tokens are identical to the unsharded batched
    path under the same per-lane keys (tests/test_dp_serving.py).

    The reference has no distributed execution (SURVEY §2.10); this is the
    TPU-native scale-out for its server (`server.cpp` serializes requests
    behind a mutex).
    """
    if "dp" not in mesh.shape:
        raise ValueError(f"mesh {mesh.shape} has no 'dp' axis")
    for stage in ("semantic", "coarse", "fine"):
        setattr(
            ctx, f"{stage}_params",
            replicated(mesh, getattr(ctx, f"{stage}_params")),
        )
    ctx.codec_params = replicated(mesh, ctx.codec_params)
    ctx._dp_mesh = mesh
    ctx._programs.clear()
    return ctx


def wrap_dp_programs(mesh: Mesh, programs):
    """shard_map the four batched stage programs over the `dp` mesh axis.

    Each wrapped program takes/returns GLOBAL batch-Bp arrays; per device
    the underlying program (built for B_local = Bp/dp) runs unchanged —
    including its Pallas kernels, which execute per-device on local shapes
    under shard_map. Weights ride replicated (P()); every batch-carrying
    axis rides `dp`. check_vma is off: pallas_call has no varying-manual-
    axes rule, and the specs here are total anyway.
    """
    sem, coarse, fine, codec = programs

    def smap(fn, in_specs, out_specs):
        return jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ))

    b1, b2, b3 = P("dp"), P("dp", None), P("dp", None, None)
    sem_w = smap(sem, (P(), b2, b2, P()), (b2, b1))
    coarse_w = smap(coarse, (P(), b2, b1, b2, b2, b1, b2, b1), (b3, b1))
    fine_w = smap(fine, (P(), b3, b1, b2, b3, b1), b3)
    codec_w = smap(codec, (P(), b3), b2)
    return sem_w, coarse_w, fine_w, codec_w


def make_batched_decode_step(cfg: gpt.GPTConfig, mesh: Mesh):
    """Batched single-token decode over the mesh.

    fn(params, tokens (B,), k_caches (L,B,S,H,hd), v_caches, n_past)
      -> (logits (B, n_out_vocab) f32, k_caches, v_caches)

    Batch rides `dp`, heads/features ride `tp`; caches are donated so decode
    updates them in place in HBM.
    """
    step = jax.vmap(
        lambda params, tok, kc, vc, n_past: gpt.decode_step(
            cfg, params, tok, kc, vc, n_past
        ),
        in_axes=(None, 0, 1, 1, None),
        out_axes=(0, 1, 1),
    )

    tok_sh = NamedSharding(mesh, P("dp"))
    cache_sh = NamedSharding(mesh, kv_cache_spec(batched=True))
    logits_sh = NamedSharding(mesh, P("dp", None))

    return jax.jit(
        step,
        in_shardings=(None, tok_sh, cache_sh, cache_sh, None),
        out_shardings=(logits_sh, cache_sh, cache_sh),
        donate_argnums=(2, 3),
    )


def make_batched_prefill(cfg: gpt.GPTConfig, mesh: Mesh):
    """Batched right-padded prefill over the mesh.

    fn(params, x_emb (B,T,D), k_caches (L,B,S,H,hd), v_caches, n_valid (B,))
      -> (logits (B, n_out_vocab) f32, k_caches, v_caches)
    """
    run = jax.vmap(
        lambda params, x, kc, vc, n_valid: gpt.prefill(
            cfg, params, x, kc, vc, n_valid
        ),
        in_axes=(None, 0, 1, 1, 0),
        out_axes=(0, 1, 1),
    )
    emb_sh = NamedSharding(mesh, P("dp", None, "tp"))
    cache_sh = NamedSharding(mesh, kv_cache_spec(batched=True))
    logits_sh = NamedSharding(mesh, P("dp", None))
    return jax.jit(
        run,
        in_shardings=(
            None,
            emb_sh,
            cache_sh,
            cache_sh,
            NamedSharding(mesh, P("dp")),
        ),
        out_shardings=(logits_sh, cache_sh, cache_sh),
        donate_argnums=(2, 3),
    )
