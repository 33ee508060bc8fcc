"""Sharded request/reply row gather over the mesh axis (SPEC D5 machinery).

The sharded traversal's inner operation is ``rows = state[gid]`` where ``state``
is an edge-indexed array sharded by edge ownership and ``gid`` are global edge
ids pointing anywhere. Inside a shard_map block this is realised as a
two-phase collective:

1. requests: sort local gids by owner device, pack into fixed [n_dev, c_req]
   slabs, ``all_to_all``;
2. serve: each device gathers its local rows for the gids it received;
3. replies: ``all_to_all`` back — slab positions are symmetric, so the reply
   for the request I placed at (dest d, slot p) comes back at (chunk d, slot
   p) — then scatter to the original request order.

This is the cross-partition analogue of the reference's device-global pointer
chasing (SURVEY.md R8/R9): same doubling algorithm, with the random gather
replaced by an ICI/DCN collective. Slab overflow (pathological owner imbalance)
is counted and returned so callers can psum and fail loudly instead of
corrupting pointers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_euler.dist.mesh import AXIS

_SENT = jnp.uint32(0xFFFFFFFF)


def exchange_gather(
    state: jax.Array,  # [el_cap, width] uint32 — local shard of row data
    gids: jax.Array,  # [M] int32 — global row ids (-1 = no fetch)
    n_dev: int,
    el_cap: int,
    c_req: int,
    fill: jax.Array | None = None,  # [width] value for unfetched rows
):
    """Fetch rows of the sharded ``state`` at global ids. Runs inside shard_map.

    Returns (rows [M, width] uint32, n_dropped scalar). Rows for gids < 0 (or
    dropped by slab overflow) are ``fill`` (default all-ones).
    """
    M = gids.shape[0]
    width = state.shape[1]
    if fill is None:
        fill = jnp.full((width,), _SENT, jnp.uint32)

    dest = jnp.where(gids >= 0, gids // el_cap, n_dev).astype(jnp.uint32)
    slot = jnp.arange(M, dtype=jnp.int32)
    sd, sslot, sgid = jax.lax.sort(
        [dest, slot, gids], num_keys=1, is_stable=True
    )
    sd = sd.astype(jnp.int32)
    idx = jnp.arange(M, dtype=jnp.int32)
    seg_start = jnp.full((n_dev + 1,), M, jnp.int32).at[sd].min(idx)
    pos = idx - seg_start[jnp.clip(sd, 0, n_dev)]
    ok = (sd < n_dev) & (pos < c_req)
    n_dropped = jnp.sum((sd < n_dev) & ~ok)

    slab_pos = jnp.where(ok, sd * c_req + pos, n_dev * c_req)
    req = jnp.full((n_dev * c_req,), -1, jnp.int32).at[slab_pos].set(
        sgid, mode="drop"
    )
    recv = jax.lax.all_to_all(req, AXIS, split_axis=0, concat_axis=0, tiled=True)

    # serve: local row index for each received gid
    li = jnp.clip(recv % el_cap, 0, el_cap - 1)
    rows = jnp.where((recv >= 0)[:, None], state[li], fill[None, :])
    reply = jax.lax.all_to_all(rows, AXIS, split_axis=0, concat_axis=0, tiled=True)

    # route replies back to original request order
    got = reply[jnp.clip(slab_pos, 0, n_dev * c_req - 1)]
    got = jnp.where(ok[:, None], got, fill[None, :])
    out = (
        jnp.zeros((M, width), jnp.uint32)
        .at[sslot]
        .set(got)
    )
    # rows for gids < 0 must read fill even if slot order changed
    out = jnp.where((gids >= 0)[:, None], out, fill[None, :])
    return out, n_dropped


def exchange_push(
    values: jax.Array,  # [M, width] uint32 rows to deliver
    gids: jax.Array,  # [M] int32 destination global row ids (-1 = no send)
    n_dev: int,
    el_cap: int,
    c_req: int,
    combine: str = "set",
):
    """Deliver rows to the owners of global ids (the scatter dual of
    exchange_gather). Runs inside shard_map.

    Returns (local [el_cap, width] received rows combined per local id,
    n_dropped). combine: "set" (last-writer; callers must ensure at most one
    writer per id for determinism), "min", "max", or "add" (uint32 wraparound
    sums — exact for totals < 2^32).
    """
    M, width = values.shape
    dest = jnp.where(gids >= 0, gids // el_cap, n_dev).astype(jnp.uint32)
    slot = jnp.arange(M, dtype=jnp.int32)
    sd, sslot, sgid = jax.lax.sort([dest, slot, gids], num_keys=1, is_stable=True)
    sd = sd.astype(jnp.int32)
    idx = jnp.arange(M, dtype=jnp.int32)
    seg_start = jnp.full((n_dev + 1,), M, jnp.int32).at[sd].min(idx)
    pos = idx - seg_start[jnp.clip(sd, 0, n_dev)]
    ok = (sd < n_dev) & (pos < c_req)
    n_dropped = jnp.sum((sd < n_dev) & ~ok)

    slab_pos = jnp.where(ok, sd * c_req + pos, n_dev * c_req)
    v_sorted = values[sslot]
    slab_gid = jnp.full((n_dev * c_req,), -1, jnp.int32).at[slab_pos].set(
        sgid, mode="drop"
    )
    slab_val = jnp.zeros((n_dev * c_req, width), jnp.uint32).at[slab_pos].set(
        v_sorted, mode="drop"
    )
    recv_gid = jax.lax.all_to_all(slab_gid, AXIS, split_axis=0, concat_axis=0, tiled=True)
    recv_val = jax.lax.all_to_all(slab_val, AXIS, split_axis=0, concat_axis=0, tiled=True)

    li = jnp.where(recv_gid >= 0, recv_gid % el_cap, el_cap)
    if combine == "set":
        out = jnp.zeros((el_cap, width), jnp.uint32).at[li].set(
            recv_val, mode="drop"
        )
    elif combine == "min":
        out = jnp.full((el_cap, width), _SENT, jnp.uint32).at[li].min(
            recv_val, mode="drop"
        )
    elif combine == "max":
        out = jnp.zeros((el_cap, width), jnp.uint32).at[li].max(
            recv_val, mode="drop"
        )
    elif combine == "add":
        out = jnp.zeros((el_cap, width), jnp.uint32).at[li].add(
            recv_val, mode="drop"
        )
    else:
        raise ValueError(combine)
    return out, n_dropped
