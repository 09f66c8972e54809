"""Pallas blocked BVH traversal kernel.

The jnp threaded traversal (``ops.intersect.mesh_intersect_bvh``) drives ONE
global while-loop for all rays: every loop step costs a chain of small XLA
kernel launches and runs until the single worst ray in the whole wavefront
finishes.  This kernel moves the loop *inside* a Pallas program:

* the grid is tiled over ray blocks -- each block exits its own while-loop as
  soon as its rays are done (divergence cost becomes per-block, not global);
* the BVH node table and triangle table live in VMEM for the whole kernel
  (constant-index BlockSpecs -- no per-step HBM traffic);
* per-lane node lookups use the TPU's lane-wise ``dynamic_gather``
  (``jnp.take_along_axis(table, idx, axis=1)``), whose Mosaic lowering
  requires ``table.shape == idx.shape``.  That constraint shapes the layout:
  tables are ``[8, L]`` (8 replicated sublane rows, L = lane-padded
  max(num_nodes, num_tris)) and each ray block is therefore ``8*L`` rays,
  one ray per (sublane, lane) slot.

Traversal semantics are identical to the jnp version (same threaded
miss-links, same closest-hit pruning, same Moller-Trumbore epsilons), so the
two paths are image-identical -- tested in interpret mode and on hardware.

VMEM budget: 18 table fields x 8 x L x 4B + ~13 ray/output fields.  Meshes
up to ~20k triangles fit a 16MB VMEM core; larger scenes fall back to the
jnp path automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.device import PallasMeshTables
from ..utils.vec import Vec3
from .intersect import MeshHit

LANE_PAD = 128
SUBLANES = 8


def _kernel(
    num_nodes: int,
    num_tris: int,
    leaf_size: int,
    baby_eps: float,
    # refs:
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    act_ref, tlim_ref,
    nminx_ref, nminy_ref, nminz_ref, nmaxx_ref, nmaxy_ref, nmaxz_ref,
    nmiss_ref, nstart_ref, ncount_ref,
    t0x_ref, t0y_ref, t0z_ref,
    e1x_ref, e1y_ref, e1z_ref, e2x_ref, e2y_ref, e2z_ref,
    out_t_ref, out_tri_ref, out_u_ref, out_v_ref,
):
    m = num_nodes
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    active = act_ref[:] != 0
    end = jnp.int32(m)
    cursor0 = jnp.where(active, jnp.int32(0), end)

    state0 = (
        cursor0,
        tlim_ref[:],
        jnp.full(cursor0.shape, -1, jnp.int32),
        jnp.zeros(cursor0.shape, jnp.float32),
        jnp.zeros(cursor0.shape, jnp.float32),
    )

    def gather_f(ref, idx):
        return jnp.take_along_axis(ref[:], idx, axis=1)

    def cond(state):
        cursor = state[0]
        return jnp.any(cursor < m)

    def body(state):
        cursor, best_t, best_tri, best_u, best_v = state
        live = cursor < m
        c = jnp.minimum(cursor, m - 1)

        bmin_x = gather_f(nminx_ref, c)
        bmin_y = gather_f(nminy_ref, c)
        bmin_z = gather_f(nminz_ref, c)
        bmax_x = gather_f(nmaxx_ref, c)
        bmax_y = gather_f(nmaxy_ref, c)
        bmax_z = gather_f(nmaxz_ref, c)

        t1x = (bmin_x - ox) * inv_dx
        t2x = (bmax_x - ox) * inv_dx
        t1y = (bmin_y - oy) * inv_dy
        t2y = (bmax_y - oy) * inv_dy
        t1z = (bmin_z - oz) * inv_dz
        t2z = (bmax_z - oz) * inv_dz
        tlo = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        thi = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        aabb_hit = (thi >= tlo) & (thi > 0.0) & (tlo < best_t)

        start = gather_f(nstart_ref, c)
        count = gather_f(ncount_ref, c)
        miss = gather_f(nmiss_ref, c)
        is_leaf = count > 0

        do_leaf = live & aabb_hit & is_leaf
        for k in range(leaf_size):
            tri_idx = jnp.minimum(
                jnp.maximum(start + k, 0), num_tris - 1
            )
            v0x = gather_f(t0x_ref, tri_idx)
            v0y = gather_f(t0y_ref, tri_idx)
            v0z = gather_f(t0z_ref, tri_idx)
            ge1x = gather_f(e1x_ref, tri_idx)
            ge1y = gather_f(e1y_ref, tri_idx)
            ge1z = gather_f(e1z_ref, tri_idx)
            ge2x = gather_f(e2x_ref, tri_idx)
            ge2y = gather_f(e2y_ref, tri_idx)
            ge2z = gather_f(e2z_ref, tri_idx)

            # Moller-Trumbore (intersections.cu:112-145 semantics).
            px = dy * ge2z - dz * ge2y
            py = dz * ge2x - dx * ge2z
            pz = dx * ge2y - dy * ge2x
            det = ge1x * px + ge1y * py + ge1z * pz
            det_ok = jnp.abs(det) >= baby_eps
            inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            u = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * ge1z - tvz * ge1y
            qy = tvz * ge1x - tvx * ge1z
            qz = tvx * ge1y - tvy * ge1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (ge2x * qx + ge2y * qy + ge2z * qz) * inv_det
            hit = (
                det_ok
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (tt > baby_eps)
            )
            closer = do_leaf & (k < count) & hit & (tt > 0.0) & (tt < best_t)
            best_t = jnp.where(closer, tt, best_t)
            best_tri = jnp.where(closer, tri_idx, best_tri)
            best_u = jnp.where(closer, u, best_u)
            best_v = jnp.where(closer, v, best_v)

        descend = live & aabb_hit & ~is_leaf
        nxt = jnp.where(descend, c + 1, miss)
        cursor = jnp.where(live, nxt, cursor)
        return cursor, best_t, best_tri, best_u, best_v

    _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(cond, body, state0)
    out_t_ref[:] = best_t
    out_tri_ref[:] = best_tri
    out_u_ref[:] = best_u
    out_v_ref[:] = best_v


@functools.partial(
    jax.jit,
    static_argnames=("lanes", "num_nodes", "num_tris", "leaf_size",
                     "baby_eps", "interpret"),
)
def _run(
    tables: PallasMeshTables,
    ox, oy, oz, dx, dy, dz, active, t_limit,
    lanes: int,
    num_nodes: int,
    num_tris: int,
    leaf_size: int,
    baby_eps: float,
    interpret: bool = False,
):
    n = ox.shape[0]
    block = SUBLANES * lanes
    n_pad = ((n + block - 1) // block) * block
    grid = n_pad // block

    def prep(x, fill=0):
        return jnp.pad(x, (0, n_pad - n), constant_values=fill).reshape(-1, lanes)

    rays = [
        prep(ox), prep(oy), prep(oz),
        prep(jnp.where(dx == 0, 1e-20, dx)),
        prep(jnp.where(dy == 0, 1e-20, dy)),
        prep(jnp.where(dz == 0, 1e-20, dz)),
        prep(active.astype(jnp.int32)),
        prep(t_limit, fill=0.0),
    ]

    ray_spec = pl.BlockSpec(
        (SUBLANES, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_spec = pl.BlockSpec(
        (SUBLANES, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    rows = n_pad // lanes

    kern = functools.partial(_kernel, num_nodes, num_tris, leaf_size, baby_eps)
    out_t, out_tri, out_u, out_v = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[ray_spec] * 8 + [table_spec] * 18,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.int32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
            jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        ),
        interpret=interpret,
    )(*rays, *tables)

    flat = lambda x: x.reshape(-1)[:n]
    return flat(out_t), flat(out_tri), flat(out_u), flat(out_v)


def mesh_intersect_pallas(
    tables: PallasMeshTables,
    lanes: int,
    num_nodes: int,
    num_tris: int,
    leaf_size: int,
    ro: Vec3,
    rd: Vec3,
    active: jnp.ndarray,
    t_limit: jnp.ndarray,
    baby_eps: float,
    interpret: bool = False,
) -> MeshHit:
    t, tri, u, v = _run(
        tables,
        ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, active, t_limit,
        lanes=lanes,
        num_nodes=num_nodes,
        num_tris=num_tris,
        leaf_size=leaf_size,
        baby_eps=baby_eps,
        interpret=interpret,
    )
    return MeshHit(t=t, tri=tri, u=u, v=v)
